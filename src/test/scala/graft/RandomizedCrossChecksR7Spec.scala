package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Relational

/** Randomized cross-checks for the round-7 novel operators: the
  * distributed as-of join and the doubling-closure hierarchy rollup
  * are replayed against tiny brute-force Scala references on random
  * inputs — the same adversarial discipline the histogram/skew suite
  * uses (a formulation bug that survives hand-built cases rarely
  * survives 500 random ones). Seeds are fixed: failures reproduce. */
class RandomizedCrossChecksR7Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("as-of join matches brute force on random timelines") {
    val spark = this.spark
    import spark.implicits._
    val rnd = new scala.util.Random(911)
    val events = (1 to 400).map { i =>
      (rnd.nextInt(20).toLong + 1L, rnd.nextInt(1000).toLong, i.toLong,
        s"t${rnd.nextInt(4)}")
    } // (user, second, event_id, type)
    val probes = (1 to 200).map { i =>
      (1000L + i, rnd.nextInt(25).toLong + 1L, rnd.nextInt(1100).toLong)
    } // (orderkey, custkey=user, second) — some users have no events
    val eDf = events.toDF("user_id", "sec", "event_id", "event_type")
      .select(col("user_id"), timestamp_seconds(col("sec")).as("ts"),
        col("event_id"), col("event_type"))
    val pDf = probes.toDF("o_orderkey", "o_custkey", "sec")
      .select(col("o_orderkey"), col("o_custkey"),
        timestamp_seconds(col("sec")).as("o_orderdate"))
    val got = Relational.q63AsofJoin(eDf, pDf).collect()
      .map(r => r.getLong(0) -> Option(r.get(3)).map(_.asInstanceOf[Long]))
      .toMap
    // brute force: per probe, the max (sec, event_id) event at-or-before
    probes.foreach { case (ok, user, sec) =>
      val want = events.filter(e => e._1 == user && e._2 <= sec)
        .sortBy(e => (e._2, e._3)).lastOption.map(_._3)
      assert(got(ok) == want, s"order $ok (user $user @ $sec): " +
        s"got ${got(ok)}, want $want")
    }
  }

  test("hierarchy rollup matches brute force on random key sets") {
    val spark = this.spark
    import spark.implicits._
    val rnd = new scala.util.Random(912)
    // random SPARSE key set up to 6 digits — parents may be ABSENT.
    // GRAPH semantics (the operator's contract, caught BY this check
    // when the oracle briefly used raw arithmetic recursion): an edge
    // exists only from a PRESENT key >= 10, so a chain broken by an
    // absent intermediate ends there. The brute force walks the same
    // rule: step from k to k/10 only while k is present and >= 10.
    val keys = (Seq(0L, 1L, 9L) ++
      (1 to 300).map(_ => rnd.nextInt(999999).toLong)).distinct
    val present = keys.toSet
    val parts = keys.map(k => (k, (k % 997).toDouble / 100.0))
      .toDF("p_partkey", "p_retailprice")
    val got = Relational.q64HierarchyRollup(parts).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    // ancestor chain under graph semantics: k, then parents reachable
    // through PRESENT children (the last element may be absent — the
    // target of the final present child's edge)
    def ancestors(k: Long): Seq[Long] = {
      val buf = scala.collection.mutable.Buffer(k)
      var cur = k
      while (present(cur) && cur >= 10) { cur = cur / 10; buf += cur }
      buf.toSeq
    }
    val cents = keys.map(k => k -> k % 997).toMap
    keys.foreach { k =>
      val depth = ancestors(k).length - 1L
      val desc = keys.filter(d => ancestors(d).contains(k))
      val subtree = desc.map(cents).sum
      val height = desc.map(d => ancestors(d).indexOf(k).toLong).max
      assert(got(k) == ((depth, height, subtree, desc.length.toLong)),
        s"node $k: got ${got(k)}, want (${depth}, $height, $subtree, ${desc.length})")
    }
  }
}
