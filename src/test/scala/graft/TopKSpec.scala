package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.{F, TopKBuffer}

class TopKSpec extends AnyFunSuite {

  test("TopKBuffer matches naive sort across 200 seeded random inputs") {
    val rng = new scala.util.Random(42)
    (1 to 200).foreach { _ =>
      val n = rng.nextInt(60)
      val k = 1 + rng.nextInt(8)
      val xs = List.fill(n)((math.floor(rng.nextDouble() * 40) / 2, rng.nextInt(50).toLong))
      val buf = new TopKBuffer(k)
      xs.foreach { case (s, i) => buf.add(s, i) }
      val expected = xs.sortBy { case (s, i) => (-s, i) }.take(k)
      assert(buf.sorted.toSeq == expected, s"n=$n k=$k xs=$xs")
    }
  }

  test("merge of partial buffers equals global top-k") {
    val xs = (1 to 1000).map(i => (((i * 2654435761L) % 997).toDouble, i.toLong))
    val (l, r) = xs.splitAt(500)
    val a = new TopKBuffer(10); l.foreach { case (s, i) => a.add(s, i) }
    val b = new TopKBuffer(10); r.foreach { case (s, i) => b.add(s, i) }
    a.mergeFrom(b)
    val whole = new TopKBuffer(10); xs.foreach { case (s, i) => whole.add(s, i) }
    assert(a.sorted.toSeq == whole.sorted.toSeq)
  }

  test("graft_topk aggregate equals the window top-k formulation") {
    val spark = TestSpark.spark
    import spark.implicits._
    val df = Seq.tabulate(500)(i => (i % 7L, ((i * 37) % 101).toDouble, i.toLong))
      .toDF("g", "score", "id")
    val viaAgg = df.groupBy($"g").agg(F.topk($"score", $"id", 3).as("nn"))
      .select($"g", posexplode($"nn"))
      .select($"g", $"col.score", $"col.id", ($"pos" + 1).as("rank"))
      .orderBy($"g", $"rank").collect().toSeq
    val w = org.apache.spark.sql.expressions.Window.partitionBy($"g")
      .orderBy($"score".desc, $"id".asc)
    val viaWindow = df.select($"g", $"score", $"id", row_number().over(w).cast("long").as("rank"))
      .filter($"rank" <= 3).orderBy($"g", $"rank").collect().toSeq
    assert(viaAgg.map(_.toSeq) == viaWindow.map(_.toSeq))
  }

  test("collectCapped: complete under the cap, exactly cap beyond it, capped merges") {
    val spark = TestSpark.spark
    import spark.implicits._
    // groups: g=0 has 3 members, g=1 has 5 (== cap), g=2 has 40 (> cap)
    val rows = (0 until 3).map(i => (0L, i.toLong, 100L + i)) ++
      (0 until 5).map(i => (1L, 10L + i, 200L + i)) ++
      (0 until 40).map(i => (2L, 20L + i, 300L + i))
    val df = rows.toDF("g", "id", "aux").repartition(8) // force partial merges
    val out = df.groupBy($"g").agg(F.collectCapped($"id", $"aux", 5).as("ds"))
      .select($"g", size($"ds").as("n"), $"ds").collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(out(0L).getInt(1) == 3)
    assert(out(1L).getInt(1) == 5)
    assert(out(2L).getInt(1) == 5) // capped, proving the group exceeded it
    // groups at or under the cap collect COMPLETELY (set equality)
    val g0 = out(0L).getSeq[org.apache.spark.sql.Row](2).map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(g0 == Set((0L, 100L), (1L, 101L), (2L, 102L)))
    val g1 = out(1L).getSeq[org.apache.spark.sql.Row](2).map(_.getLong(0)).toSet
    assert(g1 == (10L until 15L).toSet)
    // over-cap members are a subset of the group (no invented values)
    val g2 = out(2L).getSeq[org.apache.spark.sql.Row](2).map(_.getLong(0)).toSet
    assert(g2.subsetOf((20L until 60L).toSet) && g2.size == 5)
  }

  test("CappedBuffer: randomized add/merge trees keep size = min(cap, total) and members a subset (seeded)") {
    val rnd = new scala.util.Random(0xcab5eed)
    for (_ <- 1 to 100) {
      val cap = 1 + rnd.nextInt(12)
      val nBufs = 1 + rnd.nextInt(6)
      val inputs = Vector.fill(nBufs)(Vector.fill(rnd.nextInt(20))(rnd.nextLong()))
      val bufs = inputs.map { vs =>
        val b = new graft.functions.CappedBuffer(cap)
        vs.foreach(v => b.add(v, v + 1))
        b
      }
      // fold in random order, mimicking partial-aggregate merges
      val merged = rnd.shuffle(bufs).reduceLeft { (a, b) => a.mergeFrom(b); a }
      val total = inputs.map(_.size).sum
      assert(merged.size == math.min(cap, total))
      val all = inputs.flatten.toSet
      (0 until merged.size).foreach { i =>
        assert(all.contains(merged.ids(i)))
        assert(merged.aux(i) == merged.ids(i) + 1) // (id, aux) pairs stay intact
      }
    }
  }

  test("graft_collect_capped is callable from SQL") {
    val spark = TestSpark.spark
    F.register(spark)
    import spark.implicits._
    Seq((1L, 10L, 100L), (1L, 11L, 101L), (1L, 12L, 102L), (2L, 20L, 200L))
      .toDF("g", "id", "aux").createOrReplaceTempView("cc_in")
    val rows = spark.sql(
      "SELECT g, size(graft_collect_capped(id, aux, 2)) AS n FROM cc_in GROUP BY g")
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(rows == Map(1L -> 2, 2L -> 1))
  }

  test("graft_topk is callable from SQL") {
    val spark = TestSpark.spark
    F.register(spark)
    val r = spark.sql(
      """SELECT graft_topk(s, i, 2) AS nn FROM VALUES (1.0, 1L), (5.0, 2L), (3.0, 3L) AS t(s, i)"""
    ).head().getSeq[org.apache.spark.sql.Row](0)
    assert(r.map(x => (x.getDouble(0), x.getLong(1))) == Seq((5.0, 2L), (3.0, 3L)))
  }
}
