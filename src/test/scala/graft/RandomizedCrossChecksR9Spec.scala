package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.ScaleOps

/** Randomized cross-checks for the round-9 rewrites: the single-pass
  * integrity audit replays against a brute-force Scala reference on
  * random frames that VIOLATE every assumption (duplicate and null
  * order keys, orphan custkeys, empty sides), and the salted batcher's
  * degenerate case replays against the unsalted trigger on random
  * sizes. Fixed seeds: failures reproduce. */
class RandomizedCrossChecksR9Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("single-pass integrity audit matches brute force on adversarial random frames") {
    val spark = this.spark
    import spark.implicits._
    val rnd = new scala.util.Random(1709)
    for (trial <- 1 to 8) {
      val nOrders = rnd.nextInt(60)
      val nLines = rnd.nextInt(120)
      // small key domains force duplicates; ~8% null lineitem keys
      val orders = (0 until nOrders).map { _ =>
        (rnd.nextInt(20).toLong, rnd.nextInt(8).toLong)
      }
      val lines = (0 until nLines).map { _ =>
        (if (rnd.nextInt(12) == 0) Option.empty[Long]
         else Option(rnd.nextInt(25).toLong),
          rnd.nextInt(10) - 2.0) // some nonpositive quantities
      }
      val custs = (0 until 6).map(_.toLong)
      // brute force mirrors the original five left-anti/filter branches
      val lineKeys = lines.flatMap(_._1).toSet
      val orderKeys = orders.map(_._1).toSet
      val want = Map(
        "childless_order" -> orders.count(o => !lineKeys.contains(o._1)).toLong,
        "nonpositive_qty" -> lines.count(_._2 <= 0).toLong,
        "null_lineitem_key" -> lines.count(_._1.isEmpty).toLong,
        "orphan_lineitem" -> lines.count(l =>
          l._1.isEmpty || !orderKeys.contains(l._1.get)).toLong,
        "orphan_order_customer" -> orders.count(o => !custs.contains(o._2)).toLong)
      val got = ScaleOps.integrityAudit(
          orders.toDF("o_orderkey", "o_custkey"),
          lines.toDF("l_orderkey", "l_quantity"),
          custs.map(Tuple1(_)).toDF("c_custkey"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(got == want, s"trial $trial (orders=$nOrders lines=$nLines): $got vs $want")
    }
  }

  test("salted batcher degenerates to the unsalted trigger on random single-bucket frames") {
    val spark = this.spark
    import spark.implicits._
    val rnd = new scala.util.Random(1907)
    for (trial <- 1 to 4) {
      val rows = (0 until 200 + rnd.nextInt(200)).map(i =>
        (rnd.nextInt(5).toLong, i.toLong, 10L + rnd.nextInt(500), 0L))
      val df = rows.toDF("key", "ord", "sz", "bkt")
      val maxCount = 3L + rnd.nextInt(10)
      val maxBytes = 500L + rnd.nextInt(2000)
      val plain = graft.sinks.Batcher
        .assignBatches(df, "key", "ord", "sz", maxCount, maxBytes)
        .select("key", "ord", "batch_id").collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
      val salted = graft.sinks.Batcher
        .assignBatchesSalted(df, "key", "ord", "sz", "bkt", maxCount, maxBytes)
        .select("key", "ord", "batch_id").collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
      assert(salted == plain, s"trial $trial (maxCount=$maxCount maxBytes=$maxBytes)")
    }
  }
}
