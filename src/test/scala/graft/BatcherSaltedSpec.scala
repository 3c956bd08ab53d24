package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Hot-key-salted batch assembly (Batcher.assignBatchesSalted): the
  * sink-side keyed-window mitigation. Degenerate single-bucket keys
  * reproduce the unsalted trigger exactly; salted keys keep the
  * crossing-closes budget contract at local-batch grain and glue
  * bucket-boundary partials. */
class BatcherSaltedSpec extends AnyFunSuite {

  test("one bucket per key: salted assignment equals the unsalted trigger exactly") {
    val spark = TestSpark.spark
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val rows = (0 until 500).map(i => (i % 7L, i.toLong, 50L + rnd.nextInt(200), 0L))
    val df = rows.toDF("key", "ord", "sz", "bkt")
    val plain = graft.sinks.Batcher
      .assignBatches(df, "key", "ord", "sz", maxCount = 9, maxBytes = 1000)
      .select("key", "ord", "batch_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val salted = graft.sinks.Batcher
      .assignBatchesSalted(df, "key", "ord", "sz", "bkt", maxCount = 9, maxBytes = 1000)
      .select("key", "ord", "batch_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(salted == plain, "constant bucket must degenerate to the unsalted policy")
  }

  test("hot key across buckets: coverage, contiguous ids, batch-grain crossing-closes, boundary gluing") {
    val spark = TestSpark.spark
    import spark.implicits._
    // hot key 1: 300 records over 10 buckets of 30; cold key 2;
    // plus NULL-key records — legal input the unsalted trigger
    // batches, which the salted phase-3 join must not drop
    val rows = (0 until 300).map(i => (1L, i.toLong, 100L, i / 30L)) ++
      (0 until 8).map(i => (2L, i.toLong, 100L, 0L))
    val df = rows.toDF("key", "ord", "sz", "bkt")
      .unionByName((0 until 3).map(i => (i.toLong, 100L, 0L))
        .toDF("ord", "sz", "bkt")
        .select(lit(null).cast("long").as("key"), col("ord"), col("sz"), col("bkt")))
    val maxCount = 7L // 30 % 7 != 0 -> every bucket ends in a partial batch
    val out = graft.sinks.Batcher
      .assignBatchesSalted(df, "key", "ord", "sz", "bkt", maxCount = maxCount,
        maxBytes = Long.MaxValue)
      .select("key", "ord", "bkt", "batch_id").collect()
      .map(r => (if (r.isNullAt(0)) Long.MinValue else r.getLong(0),
        r.getLong(1), r.getLong(3), r.getLong(2)))
    // every record exactly once (incl. the 3 NULL-key records, read
    // back under the Long.MinValue sentinel)
    assert(out.length == rows.length + 3)
    assert(out.map(r => (r._1, r._2)).distinct.length == rows.length + 3)
    for ((key, recs) <- out.groupBy(_._1)) {
      val ids = recs.map(_._3).distinct.sorted.toSeq
      assert(ids == (0L until ids.length), s"key $key ids must be 0..n-1: $ids")
      // batch membership is contiguous in ord (records sorted by ord
      // must have non-decreasing batch ids)
      val byOrd = recs.sortBy(_._2).map(_._3)
      assert(byOrd.zip(byOrd.drop(1)).forall { case (a, b) => a <= b },
        s"key $key batch ids must be non-decreasing along ord")
      // crossing-closes at batch grain: a final batch minus its LAST
      // local batch stays under the count budget (the hot key's ords
      // are 0..299 with buckets of 30 and count-7 locals, so a
      // record's local batch is ((ord % 30) / 7) within its bucket)
      if (key == 1L) for ((bid, members) <- recs.groupBy(_._3)) {
        val withLocal = members.map(m => (m, (m._4, (m._2 % 30) / 7)))
        val lastLocal = withLocal.map(_._2).max
        val withoutLast = withLocal.count(_._2 != lastLocal)
        assert(withoutLast < maxCount,
          s"key $key batch $bid may cross only with its last local batch")
      }
    }
    // boundary gluing happened: the hot key's 300 records in 10
    // buckets produce 5 local batches per bucket (7,7,7,7,2) = 50
    // locals; merging must yield strictly fewer final batches
    val hotIds = out.filter(_._1 == 1L).map(_._3).distinct.length
    assert(hotIds < 50, s"partial batches must merge across buckets: $hotIds")
    // and every record still present per final count
    assert(out.count(_._1 == 1L) == 300)
  }

  test("assignBatchesAuto routes on the preflight verdict: plain face below threshold, salted above, full coverage either way") {
    val spark = TestSpark.spark
    import spark.implicits._
    // hot key 1: 120 records over 4 buckets; cold key 2: 5 records
    val rows = (0 until 120).map(i => (1L, i.toLong, 100L, i / 30L)) ++
      (0 until 5).map(i => (2L, i.toLong, 100L, 0L))
    val df = rows.toDF("key", "ord", "sz", "bkt")
    val plain = graft.sinks.Batcher
      .assignBatches(df, "key", "ord", "sz", maxCount = 7, maxBytes = Long.MaxValue)
      .select("key", "ord", "batch_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // threshold far above the hot key -> unsalted face, bit-identical
    val autoPlain = graft.sinks.Batcher
      .assignBatchesAuto(df, "key", "ord", "sz", "bkt", maxCount = 7,
        maxBytes = Long.MaxValue, hotThreshold = 1000L)
      .select("key", "ord", "batch_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(autoPlain == plain, "cold distribution must route to the unsalted face")
    // threshold below the hot key -> salted face: coverage + contiguous
    // per-key ids (batch boundaries may legally differ from the plain
    // face at bucket seams — the documented overshoot trade)
    val autoSalted = graft.sinks.Batcher
      .assignBatchesAuto(df, "key", "ord", "sz", "bkt", maxCount = 7,
        maxBytes = Long.MaxValue, hotThreshold = 100L)
      .select("key", "ord", "batch_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(autoSalted.length == rows.length)
    assert(autoSalted.map(r => (r._1, r._2)).distinct.length == rows.length)
    for ((key, recs) <- autoSalted.groupBy(_._1)) {
      val ids = recs.map(_._3).distinct.sorted.toSeq
      assert(ids == (0L until ids.length), s"key $key ids must be 0..n-1")
    }
    // and the cold key's batches match the plain face exactly (salting
    // only perturbs keys that span buckets)
    val coldAuto = autoSalted.filter(_._1 == 2L).map(r => (r._2, r._3)).toMap
    val coldPlain = plain.collect { case ((2L, ord), bid) => (ord, bid) }.toMap
    assert(coldAuto == coldPlain)
  }
}
