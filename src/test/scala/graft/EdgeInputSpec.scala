package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Edge-input robustness net: empty frames and NULL keys/instants/text
  * are legal pipeline states at 100 TB (a bad upstream day, a filter
  * that matched nothing, a nullable source column), and the round-9
  * self-review found real NULL-key drops in freshly-landed code — this
  * spec probes the REST of the operator surface for the same defect
  * class. Contract per case: no exception, and where a plain/salted
  * operator pair exists, bit-identical results on the degenerate
  * input too. */
class EdgeInputSpec extends AnyFunSuite {
  private def spark = TestSpark.spark

  private def emptyEvents: DataFrame = {
    val s = spark
    import s.implicits._
    Seq.empty[(Long, Long, java.sql.Timestamp, String, Double)]
      .toDF("user_id", "event_id", "ts", "event_type", "value")
  }

  private def emptyOrders: DataFrame = {
    val s = spark
    import s.implicits._
    Seq.empty[(Long, Long, java.sql.Timestamp)]
      .toDF("o_orderkey", "o_custkey", "o_orderdate")
  }

  private def emptyDocs: DataFrame = {
    val s = spark
    import s.implicits._
    Seq.empty[(Long, String)].toDF("doc_id", "text")
  }

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("empty events: sessionization family returns empty, preflight reports 'window', auto routes") {
    assert(graft.operators.Relational.q32Sessions(emptyEvents).count() == 0)
    assert(graft.operators.ScaleOps.sessionsSalted(emptyEvents).count() == 0)
    // preflight on an empty frame: one-row report, no hot key, window verdict
    val pf = graft.operators.ScaleOps
      .windowPreflight(emptyEvents.select("user_id"), "user_id").collect()
    assert(pf.length == 1)
    assert(pf(0).getAs[String]("advice") == "window")
    assert(graft.operators.ScaleOps.sessionsAuto(emptyEvents).count() == 0)
  }

  test("empty inputs: as-of family returns empty / NULL-enriched probes, plain == salted") {
    assert(graft.operators.Relational.q63AsofJoin(emptyEvents, emptyOrders).count() == 0)
    assert(graft.operators.ScaleOps.asofSalted(emptyEvents, emptyOrders).count() == 0)
    assert(graft.operators.ScaleOps.asofAuto(emptyEvents, emptyOrders).count() == 0)
    // probes with NO events at all: every order must surface with NULL
    // event columns, on both faces
    val s = spark
    import s.implicits._
    val orders = Seq((1L, 10L, ts("2024-01-02 00:00:00")),
      (2L, 11L, ts("2024-01-03 00:00:00")))
      .toDF("o_orderkey", "o_custkey", "o_orderdate")
    val plain = graft.operators.Relational.q63AsofJoin(emptyEvents, orders)
      .collect().toSeq.map(_.toString)
    assert(plain.length == 2)
    val salted = graft.operators.ScaleOps.asofSalted(emptyEvents, orders)
      .collect().toSeq.map(_.toString)
    assert(salted == plain)
  }

  test("NULL user_id and NULL ts events: plain == salted sessionization (NULL partition + NULL instant)") {
    val s = spark
    import s.implicits._
    val rows = Seq(
      (Some(1L), 1L, Some(ts("2024-01-01 10:00:00"))),
      (Some(1L), 2L, Some(ts("2024-01-01 10:10:00"))),
      // NULL key: q32's window keeps a NULL partition — sessions still form
      (None: Option[Long], 3L, Some(ts("2024-01-01 11:00:00"))),
      (None: Option[Long], 4L, Some(ts("2024-01-01 11:05:00"))),
      // NULL instant: unix_micros(NULL) rows sort into the NULL bucket
      (Some(2L), 5L, None: Option[java.sql.Timestamp]),
      (Some(2L), 6L, Some(ts("2024-01-01 12:00:00"))))
      .toDF("user_id", "event_id", "ts")
    val plain = graft.operators.Relational.q32Sessions(rows)
      .collect().toSeq.map(_.toString).sorted
    for (bucketMinutes <- Seq(30, 1440)) {
      val salted = graft.operators.ScaleOps
        .sessionsSalted(rows, bucketMinutes = bucketMinutes)
        .collect().toSeq.map(_.toString).sorted
      assert(salted == plain, s"bucketMinutes=$bucketMinutes diverged on NULL key/instant input")
    }
  }

  test("empty documents: dedup and text families return empty without throwing") {
    assert(graft.operators.Dedup.dedupExact(emptyDocs).count() == 0)
    assert(graft.operators.Dedup.dedupMinhashLsh(emptyDocs).count() == 0)
    assert(graft.operators.Dedup.dedupSimhash(emptyDocs).count() == 0)
    assert(graft.operators.TextOps.textQuality(emptyDocs).count() == 0)
  }

  test("NULL text documents: dedup groups them, quality scoring keeps the row") {
    val s = spark
    import s.implicits._
    val docs = Seq((1L, Some("the quick brown fox jumps over the lazy dog")),
      (2L, None: Option[String]), (3L, None: Option[String]))
      .toDF("doc_id", "text")
    // md5(NULL) is NULL: both NULL-text docs fold into one group
    val exact = graft.operators.Dedup.dedupExact(docs).collect()
    assert(exact.length == 2)
    val nullGroup = exact.filter(_.isNullAt(0))
    assert(nullGroup.length == 1 && nullGroup(0).getAs[Long]("n_copies") == 2)
    // quality scoring must not throw or drop rows on NULL text
    assert(graft.operators.TextOps.textQuality(docs).count() == 3)
  }

  test("empty events: gapfill and sketch families return empty without throwing") {
    assert(graft.operators.Relational.q59Gapfill(emptyEvents).count() == 0)
    assert(graft.operators.ScaleOps.countMin(emptyEvents).count() == 0)
    assert(graft.operators.ScaleOps.hllGrouped(emptyEvents).count() == 0)
  }

  test("empty embeddings / empty corpus: ANN brute force and BPE training return empty") {
    val s = spark
    import s.implicits._
    val emptyEmb = Seq.empty[(Long, Array[Float])].toDF("vec_id", "embedding")
    assert(graft.operators.Ann.annBruteforce(emptyEmb).count() == 0)
    // BPE on an empty corpus: zero merge rounds, empty merge table
    assert(graft.operators.TextOps.tokenizerBpe(emptyDocs).count() == 0)
    assert(graft.operators.TextOps.tokenizerBpeBatched(emptyDocs).count() == 0)
  }

  test("empty batch frame: both batcher faces and the router return empty") {
    val s = spark
    import s.implicits._
    val df = Seq.empty[(Long, Long, Long, Long)].toDF("key", "ord", "sz", "bkt")
    assert(graft.sinks.Batcher.assignBatches(df, "key", "ord", "sz", 10).count() == 0)
    assert(graft.sinks.Batcher
      .assignBatchesSalted(df, "key", "ord", "sz", "bkt", 10).count() == 0)
    assert(graft.sinks.Batcher
      .assignBatchesAuto(df, "key", "ord", "sz", "bkt", 10).count() == 0)
  }

  test("round-9b additions: empty and NULL-laden inputs return empty without throwing") {
    val s = spark
    import s.implicits._
    // KMV: empty orders and all-NULL keys both yield an empty report
    // (no side rows → no sketch → the side-stat crossJoin is empty)
    val emptyPrio = Seq.empty[(String, Option[Long])]
      .toDF("o_orderpriority", "o_custkey")
    assert(graft.operators.ScaleOps.kmvSetOps(emptyPrio).count() == 0)
    val nullKeys = Seq(("1-URGENT", Option.empty[Long]),
      ("2-HIGH", Option.empty[Long])).toDF("o_orderpriority", "o_custkey")
    assert(graft.operators.ScaleOps.kmvSetOps(nullKeys).count() == 0)
    // heavy hitters: empty corpus and NULL-text docs → empty report
    // (markers still sum — to zero — and the strict > filter holds)
    assert(graft.operators.ScaleOps.heavyHitters(emptyDocs).count() == 0)
    assert(graft.operators.ScaleOps.heavyHitters(
      Seq((1L, Option.empty[String])).toDF("doc_id", "text")).count() == 0)
    // certified top-k and heavy earners: empty corpus → empty report
    assert(graft.operators.ScaleOps.topkCertified(emptyDocs).count() == 0)
    assert(graft.operators.ScaleOps.heavyEarners(
      Seq.empty[(Long, String, Long)].toDF("doc_id", "lang", "n_chars"))
      .count() == 0)
    // zonemap: empty lineitem → empty map
    val emptyLines = Seq.empty[(java.sql.Timestamp, Long)]
      .toDF("l_shipdate", "l_orderkey")
    assert(graft.operators.ScaleOps.zonemapPrune(emptyLines).count() == 0)
    // binary rerank: empty corpus → no thresholds, no queries, empty
    val emptyEmb = Seq.empty[(Long, Array[Float])].toDF("vec_id", "embedding")
    assert(graft.operators.Ann.annBinaryRerank(emptyEmb).count() == 0)
  }
}
