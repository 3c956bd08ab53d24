package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.sql.Timestamp
import graft.streaming.Streams
import graft.streaming.{KeyedBatch, OffsetAssignment}

class StreamingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("windowAgg on a stream aggregates by event-time tumbling window with watermark") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[(Timestamp, String, Double)]
    val events = mem.toDF().toDF("ts", "event_type", "value")
    val q = Streams.windowAgg(events, "1 hour", "10 minutes")
      .writeStream.format("memory").queryName("wa").outputMode("update").start()
    mem.addData(
      (ts("2024-01-01 10:05:00"), "view", 1.0),
      (ts("2024-01-01 10:55:00"), "view", 2.0),
      (ts("2024-01-01 11:05:00"), "click", 5.0))
    q.processAllAvailable()
    val out = spark.table("wa").collect().map(r =>
      (r.getTimestamp(0).toString, r.getString(1), r.getLong(2), r.getDouble(3))).toSet
    assert(out.contains(("2024-01-01 10:00:00.0", "view", 2L, 3.0)))
    assert(out.contains(("2024-01-01 11:00:00.0", "click", 1L, 5.0)))

    // late beyond the 10-minute watermark (watermark ≈ 10:55) → dropped
    mem.addData((ts("2024-01-01 09:00:00"), "view", 100.0))
    q.processAllAvailable()
    val late = spark.table("wa").collect()
      .filter(r => r.getTimestamp(0).toString.startsWith("2024-01-01 09"))
    assert(late.isEmpty)
    q.stop()
  }

  test("batch sessionize splits on the 30-minute gap") {
    import spark.implicits._
    val df = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1.0),
      (1L, ts("2024-01-01 10:10:00"), 2.0),
      (1L, ts("2024-01-01 10:40:00"), 3.0), // exactly 30m after previous → new session
      (2L, ts("2024-01-01 09:00:00"), 4.0))
      .toDF("user_id", "ts", "value")
    val sessions = Streams.sessionize(df, 30).collect()
    assert(sessions.length == 3)
    val u1 = sessions.filter(_.getLong(0) == 1L)
    assert(u1.map(_.getLong(3)).toSeq == Seq(2L, 1L)) // n_events per session
  }

  test("sessionizeStreaming emits watermark-closed sessions") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[(Timestamp, Long)]
    val events = mem.toDF().toDF("ts", "user_id")
    val q = Streams.sessionizeStreaming(events, 30, "5 minutes")
      .writeStream.format("memory").queryName("ss").outputMode("append").start()
    mem.addData((ts("2024-01-01 10:00:00"), 1L), (ts("2024-01-01 10:10:00"), 1L))
    q.processAllAvailable()
    // advance watermark far past the session gap so the session closes
    mem.addData((ts("2024-01-01 12:00:00"), 9L))
    q.processAllAvailable()
    mem.addData((ts("2024-01-01 14:00:00"), 9L))
    q.processAllAvailable()
    val out = spark.table("ss").collect().map(r => (r.getLong(1), r.getLong(2)))
    assert(out.contains((1L, 2L)))
    q.stop()
  }

  test("assignOffsets tracks per-key monotone offsets and recreates expired streams") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val day = 24L * 60 * 60 * 1000
    val mem = MemoryStream[KeyedBatch]
    val q = Streams.assignOffsets(mem.toDS(), ttlDays = 7)
      .writeStream.format("memory").queryName("offsets").outputMode("append").start()
    mem.addData(KeyedBatch("t1", 10, 0), KeyedBatch("t2", 3, 0))
    q.processAllAvailable()
    mem.addData(KeyedBatch("t1", 5, day))
    q.processAllAvailable()
    mem.addData(KeyedBatch("t1", 2, 9 * day)) // > 7d since last update → new stream
    q.processAllAvailable()
    val out = spark.table("offsets").as[OffsetAssignment].collect()
    val t1 = out.filter(_.key == "t1").sortBy(_.offsetStart != 0).toSeq
    assert(out.filter(_.key == "t2").head == OffsetAssignment("t2", "t2/streams/0", 0, 3, recreated = true))
    val byStream = out.filter(_.key == "t1").groupBy(_.stream)
    assert(byStream("t1/streams/0").map(a => (a.offsetStart, a.n)).sortBy(_._1).toSeq == Seq((0L, 10L), (10L, 5L)))
    assert(byStream("t1/streams/1").map(a => (a.offsetStart, a.n, a.recreated)).toSeq == Seq((0L, 2L, true)))
    q.stop()
  }
}

class IntervalJoinSpec extends org.scalatest.funsuite.AnyFunSuite {
  test("stream-stream interval join matches views within the window, drops older state") {
    val spark = TestSpark.spark
    import spark.implicits._
    implicit val sq = spark.sqlContext
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val views = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(java.sql.Timestamp, Long, Long)]
    val purchases = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(java.sql.Timestamp, Long, Long)]
    val q = graft.streaming.Streams.intervalJoin(
        views.toDF().toDF("ts", "user_id", "event_id"),
        purchases.toDF().toDF("ts", "user_id", "event_id"), 60)
      .writeStream.format("memory").queryName("ivj").outputMode("append").start()
    try {
      views.addData((ts("2024-01-01 10:00:00"), 1L, 100L), (ts("2024-01-01 08:00:00"), 1L, 101L))
      purchases.addData((ts("2024-01-01 10:30:00"), 1L, 200L))
      q.processAllAvailable()
      val got = spark.table("ivj").collect().map(r => (r.getLong(2), r.getLong(5))).sorted
      // only the 10:00 view is within the preceding hour of the 10:30 purchase
      assert(got.toSeq == Seq((200L, 100L)))
    } finally q.stop()
  }
}

class StreamingDecontaminateSpec extends org.scalatest.funsuite.AnyFunSuite {
  test("ingest-time decontamination drops docs sharing a 13-gram with the static benchmark") {
    val spark = TestSpark.spark
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val bench13 = (1 to 13).map(i => s"b$i").mkString(" ")
    val benchmark = Seq(0L -> bench13).toDF("doc_id", "text")
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
    val q = graft.operators.TextOps.decontaminateStream(
        mem.toDF().toDF("doc_id", "text"), benchmark)
      .writeStream.format("memory").queryName("decon").outputMode("append").start()
    try {
      mem.addData(
        (1L, s"leading words $bench13 and a tail"), // contaminated -> dropped
        (2L, "a perfectly clean training document with original content"),
        (3L, (1 to 20).map(i => s"c$i").mkString(" "))) // clean, > k tokens
      q.processAllAvailable()
      val kept = spark.table("decon").collect().map(_.getLong(0)).toSet
      assert(kept == Set(2L, 3L), s"got $kept")
    } finally q.stop()
  }
}

class StreamingMixSpec extends org.scalatest.funsuite.AnyFunSuite {
  test("ingest-time mixing applies static per-domain rates with zero streaming state") {
    val spark = TestSpark.spark
    import spark.implicits._
    implicit val sq = spark.sqlContext
    // keep-all vs drop-all thresholds make the assertion deterministic
    // without repeating the md5 bucket math in the test
    val rates = Seq(("keepme", 10000L), ("dropme", 0L)).toDF("source", "thresh")
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String, String)]
    val q = graft.operators.TextOps.mixStream(
        mem.toDF().toDF("doc_id", "text", "source"), rates)
      .writeStream.format("memory").queryName("mix").outputMode("append").start()
    try {
      mem.addData(
        (1L, "doc one", "keepme"), (2L, "doc two", "dropme"),
        (3L, "doc three", "keepme"), (4L, "doc four", "dropme"),
        // domain absent from the rates snapshot: kept by default (a new
        // domain appearing mid-stream must survive until the next snapshot)
        (5L, "doc five", "brandnew"))
      q.processAllAvailable()
      val kept = spark.table("mix").collect().map(r => r.getLong(1)).toSet
      assert(kept == Set(1L, 3L, 5L), s"got $kept")
      // stateless: the progress metrics report no state store rows
      assert(q.lastProgress == null ||
        q.lastProgress.stateOperators.isEmpty)
    } finally q.stop()
  }
}

class StreamingCurationSpec extends org.scalatest.funsuite.AnyFunSuite {
  test("curation pipeline runs on a stream: dedup, quality gate, langid, split") {
    val spark = TestSpark.spark
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(java.sql.Timestamp, Long, String)]
    val docs = mem.toDF().toDF("ts", "doc_id", "text")
    val q = graft.operators.TextOps.curationStream(docs, "10 minutes", minQuality = 0.5)
      .writeStream.format("memory").queryName("cur").outputMode("append").start()
    try {
      val t = java.sql.Timestamp.valueOf("2024-01-01 10:00:00")
      val good = "the cat sat on the mat and the dog is in the house of a friend " * 5
      val german = "der hund und die katze das haus ist ein garten und der baum " * 5
      mem.addData(
        (t, 1L, good),
        (t, 2L, good),            // exact duplicate -> dropped
        (t, 3L, "!!! ??? ;;; ,,,"), // junk -> quality-gated
        (t, 4L, german))
      q.processAllAvailable()
      // duplicate arriving in a later micro-batch, still inside watermark
      mem.addData((java.sql.Timestamp.valueOf("2024-01-01 10:05:00"), 5L, good))
      q.processAllAvailable()
      val rows = spark.table("cur").collect()
        .map(r => r.getLong(0) -> (r.getString(2), r.getString(3))).toMap
      assert(rows.keySet == Set(1L, 4L), s"got ${rows.keySet}")
      assert(rows(1L)._1 == "en" && rows(4L)._1 == "de")
      assert(Set("train", "val", "test").contains(rows(1L)._2))
    } finally q.stop()
  }
}

class StreamingAssemblySpec extends AnyFunSuite {
  test("the full ingest line runs as ONE streaming DAG: decontaminate -> " +
    "quality gate -> mix -> timeout-batched packing -> exactly-once sink") {
    val spark = TestSpark.spark
    import spark.implicits._
    implicit val sq = spark.sqlContext
    // static sides: a 13-gram benchmark and a rates snapshot that has
    // never seen the "fresh" domain (left-join default must keep it)
    val bench13 = (1 to 13).map(i => s"b$i").mkString(" ")
    val benchmark = Seq(0L -> bench13).toDF("doc_id", "text")
    val rates = Seq(("web", 10000L), ("spam", 0L)).toDF("source", "thresh")
    val mem = MemoryStream[(Timestamp, Long, String, String)]
    val docs = mem.toDF().toDF("ts", "doc_id", "text", "source")

    // the composed line: three zero-state ingest stages, then the ONLY
    // stateful operator (the event-time batcher), then the 2-phase sink
    val gated = graft.operators.TextOps.mixStream(
      graft.operators.TextOps.qualityGate(
        graft.operators.TextOps.decontaminateStream(docs, benchmark), 0.5),
      rates)
    val timed = gated.select(
        col("source").as("key"), col("text").as("payload"),
        size(split(trim(lower(col("text"))), "\\s+")).cast("long").as("sizeBytes"),
        unix_millis(col("ts")).as("eventMillis"))
      .as[graft.streaming.TimedRecord]
    val packs = Streams.timeoutBatcher(timed,
      maxCount = 2, maxBytes = 1000, timeoutMs = 60000)

    val sinkDir = java.nio.file.Files.createTempDirectory("graft-assembly").toString
    val sink = new graft.sinks.ExactlyOnceParquetSink(sinkDir)
    val q = packs.writeStream.outputMode("append")
      .foreachBatch((df: org.apache.spark.sql.Dataset[graft.streaming.FiredBatch],
                     epoch: Long) => { sink.addBatch(df.toDF(), epoch); () })
      .start()
    try {
      val good = "the cat sat on the mat and the dog is in the house of a friend " * 5
      val t0 = Timestamp.valueOf("2024-01-01 10:00:00").getTime
      def ts(ms: Long) = new Timestamp(ms)
      mem.addData(
        (ts(t0), 1L, s"leading words $bench13 trailing", "web"), // contaminated -> dropped
        (ts(t0), 2L, good, "web"),                               // kept
        (ts(t0), 3L, "!!! ??? ;;; ,,,", "web"),                  // junk -> quality-gated
        (ts(t0), 4L, good, "spam"),                              // domain thresh 0 -> dropped
        (ts(t0 + 10), 5L, good, "web"),     // kept: web now 2 docs -> pack fires on count
        (ts(t0 + 20), 6L, good, "fresh"))   // unseen domain kept; 1 doc pending
      q.processAllAvailable()
      // advance the watermark past the fresh-domain pack's 60s timeout.
      // Ticks must SURVIVE the gates (clean, high-quality, kept domain):
      // a filtered-out row never reaches the watermark node. Two ticks:
      // the first carries the watermark forward, the second's micro-batch
      // applies it (timeouts fire against the PREVIOUS batch's watermark)
      // and its two pending web docs close a second count pack.
      mem.addData((ts(t0 + 120000), 7L, good, "web"))
      q.processAllAvailable()
      mem.addData((ts(t0 + 121000), 8L, good, "web"))
      q.processAllAvailable()

      val fired = sink.read(spark).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getString(3)))
      assert(fired.toSet == Set(("web", 2L, "count"), ("fresh", 1L, "timeout")),
        s"got ${fired.toSeq}")
      // exactly-once: replaying an already-committed epoch is a no-op
      val before = sink.read(spark).count()
      val replayEpoch = sink.committedEpochs().max
      val replayed = sink.addBatch(
        Seq(graft.streaming.FiredBatch("web", 99L, 99L, "count")).toDF(), replayEpoch)
      assert(!replayed && sink.read(spark).count() == before)
      // the three ingest stages are stateless: the DAG's state-operator
      // list is exactly the one batcher
      val ops = q.lastProgress.stateOperators
      assert(ops.length == 1, s"expected 1 state operator, got ${ops.length}")
      assert(ops(0).operatorName.contains("flatMapGroupsWithState"),
        s"got ${ops(0).operatorName}")
    } finally q.stop()
  }
}

class StreamingIncrementalDedupSpec extends AnyFunSuite {
  test("ingest-stream dedup probes the stored LSH index per batch and grows it " +
    "with each batch's kept docs") {
    val spark = TestSpark.spark
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val corpusText1 = "the quick brown fox jumps over the lazy dog near the riverbank today"
    val corpusText2 = "a completely different document about distributed query engines and shuffles"
    val novelText1 = "training data pipelines need scalable deduplication before any model sees text"
    val novelText2 = "yet another unrelated passage covering columnar storage formats and encodings"
    val indexDir = java.nio.file.Files.createTempDirectory("graft-incdedup").toString
    // seed the standing index with the corpus signatures (the write a
    // production pipeline does once)
    graft.operators.Dedup.corpusSignatures(
        Seq(1L -> corpusText1, 2L -> corpusText2).toDF("doc_id", "text"))
      .write.parquet(s"$indexDir/bseed")

    val verdicts = scala.collection.mutable.Map[Long, Array[(Long, Option[Long], Boolean)]]()
    val mem = MemoryStream[(Long, String)]
    val q = graft.operators.Dedup.dedupIncrementalStream(
        mem.toDF().toDF("doc_id", "text"), indexDir) { (vs, id) =>
        verdicts(id) = vs.collect().map(r =>
          (r.getLong(0), if (r.isNullAt(1)) None else Some(r.getLong(1)), r.getBoolean(3)))
      }
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("graft-incdedup-ck").toString)
      .start()
    try {
      // batch 0: one corpus duplicate, one novel doc
      mem.addData((101L, corpusText1), (102L, novelText1))
      q.processAllAvailable()
      // batch 1: a dup of the doc KEPT in batch 0 (only catchable if the
      // index grew), plus another novel doc
      mem.addData((201L, novelText1), (202L, novelText2))
      q.processAllAvailable()
    } finally q.stop()

    assert(verdicts(0L).toSet ==
      Set((101L, Some(1L), false), (102L, None, true)), s"got ${verdicts(0L).toSeq}")
    assert(verdicts(1L).toSet ==
      Set((201L, Some(102L), false), (202L, None, true)), s"got ${verdicts(1L).toSeq}")
    // the index holds the seed plus exactly the kept docs' signatures
    val ids = spark.read.parquet(s"$indexDir/*").select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(ids == Set(1L, 2L, 102L, 202L), s"got $ids")
    // REPLAY: a fresh stream re-delivers batch 0 while the index
    // already holds 102's signature — without the self-pair guard 102
    // would dup ITSELF and the replayed epoch would rewrite empty
    // (silent index data loss on recovery); with it the epoch
    // overwrites with identical content
    val mem2 = MemoryStream[(Long, String)]
    val q2 = graft.operators.Dedup.dedupIncrementalStream(
        mem2.toDF().toDF("doc_id", "text"), indexDir) { (_, _) => () }
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("graft-incdedup-ck2").toString)
      .start()
    try {
      mem2.addData((101L, corpusText1), (102L, novelText1))
      q2.processAllAvailable()
    } finally q2.stop()
    val b0 = spark.read.parquet(s"$indexDir/b0").select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(b0 == Set(102L),
      s"a replayed epoch must rewrite its own content, not empty itself: $b0")
    // BATCH-MATE replay: a batch whose two docs are near-dups of each
    // other but of nothing standing. First run keeps both (batch-
    // internal dups are out of scope by contract); on replay both sit
    // in the epoch's own delta dir — which must be EXCLUDED from the
    // probe, or each would drop the other and the epoch rewrites empty
    val mateText = (1 to 30).map(i => s"mate$i").mkString(" ")
    val mem3 = MemoryStream[(Long, String)]
    val q3 = graft.operators.Dedup.dedupIncrementalStream(
        mem3.toDF().toDF("doc_id", "text"), indexDir) { (_, _) => () }
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("graft-incdedup-ck3").toString)
      .start()
    try {
      mem3.addData((301L, mateText), (302L, mateText + " tailword"))
      q3.processAllAvailable()
    } finally q3.stop()
    assert(spark.read.parquet(s"$indexDir/b0").count() == 2,
      "first run keeps both batch-mates")
    val mem4 = MemoryStream[(Long, String)]
    val q4 = graft.operators.Dedup.dedupIncrementalStream(
        mem4.toDF().toDF("doc_id", "text"), indexDir) { (_, _) => () }
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("graft-incdedup-ck4").toString)
      .start()
    try {
      mem4.addData((301L, mateText), (302L, mateText + " tailword"))
      q4.processAllAvailable()
    } finally q4.stop()
    val replayed = spark.read.parquet(s"$indexDir/b0").select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(replayed == Set(301L, 302L),
      s"replayed batch-mates must not drop each other: $replayed")
  }
}

class DsirStreamSpec extends AnyFunSuite {
  test("ingest-time DSIR keeps target-like docs with exact micro-unit scores") {
    val spark = TestSpark.spark
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val B = 256
    val tgtText = (1 to 20).map(i => s"alpha$i").mkString(" ")
    val rawText = (1 to 20).map(i => s"zulu$i").mkString(" ")
    val corpus = (
      (1L to 3L).map(i => (i, "tgt", tgtText)) ++
      (4L to 6L).map(i => (i, "web", rawText))
    ).toDF("doc_id", "source", "text")
    val ratios = graft.operators.TextOps.dsirRatios(corpus, "tgt", B)
    val ratioMap = ratios.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(ratioMap.size == B, "ratio table is dense over all buckets")

    // expected exact scores via the same md5-60 bucket hash
    def lw(text: String): Long = {
      val toks = text.trim.toLowerCase.split(" ").toSeq
      val grams = toks ++ toks.sliding(2).filter(_.size == 2).map(_.mkString(" "))
      grams.map(g => ratioMap(java.lang.Long.remainderUnsigned(
        graft.functions.HashImpls.md5Hash60(g.getBytes("UTF-8")), B.toLong))).sum
    }
    assert(lw(tgtText) > 0 && lw(rawText) < 0, "planted corpus separates")

    val got = scala.collection.mutable.ArrayBuffer[(Long, Long)]()
    val mem = MemoryStream[(Long, String, String)]
    val q = graft.operators.TextOps.dsirStream(
        mem.toDF().toDF("doc_id", "source", "text"), ratios, minLwMicro = 0L, buckets = B)
      .writeStream.outputMode("append").format("memory").queryName("dsir_keep").start()
    try {
      mem.addData((100L, "web", tgtText), (101L, "web", rawText))
      q.processAllAvailable()
      val rows = spark.sql("select doc_id, lw_micro from dsir_keep").collect()
      got ++= rows.map(r => (r.getLong(0), r.getLong(1)))
    } finally q.stop()
    // the target-like doc survives with the exact batch-formula score;
    // the raw-vocabulary doc is filtered at ingest
    assert(got.toSeq == Seq((100L, lw(tgtText))), s"got $got (want ${(100L, lw(tgtText))})")
  }
}

class TokenizerStreamSpec extends AnyFunSuite {
  test("ingest-time tokenization matches the batch face; unseen words fall back to chars") {
    val spark = TestSpark.spark
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val corpus = Seq(
      (1L, "low lower lowest low low"),
      (2L, "newer new news low lower")
    ).toDF("doc_id", "text")
    val vocab = graft.operators.TextOps.tokenizerVocab(corpus)
    val batch = graft.operators.TextOps.tokenizerApply(corpus).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap

    val got = scala.collection.mutable.Map[Long, (Long, Long)]()
    val mem = MemoryStream[(Long, String)]
    val q = graft.operators.TextOps.tokenizerApplyStream(
        mem.toDF().toDF("doc_id", "text"), vocab)
      .writeStream.outputMode("append").format("memory").queryName("tok_stream").start()
    try {
      mem.addData(
        (1L, "low lower lowest low low"),   // all in-vocab -> must equal batch
        (10L, "zzz low"))                   // zzz unseen -> 3 chars + vocab("low")
      q.processAllAvailable()
      spark.sql("select doc_id, n_words, n_subtokens from tok_stream").collect()
        .foreach(r => got(r.getLong(0)) = (r.getLong(1), r.getLong(2)))
    } finally q.stop()

    assert(got(1L) == batch(1L), s"stream ${got(1L)} must equal batch ${batch(1L)}")
    val lowNs = vocab.filter($"word" === "low").collect().head.getLong(1)
    assert(got(10L) == ((2L, 3L + lowNs)), s"got ${got(10L)}, low=$lowNs")
  }
}

class StreamingGrandAssemblySpec extends AnyFunSuite {
  test("the COMPLETE ingest line is one DAG: decontaminate -> quality -> mix -> " +
    "DSIR -> tokenize -> token-budget packing -> exactly-once sink, one state op") {
    val spark = TestSpark.spark
    import spark.implicits._
    implicit val sq = spark.sqlContext

    // corpus snapshot: target domain speaks "alpha" vocabulary, the raw
    // web speaks "zulu" — the DSIR gate must pass alpha docs, drop zulu
    val alphaText = (1 to 30).map(i => s"alpha$i beta$i").mkString(" ")
    val zuluText = (1 to 30).map(i => s"zulu$i yank$i").mkString(" ")
    val snapshot = (
      (1L to 3L).map(i => (i, "tgt", alphaText)) ++
      (4L to 6L).map(i => (i, "web", zuluText))
    ).toDF("doc_id", "source", "text")
    // static sides a production pipeline precomputes per snapshot:
    val ratios = graft.operators.TextOps.dsirRatios(snapshot, "tgt", 256)
    val vocab = graft.operators.TextOps.tokenizerVocab(snapshot)
    val bench13 = (1 to 13).map(i => s"b$i").mkString(" ")
    val benchmark = Seq(0L -> bench13).toDF("doc_id", "text")
    val rates = Seq(("web", 10000L), ("spam", 0L)).toDF("source", "thresh")

    val mem = MemoryStream[(Timestamp, Long, String, String)]
    val docs = mem.toDF().toDF("ts", "doc_id", "text", "source")
    val gated = graft.operators.TextOps.dsirStream(
      graft.operators.TextOps.mixStream(
        graft.operators.TextOps.qualityGate(
          graft.operators.TextOps.decontaminateStream(docs, benchmark), 0.2),
        rates),
      ratios, minLwMicro = 0L, buckets = 256)
    // tokenize at ingest: the BPE subtoken count IS the pack budget
    val timed = graft.operators.TextOps.tokenizerApplyStream(gated, vocab)
      .select(col("source").as("key"), col("text").as("payload"),
        col("n_subtokens").as("sizeBytes"), unix_millis(col("ts")).as("eventMillis"))
      .as[graft.streaming.TimedRecord]
    val packs = Streams.timeoutBatcher(timed,
      maxCount = 100, maxBytes = 500, timeoutMs = 60000)

    val sinkDir = java.nio.file.Files.createTempDirectory("graft-grand").toString
    val sink = new graft.sinks.ExactlyOnceParquetSink(sinkDir)
    val q = packs.writeStream.outputMode("append")
      .foreachBatch((df: org.apache.spark.sql.Dataset[graft.streaming.FiredBatch],
                     epoch: Long) => { sink.addBatch(df.toDF(), epoch); () })
      .start()
    try {
      val t0 = Timestamp.valueOf("2024-02-01 09:00:00").getTime
      def ts(ms: Long) = new Timestamp(ms)
      mem.addData(
        (ts(t0), 10L, alphaText, "web"),                         // survives all gates
        (ts(t0), 11L, zuluText, "web"),                          // DSIR-dropped (raw vocab)
        (ts(t0), 12L, s"x $bench13 y", "web"),                   // contaminated
        (ts(t0), 13L, alphaText, "spam"),                        // mix-dropped
        (ts(t0 + 10), 14L, alphaText, "web"))                    // survives
      q.processAllAvailable()
      // each alpha doc is 60 in-vocab words; two docs exceed the
      // 500-subtoken budget -> the byte trigger closes a pack
      mem.addData((ts(t0 + 120000), 15L, alphaText, "web"))
      q.processAllAvailable()
      mem.addData((ts(t0 + 121000), 16L, alphaText, "web"))
      q.processAllAvailable()

      val fired = sink.read(spark).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getString(3)))
      assert(fired.nonEmpty, "at least one pack must fire")
      // only gate-surviving web docs are ever packed, and every pack's
      // size is a sum of per-doc subtoken counts (the vocab says 60
      // words x ns subtokens per alpha doc)
      val perDoc = graft.operators.TextOps.tokenizerApplyStream(
          Seq((10L, alphaText)).toDF("doc_id", "text"), vocab)
        .collect().head.getAs[Long]("n_subtokens")
      assert(fired.forall { case (k, n, bytes, _) =>
        k == "web" && bytes == n * perDoc }, s"got ${fired.toSeq}, perDoc=$perDoc")
      assert(fired.map(_._2).sum <= 5, "only the five surviving docs can be packed")
      val ops = q.lastProgress.stateOperators
      assert(ops.length == 1, s"expected exactly 1 state operator, got ${ops.length}")
    } finally q.stop()
  }
}

class Scd2StreamSpec extends org.scalatest.funsuite.AnyFunSuite {
  test("scd2 stream emits exactly the batch face's CLOSED versions, spanning batches") {
    val spark = TestSpark.spark
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.functions._
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    import graft.streaming.{StateEvent, Streams}
    val b1 = Seq(
      StateEvent(1L, "a", 1000L, 1L), StateEvent(1L, "a", 2000L, 2L),
      StateEvent(1L, "b", 3000L, 3L), // closes (a, 1000, 3000, 2)
      StateEvent(2L, "x", 1500L, 10L))
    val b2 = Seq(
      StateEvent(1L, "b", 4000L, 4L),
      StateEvent(1L, "c", 5000L, 5L), // closes (b, 3000, 5000, 2) ACROSS batches
      StateEvent(2L, "x", 2500L, 11L)) // user 2 never changes -> nothing emitted
    val mem = MemoryStream[StateEvent]
    val closed = scala.collection.mutable.Buffer.empty[(Long, String, Long, Long, Long)]
    val sink: (org.apache.spark.sql.Dataset[graft.streaming.Scd2Version], Long) => Unit =
      (out, _) => closed ++= out.collect().map(v =>
        (v.user_id, v.state, v.valid_from_us, v.valid_to_us, v.n_events))
    val q = Streams.scd2Stream(mem.toDS()).writeStream
      .foreachBatch(sink)
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("graft-scd2-ck").toString)
      .start()
    try {
      mem.addData(b1: _*); q.processAllAvailable()
      mem.addData(b2: _*); q.processAllAvailable()
    } finally q.stop()
    // the batch face over ALL events: its closed rows (valid_to set)
    // must equal the stream's emissions exactly
    val events = (b1 ++ b2).toDF()
      .select(col("user_id"), col("event_id"),
        timestamp_micros(col("eventMicros")).as("ts"),
        col("event_type"))
    val batchClosed = graft.operators.Relational.q58Scd2(events)
      .filter(col("valid_to_us").isNotNull)
      .select(col("user_id"), col("state"), col("valid_from_us"),
        col("valid_to_us"), col("n_events"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet
    assert(closed.toSet == batchClosed,
      s"stream: ${closed.toSet}\nbatch: $batchClosed")
    assert(closed.toSet == Set(
      (1L, "a", 1000L, 3000L, 2L), (1L, "b", 3000L, 5000L, 2L)))
  }
}
