package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.ScaleOps

/** Round-7 ops additions: per-column profile diff between epochs and
  * the deterministic per-key sample. */
class ProfileDiffSampleSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("profile diff flags a collapsed column and only that column") {
    val spark = this.spark
    import spark.implicits._
    // epoch A (even ids): 5 distinct langs; epoch B (odd ids): lang
    // collapses to one value — the drift the audit exists to catch
    val docs = (0 until 20).map { i =>
      val lang = if (i % 2 == 0) s"l${i % 10 / 2}" else "xx"
      (i.toLong, s"some text $i", lang, "web", 12L)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = ScaleOps.profileDiff(docs).collect()
      .map(r => r.getString(0) -> r).toMap
    val lang = out("lang")
    assert(lang.getAs[Long]("distinct_shift_bp") == 1000L - 5000L,
      s"lang: $lang")
    assert(lang.getAs[Boolean]("drifted"), "collapsed lang must drift")
    assert(!out("source").getAs[Boolean]("drifted"))
    assert(out("doc_id").getAs[Boolean]("minmax_moved"),
      "parity halves have different min/max ids")
  }

  test("chunking covers every token with the documented overlap") {
    val spark = this.spark
    import spark.implicits._
    // 50 tokens, window 32, stride 24 -> chunks at 0 (len 32), 24
    // (len 26), 48 (len 2): full coverage, 8-token overlap
    val text = (1 to 50).map(i => s"w$i").mkString(" ")
    val docs = Seq((7L, text)).toDF("doc_id", "text")
    val out = graft.operators.TextOps.textChunk(docs).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq == Seq((0L, 0L, 32L), (1L, 24L, 26L), (2L, 48L, 2L)),
      s"got ${out.toSeq}")
    // a short doc still yields exactly one (whole-doc) chunk
    val one = graft.operators.TextOps.textChunk(
      Seq((1L, "a b c")).toDF("doc_id", "text")).collect()
    assert(one.length == 1 && one(0).getLong(3) == 3L)
  }

  test("stream chunking equals batch chunking per micro-batch") {
    val spark = this.spark
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val docs = Seq((1L, (1 to 50).map(i => s"w$i").mkString(" ")),
      (2L, "only three words"))
    val expect = graft.operators.TextOps.textChunk(docs.toDF("doc_id", "text"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(4))).toSet
    val got = scala.collection.mutable.Set[(Long, Long, String)]()
    val mem = MemoryStream[(Long, String)]
    val q = graft.operators.TextOps
      .chunkStream(mem.toDF().toDF("doc_id", "text"))
      .writeStream.foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        b.collect().foreach(r => got += ((r.getLong(0), r.getLong(1), r.getString(4))))
      }
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("graft-chunk-ck").toString)
      .start()
    try {
      mem.addData(docs: _*)
      q.processAllAvailable()
    } finally q.stop()
    assert(got.toSet == expect, s"stream $got vs batch $expect")
  }

  test("chunk dedup flags shared boilerplate blocks, not unique text") {
    val spark = this.spark
    import spark.implicits._
    // 32-token boilerplate block shared verbatim by docs 1 and 2,
    // aligned at chunk 0; doc 3 is entirely unique
    val boiler = (1 to 32).map(i => s"nav$i").mkString(" ")
    val docs = Seq(
      (1L, boiler + " " + (1 to 16).map(i => s"a$i").mkString(" ")),
      (2L, boiler + " " + (1 to 16).map(i => s"b$i").mkString(" ")),
      (3L, (1 to 48).map(i => s"c$i").mkString(" ")))
      .toDF("doc_id", "text")
    val out = graft.operators.TextOps.dedupChunkExact(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(out(1L)._2 == 1L && out(2L)._2 == 1L,
      s"the shared chunk-0 block must flag in both docs: $out")
    assert(out(3L) == ((2L, 0L, 0L)), s"unique doc stays clean: $out")
  }

  test("keyed sample: exactly min(k, n) per key, deterministic") {
    val spark = this.spark
    import spark.implicits._
    val events = ((0 until 10).map(i => (1L, 100L + i)) ++
      Seq((2L, 200L), (2L, 201L)))
      .toDF("user_id", "event_id")
    val out = ScaleOps.sampleKeyed(events, k = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.count(_._1 == 1L) == 3 && out.count(_._1 == 2L) == 2)
    assert(out.filter(_._1 == 1L).map(_._2).toSeq == Seq(1L, 2L, 3L))
    val again = ScaleOps.sampleKeyed(events, k = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq == again.toSeq, "hash-ranked sample must be stable")
  }
}
