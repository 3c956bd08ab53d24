package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.{AsofInput, Streams}

/** Streaming as-of enrichment: carried state across micro-batches,
  * inclusive at-or-before with id tie-breaks inside a batch, and the
  * never-regress rule for late events. */
class AsofStreamSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("probes enrich from carried state; late events never regress it") {
    val spark = this.spark
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[AsofInput]
    val out = scala.collection.mutable.Map.empty[Long, Seq[graft.streaming.AsofEnriched]]
    val q = Streams.asofStream(mem.toDS())
      .writeStream.outputMode("append")
      .foreachBatch {
        (df: org.apache.spark.sql.Dataset[graft.streaming.AsofEnriched], id: Long) =>
          out(id) = df.collect().toSeq
      }
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("graft-asof-ck").toString)
      .start()
    try {
      // batch 0: event@10(id1,A), equal-instant event@20 pair (id2 B /
      // id3 C), probe@5 (before anything), probe@20 (inclusive, C wins)
      mem.addData(
        AsofInput(1L, 10L, isProbe = false, 1L, "A"),
        AsofInput(1L, 20L, isProbe = false, 2L, "B"),
        AsofInput(1L, 20L, isProbe = false, 3L, "C"),
        AsofInput(1L, 5L, isProbe = true, 101L, ""),
        AsofInput(1L, 20L, isProbe = true, 102L, ""))
      q.processAllAvailable()
      // batch 1: probe@30 uses CARRIED state; a LATE event@15 must not
      // displace the newer state for the probe@40 that follows
      mem.addData(
        AsofInput(1L, 30L, isProbe = true, 103L, ""),
        AsofInput(1L, 15L, isProbe = false, 9L, "LATE"),
        AsofInput(1L, 40L, isProbe = true, 104L, ""))
      q.processAllAvailable()
    } finally q.stop()
    val b0 = out(0L).map(e => e.probe_id -> e).toMap
    assert(b0(101L).last_event_id.isEmpty, "probe before any event -> None")
    assert(b0(102L).last_event_id.contains(3L) &&
      b0(102L).last_event_type.contains("C") &&
      b0(102L).staleness_us.contains(0L),
      s"inclusive at-or-before with id tie-break: ${b0(102L)}")
    val b1 = out(1L).map(e => e.probe_id -> e).toMap
    assert(b1(103L).last_event_id.contains(3L) &&
      b1(103L).staleness_us.contains(10L), s"carried state: ${b1(103L)}")
    assert(b1(104L).last_event_id.contains(3L),
      s"late event must not regress the carried state: ${b1(104L)}")
  }
}
