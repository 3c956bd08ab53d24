package graft

import java.sql.Timestamp
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.streaming.Streams

/** The streaming hot-key knob (r9 verdict missing #2): a planted hot
  * key routes to "salt" through the SAME preflight the batch windows
  * use, and the salted streaming face — bucket-keyed session state +
  * watermark-finalized local sessions + the shared batch glue —
  * reproduces q32's single-window sessionization exactly, including
  * sessions that SPAN a bucket boundary. */
class StreamSaltedSessionSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("statePreflight flags a planted hot state key and clears a uniform one") {
    val spark = this.spark
    import spark.implicits._
    // 100x hot key 7 against a uniform background
    val hot = ((1 to 2000).map(_ => 7L) ++ (1 to 200).map(i => 100L + i % 20))
      .toDF("user_id")
    val v1 = Streams.statePreflight(hot, "user_id", hotThreshold = 1000L)
      .select(col("advice")).head().getString(0)
    assert(v1 == "salt", "a key holding 100x the mean state must route to salt")
    val uniform = (1 to 2000).map(i => (i % 50).toLong).toDF("user_id")
    val v2 = Streams.statePreflight(uniform, "user_id", hotThreshold = 1000L)
      .select(col("advice")).head().getString(0)
    assert(v2 == "window", "uniform state keys keep the one-stage face")
  }

  test("salted streaming sessions + batch glue equal the single-window batch sessionization") {
    val spark = this.spark
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext

    // bucketMinutes = 60 so the data exercises multiple buckets.
    // user 1: a session SPANNING the 11:00 bucket edge (10:55 -> 11:05,
    //   10-min gap < 30) — the glue must merge the two local halves;
    // user 1: a second, separate session at 13:00;
    // user 2 (the hot key): 40 events over 3 buckets, gaps < 30m inside
    //   each run, one > 30m break — two true sessions, several local rows;
    // user 3: single event (the degenerate session).
    val u1 = Seq("10:00:00", "10:20:00", "10:55:00", "11:05:00", "13:00:00")
      .map(t => (1L, ts(s"2024-01-01 $t")))
    val u2run1 = (0 until 30).map(i => (2L, ts(f"2024-01-01 ${10 + i / 12}%02d:${(i % 12) * 5}%02d:00")))
    val u2run2 = (0 until 10).map(i => (2L, ts(f"2024-01-01 ${16 + i / 12}%02d:${(i % 12) * 5}%02d:00")))
    val u3 = Seq((3L, ts("2024-01-01 10:07:00")))
    val rows = u1 ++ u2run1 ++ u2run2 ++ u3

    val mem = MemoryStream[(Long, Timestamp)]
    val events = mem.toDF().toDF("user_id", "ts")
    val q = Streams.sessionizeStreamingSalted(events, gapMinutes = 30,
        bucketMinutes = 60, lateness = "5 minutes")
      .writeStream.format("memory").queryName("salted_sessions")
      .outputMode("append").start()
    try {
      mem.addData(rows: _*)
      q.processAllAvailable()
      // watermark sentinel: one far-future event (user 99) finalizes
      // every real session's state; its own session never emits
      mem.addData((99L, ts("2024-01-03 00:00:00")))
      q.processAllAvailable()
      mem.addData((99L, ts("2024-01-04 00:00:00")))
      q.processAllAvailable()
    } finally q.stop()

    val local = spark.table("salted_sessions").filter(col("user_id") =!= 99L)
    // hot key's local rows spread across buckets: more than one state
    // group carried user 2 (the parallelism the salt buys)
    assert(local.filter(col("user_id") === 2L).select(col("bkt")).distinct().count() >= 3,
      "hot key's state must spread across time buckets")
    // the boundary-spanning session arrives as two local halves:
    // {10:00,10:20}, {10:55}, {11:05}, {13:00} (10:20->10:55 is a real
    // 35-min break; 10:55->11:05 spans the 11:00 bucket edge)
    assert(local.filter(col("user_id") === 1L).count() == 4,
      "user 1: spanning session split at the bucket edge into two local rows")

    val glued = graft.operators.ScaleOps.glueLocalSessions(local, gapMinutes = 30)
      .select(col("user_id"), col("session_seq"), col("n_events"),
        col("start_us"), col("end_us"))
      .collect().map(_.toString).sorted.toSeq

    // ground truth: the batch single-window face over the same rows
    val batch = {
      import org.apache.spark.sql.expressions.Window
      val byU = Window.partitionBy(col("user_id")).orderBy(col("us"))
      rows.toDF("user_id", "ts")
        .select(col("user_id"), unix_micros(col("ts")).as("us"))
        .withColumn("prev", lag(col("us"), 1).over(byU))
        .withColumn("new_s", when(col("prev").isNull ||
          col("us") - col("prev") > 30L * 60L * 1000000L, 1L).otherwise(0L))
        .withColumn("session_seq", sum(col("new_s")).over(byU))
        .groupBy(col("user_id"), col("session_seq"))
        .agg(count(lit(1)).as("n_events"), min(col("us")).as("start_us"),
          max(col("us")).as("end_us"))
        .select(col("user_id"), col("session_seq"), col("n_events"),
          col("start_us"), col("end_us"))
        .collect().map(_.toString).sorted.toSeq
    }
    assert(glued == batch,
      s"salted stream + glue must equal the single-window sessionization:\n" +
        s"got   $glued\nwant $batch")
  }
}
