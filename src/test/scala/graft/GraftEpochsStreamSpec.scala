package graft

import org.scalatest.funsuite.AnyFunSuite

/** The graft-epochs-stream Structured Streaming source: each new
  * COMPLETED epoch arrives as a micro-batch (torn epochs invisible
  * until their sentinel lands), offsets are compacted {hw, holes}
  * sequence ranges (so batchId-keyed names that don't sort
  * lexicographically still deliver while checkpoint offsets stay
  * O(in-flight), not O(#epochs)), and the checkpointed offset log
  * gives exactly-once per epoch across restarts. */
class GraftEpochsStreamSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def freshDir(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft-estream-$tag").toString

  test("new completed epochs arrive as micro-batches; torn epochs stay invisible until committed; range offsets beat name order") {
    val s = spark
    import s.implicits._
    val dir = freshDir("arrive")
    val chk = freshDir("arrive-chk")
    Seq((1L, "a")).toDF("id", "v").write.parquet(s"$dir/delta-b0")
    Seq((2L, "b")).toDF("id", "v").write.parquet(s"$dir/delta-b1")

    val seen = scala.collection.mutable.ArrayBuffer.empty[(Long, String)]
    val batches = scala.collection.mutable.ArrayBuffer.empty[Int]
    def startQuery() = s.readStream.format("graft-epochs-stream")
      .option("path", dir).load()
      .writeStream.option("checkpointLocation", chk)
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        val rows = b.collect().map(r => (r.getLong(0), r.getString(1)))
        seen.synchronized { seen ++= rows; batches += rows.length }
        ()
      }.start()

    val q = startQuery()
    try {
      q.processAllAvailable()
      assert(seen.toSet == Set((1L, "a"), (2L, "b")),
        s"initial epochs delivered: $seen")

      // torn epoch: data but no sentinel -> NOT delivered. Stage the
      // torn state OUTSIDE the family and move it in atomically — the
      // stream polls continuously, so tearing an epoch in place would
      // race its completed window
      val stage = freshDir("stage")
      Seq((9L, "torn")).toDF("id", "v").write.parquet(s"$stage/delta-b2")
      assert(new java.io.File(s"$stage/delta-b2/_SUCCESS").delete())
      assert(new java.io.File(s"$stage/delta-b2")
        .renameTo(new java.io.File(s"$dir/delta-b2")))
      val sentinel = new java.io.File(s"$dir/delta-b2/_SUCCESS")
      q.processAllAvailable()
      assert(!seen.exists(_._1 == 9L), "torn epoch must be invisible")

      // delta-b10 sorts BEFORE delta-b2 lexicographically — a
      // max-name watermark would wedge; set offsets deliver it
      Seq((10L, "j")).toDF("id", "v").write.parquet(s"$dir/delta-b10")
      q.processAllAvailable()
      assert(seen.exists(_._1 == 10L), s"delta-b10 delivered: $seen")

      // the torn epoch completes (sentinel lands) -> delivered now
      assert(sentinel.createNewFile())
      q.processAllAvailable()
      assert(seen.exists(_._1 == 9L), s"completed epoch delivered: $seen")
      assert(seen.size == 4, s"each epoch exactly once: $seen")
    } finally q.stop()

    // restart on the same checkpoint: nothing redelivered, only the
    // epoch written while the stream was down
    Seq((11L, "k")).toDF("id", "v").write.parquet(s"$dir/delta-b11")
    val q2 = startQuery()
    try {
      q2.processAllAvailable()
      assert(seen.size == 5 && seen.exists(_._1 == 11L),
        s"restart delivers only the new epoch: $seen")
    } finally q2.stop()
  }

  test("Trigger.AvailableNow drains the family to a fixed point and terminates") {
    val s = spark
    import s.implicits._
    val dir = freshDir("avnow")
    val chk = freshDir("avnow-chk")
    Seq((1L, "a")).toDF("id", "v").write.parquet(s"$dir/delta-b0")
    Seq((2L, "b")).toDF("id", "v").write.parquet(s"$dir/delta-b1")
    val got = scala.collection.mutable.ArrayBuffer.empty[Long]
    val q = s.readStream.format("graft-epochs-stream")
      .option("path", dir).load()
      .writeStream.option("checkpointLocation", chk)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        got.synchronized { got ++= b.collect().map(_.getLong(0)) }
        ()
      }.start()
    assert(q.awaitTermination(120000), "AvailableNow must terminate")
    assert(got.toSet == Set(1L, 2L), s"drained both epochs: $got")
  }

  test("composition: a living CMS delta family streams through the source and folds to exactly the merged sketch") {
    val s = spark
    import s.implicits._
    import graft.operators.ScaleOps
    val dir = freshDir("cms")
    val chk = freshDir("cms-chk")
    val all = (1L to 300L).map(i => (i, i % 37))
    val (part1, rest) = all.splitAt(100)
    val (part2, part3) = rest.splitAt(100)
    def writeDelta(rows: Seq[(Long, Long)], b: Int): Unit =
      ScaleOps.countMinTable(rows.toDF("event_id", "user_id"))
        .write.parquet(s"$dir/delta-b$b")
    writeDelta(part1, 0); writeDelta(part2, 1)
    // downstream maintains a running cell-wise fold of arriving deltas
    val folded = scala.collection.mutable.Map.empty[(Int, Long), Long]
    val q = s.readStream.format("graft-epochs-stream")
      .option("path", dir).load()
      .writeStream.option("checkpointLocation", chk)
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        b.collect().foreach { r =>
          val k = (r.getInt(0), r.getLong(1))
          folded.synchronized {
            folded(k) = folded.getOrElse(k, 0L) + r.getLong(2)
          }
        }
        ()
      }.start()
    try {
      q.processAllAvailable()
      writeDelta(part3, 2) // a new ingest epoch lands mid-stream
      q.processAllAvailable()
    } finally q.stop()
    // the streamed fold IS the merged sketch IS the whole-corpus sketch
    val merged = ScaleOps.countMinMerged(s, dir).collect()
      .map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    val whole = ScaleOps.countMinTable(all.toDF("event_id", "user_id"))
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(folded.toMap == merged && merged == whole,
      "stream fold == merged face == whole-corpus sketch")
  }

  test("partitioned multi-table family: one epoch per micro-batch, completeness over all subtables, both children streamable") {
    val s = spark
    import s.implicits._
    import graft.operators.TextOps
    val dir = freshDir("subt")
    val chk = freshDir("subt-chk")
    val b0 = Seq((1L, "alpha beta gamma"), (2L, "alpha beta end"))
    val b1 = Seq((3L, "gamma delta alpha"), (4L, "beta beta beta"))
    TextOps.posIndexIngest(b0.toDF("doc_id", "text"), dir, 0L, nBuckets = 8)
    TextOps.posIndexIngest(b1.toDF("doc_id", "text"), dir, 1L, nBuckets = 8)
    // torn epoch: postings committed, stats (the sentinel child) not
    TextOps.posIndexIngest(Seq((9L, "torn epoch text")).toDF("doc_id", "text"),
      dir, 2L, nBuckets = 8)
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(s.sessionState.newHadoopConf())
    // tear it: remove the stats sentinel AFTER the fact
    assert(fs.delete(new org.apache.hadoop.fs.Path(s"$dir/delta-b2/stats/_SUCCESS"), false))

    val batchDocSets = scala.collection.mutable.ArrayBuffer.empty[Set[Long]]
    val q = s.readStream.format("graft-epochs-stream")
      .option("path", dir)
      .option("subtables", "postings,stats2,stats3,stats4,stats")
      .option("read", "postings")
      .load()
      .writeStream.option("checkpointLocation", chk)
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        val docs = b.collect().map(_.getAs[Long]("doc_id")).toSet
        batchDocSets.synchronized { if (docs.nonEmpty) batchDocSets += docs }
        ()
      }.start()
    try q.processAllAvailable() finally q.stop()
    // one epoch per micro-batch: each non-empty batch's docs belong to
    // exactly one ingest epoch, and the torn epoch never arrives
    assert(batchDocSets.size == 2, s"one batch per epoch: $batchDocSets")
    assert(batchDocSets.toSet == Set(Set(1L, 2L), Set(3L, 4L)),
      s"epoch-grain batches: $batchDocSets")
    // the OTHER child streams too: stats rows fold to the merged stats
    val statsSeen = scala.collection.mutable.Map.empty[String, Long]
    val q2 = s.readStream.format("graft-epochs-stream")
      .option("path", dir)
      .option("subtables", "postings,stats2,stats3,stats4,stats")
      .option("read", "stats")
      .load()
      .writeStream.option("checkpointLocation", freshDir("subt-chk2"))
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        b.collect().foreach { r =>
          val t = r.getAs[String]("term")
          statsSeen.synchronized {
            statsSeen(t) = statsSeen.getOrElse(t, 0L) + r.getAs[Long]("n_occ")
          }
        }
        ()
      }.start()
    try q2.processAllAvailable() finally q2.stop()
    val merged = TextOps.posIndexMerged(s, dir)._2.collect()
      .map(r => r.getAs[String]("term") -> r.getAs[Long]("n_occ")).toMap
    assert(statsSeen.toMap == merged,
      s"streamed stats fold == merged stats: $statsSeen vs $merged")
  }

  test("offsets stay bounded on a many-epoch family: {hw, holes}, not a name list") {
    import graft.sources.EpochRangeOffset
    // 1000 contiguous delivered epochs -> constant-size offset
    val contiguous = EpochRangeOffset.advance(EpochRangeOffset.initial,
      (0L until 1000L).toSet)
    assert(contiguous == EpochRangeOffset(999L, Nil))
    assert(contiguous.json() == """{"hw":999,"holes":[]}""",
      s"offset JSON must not grow with epoch count: ${contiguous.json()}")
    // a torn epoch (1001) with a later arrival (1002) already landed
    val sparse = EpochRangeOffset.advance(contiguous,
      (0L until 1000L).toSet ++ Set(1000L, 1002L))
    assert(sparse == EpochRangeOffset(1002L, Seq(1001L)))
    // the late epoch completes: delivered exactly once, hole drains
    val drained = EpochRangeOffset.advance(sparse,
      (0L until 1003L).toSet)
    assert(drained == EpochRangeOffset(1002L, Nil))
    assert(EpochRangeOffset.fresh(sparse, drained) == Seq(1001L))
    assert(EpochRangeOffset.fresh(contiguous, sparse) == Seq(1000L, 1002L))
    // advance is idempotent at the fixed point (AvailableNow drains)
    assert(EpochRangeOffset.advance(drained, (0L until 1003L).toSet) == drained)
    // JSON round-trip, numbers only
    assert(EpochRangeOffset.fromJson(sparse.json()) == sparse)
    assert(EpochRangeOffset.fromJson(EpochRangeOffset.initial.json()) ==
      EpochRangeOffset.initial)
  }

  test("a fresh subscriber on an already-compacted family fails fast instead of missing folded rows") {
    val s = spark
    import s.implicits._
    val dir = freshDir("compacted")
    Seq((1L, "a")).toDF("id", "v").write.parquet(s"$dir/delta-b0")
    // simulate a compaction having folded earlier deltas into base/
    Seq((0L, "folded")).toDF("id", "v").write.parquet(s"$dir/base")
    val e = intercept[Exception] {
      s.readStream.format("graft-epochs-stream").option("path", dir).load()
    }
    assert(e.getMessage.contains("compacted base/"), e.getMessage)
  }

  test("a non-numeric epoch dir under the family fails the poll loudly, never corrupts offsets") {
    val s = spark
    import s.implicits._
    val dir = freshDir("badname")
    val chk = freshDir("badname-chk")
    Seq((1L, "a")).toDF("id", "v").write.parquet(s"$dir/delta-b0")
    Seq((2L, "x")).toDF("id", "v").write.parquet(s"$dir/delta-bOOPS")
    val q = s.readStream.format("graft-epochs-stream")
      .option("path", dir).load()
      .writeStream.option("checkpointLocation", chk)
      .format("noop").start()
    val e = intercept[Exception] {
      q.processAllAvailable()
      q.awaitTermination(30000)
      ()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil
      else String.valueOf(t.getMessage) +: messages(t.getCause)
    assert(messages(e).exists(_.contains("numeric epoch seqs")),
      s"expected the seq-validation error, got: ${messages(e)}")
    q.stop()
  }

  test("schema inference requires one completed epoch; explicit schema works on an empty family") {
    val s = spark
    val dir = freshDir("empty")
    val e = intercept[Exception] {
      s.readStream.format("graft-epochs-stream").option("path", dir).load()
    }
    assert(e.getMessage.contains("no completed epochs"))
    // explicit schema: the stream starts on an empty family and
    // delivers nothing until an epoch lands
    val df = s.readStream.format("graft-epochs-stream")
      .schema(org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("id",
          org.apache.spark.sql.types.LongType))))
      .option("path", dir).load()
    assert(df.isStreaming)
  }
}
