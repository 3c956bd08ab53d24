package graft

import org.scalatest.funsuite.AnyFunSuite

/** IVF delta compaction: probe results are bit-identical before and
  * after folding delta epochs into the base lists, read amplification
  * drops to one table, and a torn swap rolls forward. */
class CompactionSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def freshIndex(): (org.apache.spark.sql.DataFrame, String) = {
    val spark = this.spark
    import spark.implicits._
    val rnd = new scala.util.Random(31)
    val corpus = (0 until 200).map(i =>
      (i.toLong, Array.fill(64)((rnd.nextGaussian() * 0.3).toFloat)))
    val dir = java.nio.file.Files.createTempDirectory("graft-compact").toString
    graft.operators.Ann.ensureIvfIndex(corpus.toDF("vec_id", "embedding"), dir)
    // two delta epochs, written in the ivfAppendStream layout
    val cents = spark.read.parquet(s"$dir/centroids")
    (0 until 2).foreach { b =>
      val batch = (0 until 10).map(i =>
        ((1000 + b * 10 + i).toLong, corpus(b * 10 + i)._2))
        .toDF("vec_id", "embedding")
      graft.operators.Ann.assignToCentroids(batch, cents)
        .write.partitionBy("list_id").mode("overwrite")
        .parquet(s"$dir/delta-b$b")
    }
    val probes = (0 until 5).map(i => (9000L + i, corpus(i * 7)._2))
      .toDF("q_id", "q_vec")
    (probes, dir)
  }

  test("compaction preserves probe results exactly and removes deltas") {
    val (probes, dir) = freshIndex()
    val before = graft.operators.Ann.ivfProbeQueries(probes, dir, k = 5)
      .collect().toSeq
    val folded = graft.operators.Ann.compactIvfDeltas(spark, dir)
    assert(folded == 2)
    val after = graft.operators.Ann.ivfProbeQueries(probes, dir, k = 5)
      .collect().toSeq
    assert(before == after, "compaction must not change any probe result")
    assert(!new java.io.File(s"$dir/delta-b0").exists() &&
      !new java.io.File(s"$dir/delta-b1").exists(),
      "folded deltas must be removed")
    assert(!new java.io.File(s"$dir/lists/_FOLDED").exists())
    assert(graft.operators.Ann.compactIvfDeltas(spark, dir) == 0,
      "nothing left to fold")
  }

  test("a torn swap rolls forward on the next call") {
    val (probes, dir) = freshIndex()
    val before = graft.operators.Ann.ivfProbeQueries(probes, dir, k = 5)
      .collect().toSeq
    // simulate the crash window between the two phase-2 renames: the
    // merged table is complete (sentinel present) but `lists` is gone
    val deltas = Seq("delta-b0", "delta-b1")
    val merged = deltas.map(d => spark.read.parquet(s"$dir/$d"))
      .foldLeft(spark.read.parquet(s"$dir/lists"))(_ unionByName _)
    merged.write.partitionBy("list_id").mode("overwrite")
      .parquet(s"$dir/lists-compacting")
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$dir/lists-compacting/_FOLDED"),
      deltas.mkString("\n").getBytes("UTF-8"))
    assert(new java.io.File(s"$dir/lists")
      .renameTo(new java.io.File(s"$dir/lists-old")))
    // crash "here": next compaction entry must recover to a readable,
    // delta-free index with identical probe results
    assert(graft.operators.Ann.compactIvfDeltas(spark, dir) == 0)
    val after = graft.operators.Ann.ivfProbeQueries(probes, dir, k = 5)
      .collect().toSeq
    assert(before == after, "roll-forward must serve the same results")
    assert(!new java.io.File(s"$dir/delta-b0").exists() &&
      !new java.io.File(s"$dir/lists-old").exists())
  }
}
