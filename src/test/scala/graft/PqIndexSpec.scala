package graft

import org.scalatest.funsuite.AnyFunSuite

/** The stored-IVFPQ lifecycle (Ann.buildPqIndex / ensurePqIndex /
  * annPqProbe / pqAppendStream / compactIvfDeltas(table="codes")):
  * build-once reuse, torn-build recovery, probe ≡ the self-contained
  * annIvfPq face, delta visibility before compaction, and codes-table
  * compaction invariance. */
class PqIndexSpec extends AnyFunSuite {

  private def corpus(seed: Int, n: Int = 200) = {
    val rnd = new scala.util.Random(seed)
    val centers = Array.tabulate(4)(c => Array.tabulate(64)(j =>
      if (j % 4 == c) 10f else 0f))
    (0 until n).map { i =>
      (i.toLong, centers(i % 4).map(x => x + 0.5f * rnd.nextGaussian().toFloat))
    }
  }

  test("probe over a fresh index hash-equals the self-contained annIvfPq; ensure builds once; torn build rebuilds") {
    val spark = TestSpark.spark
    import spark.implicits._
    val df = corpus(29).toDF("vec_id", "embedding")
    val dir = java.nio.file.Files.createTempDirectory("graft-pqidx").toString
    graft.operators.Ann.ensurePqIndex(df, dir)
    assert(new java.io.File(s"$dir/centroids/_SUCCESS").exists(),
      "centroids _SUCCESS is the completed-build sentinel")

    val self = graft.operators.Ann.annIvfPq(df, k = 3, stride = 20)
      .collect().toSeq.map(_.toString)
    val probe = graft.operators.Ann.annPqProbe(df, dir, k = 3, stride = 20)
      .collect().toSeq.map(_.toString)
    assert(probe == self,
      "stored-index probe must be bit-identical to the self-contained face")

    // build-once: a marker planted INSIDE the codes table survives a
    // second ensure call (a rebuild's overwrite would delete it)
    val marker = new java.io.File(s"$dir/codes/graft-spec-marker")
    assert(marker.createNewFile())
    graft.operators.Ann.ensurePqIndex(df, dir)
    assert(marker.exists(), "a completed build must not be rebuilt")

    // torn build: no centroids sentinel → the whole index rewrites
    def deleteRec(f: java.io.File): Unit = if (f.exists()) {
      Option(f.listFiles()).toSeq.flatten.foreach(deleteRec); f.delete()
    }
    deleteRec(new java.io.File(s"$dir/centroids"))
    graft.operators.Ann.ensurePqIndex(df, dir)
    assert(!marker.exists(), "a torn build (missing sentinel) must rebuild")
    assert(new java.io.File(s"$dir/centroids/_SUCCESS").exists())
    val probe2 = graft.operators.Ann.annPqProbe(df, dir, k = 3, stride = 20)
      .collect().toSeq.map(_.toString)
    assert(probe2 == self, "the rebuilt index serves the same answers")
  }

  test("defaultPqIndexDir keys on dim: same corpus at a different dim resolves to a different directory") {
    val spark = TestSpark.spark
    import spark.implicits._
    val df = corpus(31).toDF("vec_id", "embedding")
    val d64 = graft.operators.Ann.defaultPqIndexDir(df, "spec", dim = 64)
    val d32 = graft.operators.Ann.defaultPqIndexDir(df, "spec", dim = 32)
    assert(d64 != d32, "dim changes stored content, so it must change the key")
  }

  test("pqAppendStream deltas are probe-visible before compaction; compactIvfDeltas(codes) folds them losslessly") {
    val spark = TestSpark.spark
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val rows = corpus(37)
    val df = rows.toDF("vec_id", "embedding")
    val dir = java.nio.file.Files.createTempDirectory("graft-pqappend").toString
    graft.operators.Ann.ensurePqIndex(df, dir)

    // append an exact copy of query vector 0 (stride=20 ⇒ q_id 0 is a
    // query) under a fresh vec_id: it quantizes to the same codes as
    // the cluster's best members (tied ADC), and the NEGATIVE id wins
    // the ascending vec_id tie-break, so it must surface at rank 1
    val dupId = -1L
    val mem = MemoryStream[(Long, Array[Float])]
    val q = graft.operators.Ann
      .pqAppendStream(mem.toDF().toDF("vec_id", "embedding"), dir)
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("graft-pqappend-ck").toString)
      .start()
    try {
      mem.addData((dupId, rows(0)._2))
      q.processAllAvailable()
    } finally q.stop()
    assert(new java.io.File(s"$dir/delta-b0/_SUCCESS").exists())

    // BEFORE compaction: the un-compacted delta must already serve
    val pre = graft.operators.Ann.annPqProbe(df, dir, k = 5, stride = 20)
      .collect().toSeq
    assert(pre.exists(r => r.getLong(0) == 0L && r.getLong(1) == dupId),
      s"appended vector must be probe-visible before compaction: " +
        pre.filter(_.getLong(0) == 0L).mkString(", "))

    // compaction folds the delta into the base codes table and the
    // probe answers do not change
    val folded = graft.operators.Ann.compactIvfDeltas(spark, dir, "codes")
    assert(folded == 1, s"one delta epoch to fold, got $folded")
    assert(!new java.io.File(s"$dir/delta-b0").exists(),
      "folded deltas are removed")
    val post = graft.operators.Ann.annPqProbe(df, dir, k = 5, stride = 20)
      .collect().toSeq
    assert(post.map(_.toString) == pre.map(_.toString),
      "probe answers are invariant under codes compaction")
  }
}
