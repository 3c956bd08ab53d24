package graft

import org.scalatest.funsuite.AnyFunSuite

/** The stored binary-index lifecycle (Ann.buildBinaryIndex /
  * ensureBinaryIndex / annBinaryProbe / binaryAppendStream /
  * compactIvfDeltas(table="codes")): build-once reuse, torn-build
  * recovery, probe ≡ the self-contained annBinaryRerank face, delta
  * visibility before compaction, and codes-table compaction
  * invariance — the PqIndexSpec contract on the binary family. */
class BinaryIndexSpec extends AnyFunSuite {

  private def corpus(seed: Int, n: Int = 200) = {
    val rnd = new scala.util.Random(seed)
    val centers = Array.tabulate(4)(c => Array.tabulate(64)(j =>
      if (j % 4 == c) 10f else 0f))
    (0 until n).map { i =>
      (i.toLong, centers(i % 4).map(x => x + 0.5f * rnd.nextGaussian().toFloat))
    }
  }

  test("probe over a fresh index equals the self-contained face; ensure builds once; torn build rebuilds") {
    val spark = TestSpark.spark
    import spark.implicits._
    val df = corpus(41).toDF("vec_id", "embedding")
    val dir = java.nio.file.Files.createTempDirectory("graft-binidx").toString
    graft.operators.Ann.ensureBinaryIndex(df, dir)
    assert(new java.io.File(s"$dir/thresholds/_SUCCESS").exists(),
      "thresholds _SUCCESS is the completed-build sentinel")

    val self = graft.operators.Ann
      .annBinaryRerank(df, k = 3, stride = 20, shortlist = 60)
      .collect().toSeq.map(_.toString)
    val probe = graft.operators.Ann
      .annBinaryProbe(df, dir, k = 3, stride = 20, shortlist = 60)
      .collect().toSeq.map(_.toString)
    assert(probe == self,
      "stored-index probe must be bit-identical to the self-contained face")

    // build-once: a marker planted INSIDE the codes table survives a
    // second ensure call (a rebuild's overwrite would delete it)
    val marker = new java.io.File(s"$dir/codes/graft-spec-marker")
    assert(marker.createNewFile())
    graft.operators.Ann.ensureBinaryIndex(df, dir)
    assert(marker.exists(), "a completed build must not be rebuilt")

    // torn build: no thresholds sentinel → the whole index rewrites
    def deleteRec(f: java.io.File): Unit = if (f.exists()) {
      Option(f.listFiles()).toSeq.flatten.foreach(deleteRec); f.delete()
    }
    deleteRec(new java.io.File(s"$dir/thresholds"))
    graft.operators.Ann.ensureBinaryIndex(df, dir)
    assert(!marker.exists(), "a torn build (missing sentinel) must rebuild")
    val probe2 = graft.operators.Ann
      .annBinaryProbe(df, dir, k = 3, stride = 20, shortlist = 60)
      .collect().toSeq.map(_.toString)
    assert(probe2 == self, "the rebuilt index serves the same answers")
  }

  test("binaryAppendStream deltas are probe-visible before compaction; compactIvfDeltas(codes) folds them losslessly") {
    val spark = TestSpark.spark
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val rows = corpus(43)
    val df = rows.toDF("vec_id", "embedding")
    val dir = java.nio.file.Files.createTempDirectory("graft-binappend").toString
    graft.operators.Ann.ensureBinaryIndex(df, dir)

    // append an exact copy of query vector 0 under vec_id −1: Hamming
    // 0 to the query puts it in every shortlist, the exact-cosine-1
    // rerank puts it at rank 1 (no other exact duplicate exists)
    val dupId = -1L
    val mem = MemoryStream[(Long, Array[Float])]
    val q = graft.operators.Ann
      .binaryAppendStream(mem.toDF().toDF("vec_id", "embedding"), dir)
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("graft-binappend-ck").toString)
      .start()
    try {
      mem.addData((dupId, rows(0)._2))
      q.processAllAvailable()
    } finally q.stop()
    assert(new java.io.File(s"$dir/delta-b0/_SUCCESS").exists())

    // the corpus passed to the probe must contain the appended vector
    // too (it is the rerank's float source)
    val withDup = df.unionByName(Seq((dupId, rows(0)._2)).toDF("vec_id", "embedding"))
    val pre = graft.operators.Ann
      .annBinaryProbe(withDup, dir, k = 5, stride = 20, shortlist = 60)
      .collect().toSeq
    assert(pre.exists(r => r.getLong(0) == 0L && r.getLong(1) == dupId &&
        r.getLong(3) == 1L),
      s"appended duplicate must be probe-visible at rank 1 before compaction: " +
        pre.filter(_.getLong(0) == 0L).mkString(", "))

    val folded = graft.operators.Ann.compactIvfDeltas(spark, dir, "codes")
    assert(folded == 1, s"one delta epoch to fold, got $folded")
    assert(!new java.io.File(s"$dir/delta-b0").exists(), "folded deltas are removed")
    val post = graft.operators.Ann
      .annBinaryProbe(withDup, dir, k = 5, stride = 20, shortlist = 60)
      .collect().toSeq
    assert(post.map(_.toString) == pre.map(_.toString),
      "probe answers are invariant under codes compaction")
  }
}
