package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** The stored-artifact layer must resolve paths through the Hadoop
  * FileSystem API (r9 verdict headline): on a cluster the artifact
  * root is `hdfs://`/`s3a://`, and a `java.io.File` sentinel check
  * would read the driver's LOCAL disk while the build lands on the
  * cluster FS — stored faces would rebuild per query and the delta
  * listers would see zero epochs. Proven here by driving full
  * lifecycles through SCHEME-QUALIFIED `file://` URIs (which
  * `java.io.File` cannot open — `/file:/tmp/...` does not exist), so
  * every sentinel check, epoch list, manifest and compaction rename
  * demonstrably goes through the FS indirection. */
class StoredArtifactsFsSpec extends AnyFunSuite {

  private def corpus(seed: Int, n: Int = 200) = {
    val rnd = new scala.util.Random(seed)
    val centers = Array.tabulate(4)(c => Array.tabulate(64)(j =>
      if (j % 4 == c) 10f else 0f))
    (0 until n).map { i =>
      (i.toLong, centers(i % 4).map(x => x + 0.5f * rnd.nextGaussian().toFloat))
    }
  }

  /** A scheme-qualified file URI for a fresh temp dir. */
  private def fileUri(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toUri.toString
      .stripSuffix("/") // file:///tmp/xyz

  /** The local-disk view of a `file://` URI (spec-side assertions). */
  private def local(uri: String): java.io.File =
    new java.io.File(new java.net.URI(uri))

  test("build-once / torn-build / probe lifecycle works through a file:// URI") {
    val spark = TestSpark.spark
    import spark.implicits._
    val df = corpus(71).toDF("vec_id", "embedding")
    val dir = fileUri("graft-fsuri-bin")
    assert(dir.startsWith("file:///"), s"URI form expected, got $dir")

    Ann.ensureBinaryIndex(df, dir)
    assert(new java.io.File(local(dir), "thresholds/_SUCCESS").exists(),
      "build landed where the URI points")

    val self = Ann.annBinaryRerank(df, k = 3, stride = 20, shortlist = 60)
      .collect().toSeq.map(_.toString)
    val probe = Ann.annBinaryProbe(df, dir, k = 3, stride = 20, shortlist = 60)
      .collect().toSeq.map(_.toString)
    assert(probe == self, "probe through the URI equals the self-contained face")

    // build-once THROUGH THE URI: a marker inside the codes table
    // survives a second ensure (a rebuild's overwrite would delete it).
    // Under java.io.File semantics the sentinel probe on the URI string
    // would miss and force a rebuild — exactly the r9 cluster bug.
    val marker = new java.io.File(local(dir), "codes/graft-spec-marker")
    assert(marker.createNewFile())
    Ann.ensureBinaryIndex(df, dir)
    assert(marker.exists(),
      "completed build behind a file:// URI must not be rebuilt")

    // torn build: removing the sentinel table forces a rewrite
    def deleteRec(f: java.io.File): Unit = if (f.exists()) {
      Option(f.listFiles()).toSeq.flatten.foreach(deleteRec); f.delete()
    }
    deleteRec(new java.io.File(local(dir), "thresholds"))
    Ann.ensureBinaryIndex(df, dir)
    assert(!marker.exists(), "torn build behind a URI must rebuild")
  }

  test("stream deltas + compaction (rename/manifest/delete) work through a file:// URI") {
    val spark = TestSpark.spark
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val rows = corpus(73)
    val df = rows.toDF("vec_id", "embedding")
    val dir = fileUri("graft-fsuri-append")
    Ann.ensureBinaryIndex(df, dir)

    val dupId = -1L
    val mem = MemoryStream[(Long, Array[Float])]
    val q = Ann.binaryAppendStream(mem.toDF().toDF("vec_id", "embedding"), dir)
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("graft-fsuri-ck").toString)
      .start()
    try {
      mem.addData((dupId, rows(0)._2))
      q.processAllAvailable()
    } finally q.stop()
    assert(new java.io.File(local(dir), "delta-b0/_SUCCESS").exists())

    val withDup = df.unionByName(Seq((dupId, rows(0)._2)).toDF("vec_id", "embedding"))
    val pre = Ann.annBinaryProbe(withDup, dir, k = 5, stride = 20, shortlist = 60)
      .collect().toSeq
    assert(pre.exists(r => r.getLong(0) == 0L && r.getLong(1) == dupId &&
      r.getLong(3) == 1L),
      "appended delta behind a file:// URI must be probe-visible")

    val folded = Ann.compactIvfDeltas(spark, dir, "codes")
    assert(folded == 1, s"one epoch to fold, got $folded")
    assert(!new java.io.File(local(dir), "delta-b0").exists(),
      "manifest-driven delta cleanup works through the FS API")
    assert(!new java.io.File(local(dir), "codes-old").exists())
    assert(!new java.io.File(local(dir), "codes/_FOLDED").exists())
    val post = Ann.annBinaryProbe(withDup, dir, k = 5, stride = 20, shortlist = 60)
      .collect().toSeq
    assert(post.map(_.toString) == pre.map(_.toString),
      "probe answers invariant under URI-addressed compaction")
  }

  test("listEpochs: missing dir is zero epochs; torn and empty epochs invisible; exclude and subTables honored") {
    val spark = TestSpark.spark
    import spark.implicits._
    val dir = fileUri("graft-fsuri-epochs")
    assert(StoredArtifacts.listEpochs(spark, s"$dir/never-written") == Nil,
      "a dir no stream has written yet lists as zero epochs, not an error")

    val two = Seq((1L, "a"), (2L, "b")).toDF("id", "v")
    two.write.parquet(s"$dir/delta-b0")
    two.write.parquet(s"$dir/delta-b1")
    // torn epoch: data file but no _SUCCESS sentinel
    two.write.parquet(s"$dir/delta-b2")
    assert(new java.io.File(local(dir), "delta-b2/_SUCCESS").delete())
    // sentinel but no data files (zero-row write shape)
    val empty = new java.io.File(local(dir), "delta-b3")
    assert(empty.mkdirs())
    assert(new java.io.File(empty, "_SUCCESS").createNewFile())

    val listed = StoredArtifacts.listEpochs(spark, dir)
    assert(listed.map(p => new org.apache.hadoop.fs.Path(p).getName) ==
      Seq("delta-b0", "delta-b1"),
      s"torn (no sentinel) and empty (no parquet) epochs are invisible: $listed")
    assert(listed.forall(_.startsWith("file:")),
      "listed epochs are fully qualified URIs ready for spark.read")

    assert(StoredArtifacts
      .listEpochs(spark, dir, exclude = Set("delta-b1"))
      .map(p => new org.apache.hadoop.fs.Path(p).getName) == Seq("delta-b0"),
      "own-epoch exclusion (stream replay safety) is honored")

    // subTables: an epoch is readable only when EVERY named child is
    two.write.parquet(s"$dir/multi/delta-b0/stats")
    two.write.parquet(s"$dir/multi/delta-b0/regs")
    two.write.parquet(s"$dir/multi/delta-b1/stats") // regs missing
    assert(StoredArtifacts
      .listEpochs(spark, s"$dir/multi", subTables = Seq("stats", "regs"))
      .map(p => new org.apache.hadoop.fs.Path(p).getName) == Seq("delta-b0"))
  }

  test("graft.artifacts.root conf redirects content-keyed dirs (the cluster deployment knob)") {
    val spark = TestSpark.spark
    import spark.implicits._
    val root = fileUri("graft-fsuri-root")
    spark.conf.set("graft.artifacts.root", root)
    try {
      val d = StoredArtifacts.contentKeyedDir("graft-fs-family",
        Seq(1L, 2L, 3L).toDF("id"), "sfX", "-p1")
      assert(d.startsWith(s"$root/graft-fs-family/"),
        s"content-keyed dir must live under the configured root: $d")
      // and the ensure/build cycle works against that URI-rooted dir
      var built = 0
      StoredArtifacts.ensureBuilt(spark, d, "t") {
        built += 1
        Seq((1L, "x")).toDF("id", "v").write.mode("overwrite").parquet(s"$d/t")
      }
      StoredArtifacts.ensureBuilt(spark, d, "t")(built += 1)
      assert(built == 1, "second ensure must see the URI-rooted sentinel")
    } finally spark.conf.unset("graft.artifacts.root")
  }

  test("fingerprint stamps live and resolve through scheme-qualified file:// URIs") {
    val spark = TestSpark.spark
    import spark.implicits._
    val root = fileUri("graft-fsuri-stamps")
    val data = fileUri("graft-fsuri-src") + "/docs.parquet"
    (0L until 150L).map(i => (i, s"fs text $i")).toDF("doc_id", "text")
      .repartition(1).write.mode("overwrite").parquet(data)
    spark.conf.set("graft.artifacts.root", root)
    try {
      val docs = spark.read.parquet(data)
      val d1 = StoredArtifacts.contentKeyedDirOn("graft-fs-stamp", docs,
        "text", "sfX", "-p1")
      assert(d1.startsWith(s"$root/graft-fs-stamp/"))
      // the stamp landed under the URI root (via the FS API, not
      // java.io.File) and the second resolution reads it back
      val fs = StoredArtifacts.fsOf(spark, root)
      val stampDir = new org.apache.hadoop.fs.Path(s"$root/graft-fs-stamp/_fingerprints")
      assert(fs.exists(stampDir) && fs.listStatus(stampDir).exists(_.isFile),
        "stamp file must exist under the scheme-qualified root")
      assert(StoredArtifacts.contentKeyedDirOn("graft-fs-stamp", docs,
        "text", "sfX", "-p1") == d1)
      assert(StoredArtifacts.auditContentKeyOn(docs, "text", d1))
    } finally spark.conf.unset("graft.artifacts.root")
  }
}
