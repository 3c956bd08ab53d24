package graft.operators

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Round-12 headline: the content-keyed artifact dir must resolve from
  * a METADATA stamp on the steady-state path (no per-query corpus
  * scan), while the r6 staleness hazard stays covered — a regenerated
  * corpus with identical ids and row count still re-keys and rebuilds.
  * The poisoned-stamp trick proves the read path: if resolution ran
  * the corpus scan, the sentinel fingerprint could never appear in the
  * dir name. */
class FingerprintStampSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** Isolated artifact root per test so stamp-count assertions cannot
    * collide with other suites sharing the session. */
  private def withRoot[T](body: String => T): T = {
    val root = Files.createTempDirectory("graft-stamp").toString
    val old = spark.conf.getOption("graft.artifacts.root")
    spark.conf.set("graft.artifacts.root", root)
    try body(root)
    finally old match {
      case Some(v) => spark.conf.set("graft.artifacts.root", v)
      case None    => spark.conf.unset("graft.artifacts.root")
    }
  }

  private def writeCorpus(dir: String, texts: Seq[(Long, String)]): Unit = {
    val s = spark; import s.implicits._
    texts.toDF("doc_id", "text").repartition(1)
      .write.mode("overwrite").parquet(dir)
  }

  /** Visible stamp files only — the local ChecksumFileSystem writes
    * hidden `.crc` side files beside each stamp (absent on HDFS/S3). */
  private def stampFiles(root: String, family: String): Array[java.io.File] = {
    val d = new java.io.File(s"$root/$family/_fingerprints")
    if (d.isDirectory) d.listFiles.filter(f => f.isFile && !f.getName.startsWith("."))
    else Array.empty
  }

  /** Hand-edit a stamp; drop the now-stale `.crc` sibling so the local
    * FS serves the edited bytes instead of warning on checksum drift. */
  private def poison(f: java.io.File, content: String): Unit = {
    Files.writeString(f.toPath, content)
    new java.io.File(f.getParentFile, s".${f.getName}.crc").delete()
  }

  test("steady-state resolution reads the stamp, not the corpus") {
    withRoot { root =>
      val data = Files.createTempDirectory("graft-stamp-src").toString + "/docs.parquet"
      writeCorpus(data, (0L until 200L).map(i => (i, s"text body $i")))
      val docs = spark.read.parquet(data)
      val d1 = StoredArtifacts.contentKeyedDirOn("fam-a", docs, "text", "sfX", "-p1")
      assert(StoredArtifacts.contentKeyedDirOn("fam-a", docs, "text", "sfX", "-p1") == d1)
      val stamps = stampFiles(root, "fam-a")
      assert(stamps.length == 1, s"expected exactly one stamp, got ${stamps.length}")
      // poison the stamp with a sentinel; a resolution that scanned the
      // corpus would recompute the true fingerprint instead
      poison(stamps.head, "999 deadbeef\n")
      val d2 = StoredArtifacts.contentKeyedDirOn("fam-a", docs, "text", "sfX", "-p1")
      assert(d2.contains("-n999-fdeadbeef"), s"stamp was not read: $d2")
    }
  }

  test("regenerated corpus (same ids, same count) re-keys and rescans") {
    withRoot { root =>
      val data = Files.createTempDirectory("graft-stamp-src").toString + "/docs.parquet"
      writeCorpus(data, (0L until 200L).map(i => (i, s"first generation $i")))
      val d1 = StoredArtifacts.contentKeyedDirOn("fam-b",
        spark.read.parquet(data), "text", "sfX", "-p1")
      // poison the live stamp: if regeneration failed to re-key, the
      // sentinel would leak into the post-rewrite dir
      stampFiles(root, "fam-b").foreach(poison(_, "999 deadbeef\n"))
      writeCorpus(data, (0L until 200L).map(i => (i, s"second generation with longer text $i")))
      val d2 = StoredArtifacts.contentKeyedDirOn("fam-b",
        spark.read.parquet(data), "text", "sfX", "-p1")
      assert(!d2.contains("-n999-fdeadbeef"),
        s"stale stamp served after corpus regeneration: $d2")
      assert(d2 != d1, "regenerated corpus must re-key the artifact dir")
      assert(stampFiles(root, "fam-b").length == 2,
        "the regenerated source version must get its own stamp")
    }
  }

  test("same files, different content column -> different stamps and keys") {
    withRoot { root =>
      val data = Files.createTempDirectory("graft-stamp-src").toString + "/t.parquet"
      val s = spark; import s.implicits._
      (0L until 300L).map(i => (i, s"alpha $i", s"beta ${i * 7}"))
        .toDF("id", "a", "b").repartition(1)
        .write.mode("overwrite").parquet(data)
      val t = spark.read.parquet(data)
      val da = StoredArtifacts.contentKeyedDirOn("fam-c", t, "a", "sfX", "-p1")
      val db = StoredArtifacts.contentKeyedDirOn("fam-c", t, "b", "sfX", "-p1")
      assert(da != db, "column selection must be part of the content key")
      assert(stampFiles(root, "fam-c").length == 2)
    }
  }

  test("opt-in audit recomputes the scan and checks the dir's key") {
    withRoot { root =>
      val data = Files.createTempDirectory("graft-stamp-src").toString + "/docs.parquet"
      writeCorpus(data, (0L until 150L).map(i => (i, s"audit me $i")))
      val docs = spark.read.parquet(data)
      val d1 = StoredArtifacts.contentKeyedDirOn("fam-d", docs, "text", "sfX", "-p1")
      assert(StoredArtifacts.auditContentKeyOn(docs, "text", d1))
      stampFiles(root, "fam-d").foreach(poison(_, "999 deadbeef\n"))
      val poisoned = StoredArtifacts.contentKeyedDirOn("fam-d", docs, "text", "sfX", "-p1")
      assert(!StoredArtifacts.auditContentKeyOn(docs, "text", poisoned),
        "audit must catch a dir whose key does not match the data")
    }
  }

  test("non-file-backed frames fall back to the direct scan (no stamp)") {
    withRoot { root =>
      val s = spark; import s.implicits._
      val mem = (0L until 50L).toDF("id")
      val d1 = StoredArtifacts.contentKeyedDir("fam-e", mem, "sfX", "-p1")
      assert(d1 == StoredArtifacts.contentKeyedDir("fam-e", mem, "sfX", "-p1"))
      assert(stampFiles(root, "fam-e").isEmpty,
        "in-memory frames have no stable source identity to stamp")
    }
  }

  test("a torn stamp is recomputed and overwritten, never trusted") {
    withRoot { root =>
      val data = Files.createTempDirectory("graft-stamp-src").toString + "/docs.parquet"
      writeCorpus(data, (0L until 100L).map(i => (i, s"torn $i")))
      val docs = spark.read.parquet(data)
      val d1 = StoredArtifacts.contentKeyedDirOn("fam-f", docs, "text", "sfX", "-p1")
      stampFiles(root, "fam-f").foreach(poison(_, "garb"))
      val d2 = StoredArtifacts.contentKeyedDirOn("fam-f", docs, "text", "sfX", "-p1")
      assert(d2 == d1, "a malformed stamp must recompute the true key")
      assert(StoredArtifacts.auditContentKeyOn(docs, "text", d2))
    }
  }
}
