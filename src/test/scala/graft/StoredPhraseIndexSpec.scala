package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.TextOps

/** The stored positional index (SURVEY §2d text_phrase_search_stored):
  * build-once term-bucketed postings + df stats, rarest-word seek,
  * planning-time bucket pruning — and output identity with the
  * in-query face, which is what lets both gate on one oracle. */
class StoredPhraseIndexSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def freshDir(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft-posidx-$tag").toString

  test("stored face equals the in-query face, including overlapping occurrences and dup-term phrases") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (1L, "go go go go"),
      (2L, "then go go go stop"),
      (3L, "alpha beta gamma delta"),
      (4L, "alpha beta gamma other")
    ).toDF("doc_id", "text")
    val dir = freshDir("eq")
    TextOps.buildPosIndex(docs, dir, nBuckets = 16)
    val direct = TextOps.phraseSearch(docs, nPhrases = 2).collect().toSeq
    val stored = TextOps.phraseSearchStored(s, dir, nPhrases = 2, nBuckets = 16)
      .collect().toSeq
    assert(stored == direct, s"stored=$stored direct=$direct")
  }

  test("rarest-word seek: df stats aim the probe at the thinnest posting list") {
    val s = spark
    import s.implicits._
    // "the" floods the corpus; "zebra sleeps" is rare. Seeking the
    // phrase on word 1 would probe the fattest posting list; the df
    // lookup must pick "zebra" (offset 1) and shrink the candidate
    // set to zebra's occurrences.
    val filler = (10L to 59L).map(i => (i, "the cat and the dog saw the end"))
    val docs = (Seq(
      (1L, "the zebra sleeps at noon"),
      (2L, "near the zebra sleeps a cub")
    ) ++ filler).toDF("doc_id", "text")
    val dir = freshDir("rare")
    TextOps.buildPosIndex(docs, dir, nBuckets = 16)
    val phrase = ("the", "zebra", "sleeps")
    // the pure seek rule picks the min-occurrence offset
    val stats = s.read.parquet(s"$dir/stats").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap.withDefaultValue(0L)
    assert(TextOps.chooseSeekOff(phrase, stats) == 1)
    val (base, cand, _) =
      TextOps.storedPhraseParts(s, dir, Seq(phrase), nBuckets = 16)
    // candidate set = zebra's posting list (2 rows), nowhere near
    // "the"'s (150+ occurrences)
    assert(cand.count() == 2L)
    // planning-time bucket pruning: the posting scan carries a
    // partition filter on the literal bucket set
    val plan = base.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") &&
      plan.split("PartitionFilters", 2)(1).take(200).contains("bucket"),
      s"expected a bucket partition filter in:\n$plan")
    // and the probe still answers exactly
    val out = TextOps.phraseProbeStored(s, dir, Seq(phrase), nBuckets = 16)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq == Seq(("the zebra sleeps", 2L, 2L)))
  }

  test("explicit probe tolerates phrases with corpus-absent terms (posting length 0) and finds nothing") {
    val s = spark
    import s.implicits._
    val docs = Seq((1L, "alpha beta gamma")).toDF("doc_id", "text")
    val dir = freshDir("absent")
    TextOps.buildPosIndex(docs, dir, nBuckets = 16)
    val out = TextOps.phraseProbeStored(s, dir,
      Seq(("alpha", "missingword", "gamma")), nBuckets = 16)
    assert(out.count() == 0L)
  }

  test("ensurePosIndex: build-once (sentinel respected), torn build rebuilt") {
    val s = spark
    import s.implicits._
    val docs = Seq((1L, "one two three"), (2L, "one two four")).toDF("doc_id", "text")
    val dir = freshDir("once")
    TextOps.ensurePosIndex(docs, dir)
    val statsPath = new org.apache.hadoop.fs.Path(s"$dir/stats/_SUCCESS")
    val fs = statsPath.getFileSystem(s.sessionState.newHadoopConf())
    val t1 = fs.getFileStatus(statsPath).getModificationTime
    TextOps.ensurePosIndex(docs, dir) // sentinel present -> no rebuild
    assert(fs.getFileStatus(statsPath).getModificationTime == t1)
    fs.delete(new org.apache.hadoop.fs.Path(s"$dir/stats"), true) // torn
    TextOps.ensurePosIndex(docs, dir)
    assert(fs.exists(statsPath), "torn build must be rebuilt")
    val out = TextOps.phraseSearchStored(s, dir, nPhrases = 1)
    assert(out.count() == 1L)
  }
}
