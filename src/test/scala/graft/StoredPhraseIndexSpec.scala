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
    val (base, cand, _) = TextOps.storedPhraseParts(s, dir,
      Seq(Seq(phrase._1, phrase._2, phrase._3)), nBuckets = 16)
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

  test("general probe: 1-, 2- and 4-word phrases verify positionally, counts equal brute force") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "a quick brown fox ran while the lazy dog slept"),
      (3L, "quick brown quick brown quick brown"),
      (4L, "the dog and the fox")
    ).toDF("doc_id", "text")
    val dir = freshDir("nlen")
    TextOps.buildPosIndex(docs, dir, nBuckets = 16)
    def probe(ps: Seq[Seq[String]]) =
      TextOps.phraseProbeStored(s, dir, ps, 16)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    // 1-word: the posting list IS the answer (vacuous verify)
    assert(probe(Seq(Seq("quick"))) == Set(("quick", 3L, 5L)))
    // 2-word incl. overlapping repeats in doc 3
    assert(probe(Seq(Seq("quick", "brown"), Seq("lazy", "dog"))) ==
      Set(("quick brown", 3L, 5L), ("lazy dog", 2L, 2L)))
    // 4-word across two docs
    assert(probe(Seq(Seq("quick", "brown", "fox", "jumps"),
      Seq("the", "lazy", "dog", "slept"))) ==
      Set(("quick brown fox jumps", 1L, 1L), ("the lazy dog slept", 1L, 1L)))
    // mixed lengths in ONE probe call
    assert(probe(Seq(Seq("fox"), Seq("brown", "fox"),
      Seq("over", "the", "lazy", "dog"))) ==
      Set(("fox", 3L, 3L), ("brown fox", 2L, 2L),
        ("over the lazy dog", 1L, 1L)))
  }

  test("phraseSearchNgramStored: top bigrams and quadgrams derive from the index and verify exactly") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (1L, "alpha beta gamma delta alpha beta gamma delta"),
      (2L, "alpha beta gamma delta other words here"),
      (3L, "alpha beta only here")
    ).toDF("doc_id", "text")
    val dir = freshDir("ngram")
    TextOps.buildPosIndex(docs, dir, nBuckets = 16)
    val out = TextOps.phraseSearchNgramStored(s, dir, ns = Seq(2, 4),
      perN = 2, nBuckets = 16)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val (bi, quad) = out.partition(_._1 == 2L)
    // "alpha beta" ×4 (docs 1,1,2,3), "beta gamma" ×3 — the top-2
    assert(bi.toSeq == Seq((2L, "alpha beta", 3L, 4L),
      (2L, "beta gamma", 2L, 3L)), s"bi=${bi.toSeq}")
    // quadgrams: "alpha beta gamma delta" ×3 tops; second is a tie
    // broken by phrase asc among the f=1 candidates
    assert(quad.head == ((4L, "alpha beta gamma delta", 2L, 3L)),
      s"quad=${quad.toSeq}")
    assert(quad.length == 2)
  }

  test("proximitySearchStored: ordered NEAR counts equal brute force and dominate the exact-phrase counts") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (1L, "red fox red dog fox dog red"),
      (2L, "red dog other words fox"),
      (3L, "fox then red at the end")
    ).toDF("doc_id", "text")
    val dir = freshDir("prox")
    TextOps.buildPosIndex(docs, dir, nBuckets = 16)
    val out = TextOps.proximitySearchStored(s, dir, nPairs = 2, window = 3,
      nBuckets = 16)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    // brute force over every derived pair
    def near(t1: String, t2: String, w: Int): (Long, Long) = {
      val perDoc = Seq(
        "red fox red dog fox dog red", "red dog other words fox",
        "fox then red at the end").map(_.split(" ").toSeq).map { ws =>
        val p1 = ws.zipWithIndex.filter(_._1 == t1).map(_._2)
        val p2 = ws.zipWithIndex.filter(_._1 == t2).map(_._2)
        p1.map(a => p2.count(b => b > a && b <= a + w)).sum.toLong
      }
      (perDoc.count(_ > 0).toLong, perDoc.sum)
    }
    out.foreach { case (pair, (w, nDocs, nOcc)) =>
      val Array(t1, t2) = pair.split(" ")
      val (bd, bo) = near(t1, t2, w.toInt)
      assert((nDocs, nOcc) == ((bd, bo)), s"$pair: got ($nDocs,$nOcc) want ($bd,$bo)")
      assert(nOcc > 0, "adjacency guarantees at least the bigram count")
    }
    assert(out.size == 2)
  }

  test("incremental index: doc-disjoint epochs union to the flat index's answers; stream ingest + replay idempotent") {
    val s = spark
    import s.implicits._
    val all = Seq(
      (1L, "go go go go"),
      (2L, "then go go go stop"),
      (3L, "alpha beta gamma delta"),
      (4L, "alpha beta gamma other"),
      (5L, "go alpha beta gamma")
    )
    val df = all.toDF("doc_id", "text")
    // stream ingest: two doc-disjoint micro-batches
    val dir = freshDir("inc")
    val mem = {
      implicit val sql: org.apache.spark.sql.SQLContext = s.sqlContext
      org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[(Long, String)]
    }
    val q = TextOps.posIndexStream(
      mem.toDF().toDF("doc_id", "text"), dir, nBuckets = 16)
      .option("checkpointLocation", freshDir("inc-chk")).start()
    try {
      mem.addData(all.take(2): _*); q.processAllAvailable()
      mem.addData(all.drop(2): _*); q.processAllAvailable()
    } finally q.stop()
    // merged probe == in-query face on the whole corpus
    val direct = TextOps.phraseSearch(df, nPhrases = 3).collect().toSeq
    val inc = TextOps.phraseSearchIncremental(s, dir, nPhrases = 3,
      nBuckets = 16).collect().toSeq
    assert(inc == direct, s"inc=$inc direct=$direct")
    // == the flat build-once index too
    val flat = freshDir("inc-flat")
    TextOps.buildPosIndex(df, flat, nBuckets = 16)
    assert(TextOps.phraseSearchStored(s, flat, nPhrases = 3, nBuckets = 16)
      .collect().toSeq == inc)
    // epoch replay: re-ingesting batch 0's docs as epoch 0 overwrites,
    // never double-counts
    TextOps.posIndexIngest(all.take(2).toDF("doc_id", "text"), dir, 0L,
      nBuckets = 16)
    assert(TextOps.phraseSearchIncremental(s, dir, nPhrases = 3,
      nBuckets = 16).collect().toSeq == direct)
    // torn epoch (postings without stats) is invisible
    val stage = freshDir("inc-stage")
    TextOps.posIndexIngest(Seq((9L, "go go go torn torn")).toDF("doc_id", "text"),
      stage, 7L, nBuckets = 16)
    val fs = new org.apache.hadoop.fs.Path(stage)
      .getFileSystem(s.sessionState.newHadoopConf())
    fs.delete(new org.apache.hadoop.fs.Path(s"$stage/delta-b7/stats"), true)
    assert(fs.rename(new org.apache.hadoop.fs.Path(s"$stage/delta-b7"),
      new org.apache.hadoop.fs.Path(s"$dir/delta-b7")))
    assert(TextOps.phraseSearchIncremental(s, dir, nPhrases = 3,
      nBuckets = 16).collect().toSeq == direct, "torn epoch must be invisible")
  }

  test("proximity over the incremental index equals the flat-index answers") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (1L, "red fox red dog fox dog red"),
      (2L, "red dog other words fox"),
      (3L, "fox then red at the end")
    ).toDF("doc_id", "text")
    val flat = freshDir("prox-flat")
    TextOps.buildPosIndex(docs, flat, nBuckets = 16)
    val inc = freshDir("prox-inc")
    TextOps.posIndexIngest(docs.filter(col("doc_id") <= 2), inc, 0L, nBuckets = 16)
    TextOps.posIndexIngest(docs.filter(col("doc_id") > 2), inc, 1L, nBuckets = 16)
    val a = TextOps.proximitySearchStored(s, flat, nPairs = 2, window = 3,
      nBuckets = 16).collect().toSeq
    val b = TextOps.proximitySearchIncremental(s, inc, nPairs = 2, window = 3,
      nBuckets = 16).collect().toSeq
    assert(a == b, s"flat=$a inc=$b")
  }

  test("compaction: folds deltas into base with identical answers; crash between renames rolls forward") {
    val s = spark
    import s.implicits._
    val batch1 = Seq((1L, "go go go go"), (2L, "then go go go stop"))
    val batch2 = Seq((3L, "alpha beta gamma delta"), (4L, "alpha beta gamma other"))
    val batch3 = Seq((5L, "go alpha beta gamma"))
    val dir = freshDir("compact")
    TextOps.posIndexIngest(batch1.toDF("doc_id", "text"), dir, 0L, nBuckets = 16)
    TextOps.posIndexIngest(batch2.toDF("doc_id", "text"), dir, 1L, nBuckets = 16)
    val before = TextOps.phraseSearchIncremental(s, dir, nPhrases = 3,
      nBuckets = 16).collect().toSeq
    assert(TextOps.compactPosIndex(s, dir) == 2)
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(s.sessionState.newHadoopConf())
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$dir/delta-b0")) &&
      !fs.exists(new org.apache.hadoop.fs.Path(s"$dir/delta-b1")),
      "folded deltas removed")
    assert(TextOps.phraseSearchIncremental(s, dir, nPhrases = 3,
      nBuckets = 16).collect().toSeq == before, "content-identical fold")
    // post-compaction ingest keeps working: base + new delta
    TextOps.posIndexIngest(batch3.toDF("doc_id", "text"), dir, 2L, nBuckets = 16)
    val expect = TextOps.phraseSearch(
      (batch1 ++ batch2 ++ batch3).toDF("doc_id", "text"), nPhrases = 3)
      .collect().toSeq
    assert(TextOps.phraseSearchIncremental(s, dir, nPhrases = 3,
      nBuckets = 16).collect().toSeq == expect)
    // second compaction folds base + the new delta; then simulate a
    // crash BETWEEN the two renames of a third compaction: swap-out
    // happened (base -> base-old), swap-in didn't
    assert(TextOps.compactPosIndex(s, dir) == 1)
    TextOps.posIndexIngest(Seq((6L, "alpha beta gamma end"))
      .toDF("doc_id", "text"), dir, 3L, nBuckets = 16)
    val expect2 = TextOps.phraseSearch(
      (batch1 ++ batch2 ++ batch3 ++ Seq((6L, "alpha beta gamma end")))
        .toDF("doc_id", "text"), nPhrases = 3).collect().toSeq
    // phase 1 by hand: a completed merge in base-compacting (reuse the
    // real code path via a throwaway dir is impossible mid-crash, so
    // construct the exact state: merged pair + manifest, base swapped
    // out, base-compacting not yet swapped in)
    val merged = TextOps.posIndexMerged(s, dir)
    merged._1.write.partitionBy("bucket").mode("overwrite")
      .parquet(s"$dir/base-compacting/postings")
    s.read.parquet(s"$dir/base/stats2", s"$dir/delta-b3/stats2")
      .groupBy(col("t1"), col("t2"))
      .agg(org.apache.spark.sql.functions.sum(col("f_pair")).as("f_pair"))
      .write.mode("overwrite").parquet(s"$dir/base-compacting/stats2")
    Seq(3, 4).foreach { n =>
      val tcols = (1 to n).map(i => col(s"t$i"))
      s.read.parquet(s"$dir/base/stats$n", s"$dir/delta-b3/stats$n")
        .groupBy(tcols: _*)
        .agg(org.apache.spark.sql.functions.sum(col("f")).as("f"))
        .write.mode("overwrite").parquet(s"$dir/base-compacting/stats$n")
    }
    merged._2.write.mode("overwrite").parquet(s"$dir/base-compacting/stats")
    graft.operators.StoredArtifacts.writeTextFile(fs,
      s"$dir/base-compacting/_FOLDED", "delta-b3")
    assert(fs.rename(new org.apache.hadoop.fs.Path(s"$dir/base"),
      new org.apache.hadoop.fs.Path(s"$dir/base-old")))
    // crash here. recovery rolls the completed merge forward and
    // replays the cleanup
    TextOps.recoverPosCompaction(s, dir)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$dir/delta-b3")) &&
      !fs.exists(new org.apache.hadoop.fs.Path(s"$dir/base-old")))
    assert(TextOps.phraseSearchIncremental(s, dir, nPhrases = 3,
      nBuckets = 16).collect().toSeq == expect2, "rolled-forward index answers")
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

  test("probes read nBuckets from _META: a mismatched caller parameter cannot mis-prune") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (1L, "alpha beta gamma delta"),
      (2L, "alpha beta gamma other"),
      (3L, "alpha beta end")
    ).toDF("doc_id", "text")
    val dir = freshDir("meta")
    TextOps.buildPosIndex(docs, dir, nBuckets = 16)
    assert(TextOps.posIndexNBuckets(s, dir, fallback = 999) == 16)
    val right = TextOps.phraseProbeStored(s, dir,
      Seq(Seq("alpha", "beta")), nBuckets = 16).collect().toSeq
    // a caller passing the WRONG bucket count used to recompute wrong
    // bucket literals, prune away the real postings, and silently
    // return empty; the _META sidecar makes the build-time value win
    val wrong = TextOps.phraseProbeStored(s, dir,
      Seq(Seq("alpha", "beta")), nBuckets = 7).collect().toSeq
    assert(wrong == right && right.nonEmpty, s"wrong=$wrong right=$right")
    // the incremental family persists _META at the family root too
    val inc = freshDir("meta-inc")
    TextOps.ensurePosIndexIncremental(docs, inc, nEpochs = 2, nBuckets = 16)
    val incRight = TextOps.phraseProbeIncremental(s, inc,
      Seq(Seq("alpha", "beta")), nBuckets = 16).collect().toSeq
    val incWrong = TextOps.phraseProbeIncremental(s, inc,
      Seq(Seq("alpha", "beta")), nBuckets = 7).collect().toSeq
    assert(incWrong == incRight && incRight.nonEmpty)
  }

  test("collocation lift survives counts whose products overflow LONG (DECIMAL(38) path)") {
    val s = spark
    import s.implicits._
    // f_pair * n_windows * 10^4 = 6e28 and f1 * f2 = 7.5e24 — both far
    // past 2^63 ~ 9.2e18; the quotient is exact and basis-point-scale
    val bi = Seq(
      ("aa", "bb", 2_000_000_000_000L),
      ("cc", "dd", 1_000_000_000_000L)
    ).toDF("t1", "t2", "f_pair")
    val uni = Seq(
      ("aa", 2_500_000_000_000L), ("bb", 3_000_000_000_000L),
      ("cc", 4_000_000_000_000L), ("dd", 5_000_000_000_000L)
    ).toDF("term", "f")
    val out = TextOps.collocationLift(bi, uni, k = 10, minCount = 5L)
      .select("pair", "lift_bp").collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    // lift(aa bb) = 10^4 * 2e12 * 3e12 div (2.5e12 * 3e12) = 8000
    // lift(cc dd) = 10^4 * 1e12 * 3e12 div (4e12 * 5e12)   = 1500
    assert(out == Seq(("aa bb", 8000L), ("cc dd", 1500L)), out.toString)
  }

  test("ngram derivation: stored stats for n in 2..4, lead-window fallback beyond the stored range") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (1L, "one two three four five six"),
      (2L, "one two three four five other"),
      (3L, "one two three only")
    ).toDF("doc_id", "text")
    val dir = freshDir("nfall")
    TextOps.buildPosIndex(docs, dir, nBuckets = 16)
    // n=5 has no stored stats table -> the window fallback derives it
    // from the postings; n=2 reads stats2 — both verify exactly
    val out = TextOps.phraseSearchNgramStored(s, dir, ns = Seq(2, 5),
      perN = 1, nBuckets = 16)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq == Seq(
      (2L, "one two", 3L, 3L),
      (5L, "one two three four five", 2L, 2L)), out.toSeq.toString)
  }

  test("statsNs build knob: exotic lengths stored at build; compaction folds discovered lengths exactly") {
    val s = spark
    import s.implicits._
    val batchA = Seq((1L, "a b c d e f g"), (2L, "a b c d e x y"))
    val batchB = Seq((3L, "a b c d e done"), (4L, "z z a b c d e"))
    val docs = (batchA ++ batchB).toDF("doc_id", "text")
    // flat build with pentagram stats stored
    val flat = freshDir("knob5")
    TextOps.buildPosIndex(docs, flat, nBuckets = 16, statsNs = Seq(3, 4, 5))
    assert(graft.operators.StoredArtifacts.exists(s, s"$flat/stats5/_SUCCESS"))
    val viaStored = TextOps.phraseSearchNgramStored(s, flat, ns = Seq(5),
      perN = 1, nBuckets = 16).collect().toSeq
    // a default build lacks stats5 -> the window fallback derives the
    // same query set -> identical output proves the stored path right
    val flatDefault = freshDir("knob-def")
    TextOps.buildPosIndex(docs, flatDefault, nBuckets = 16)
    assert(!graft.operators.StoredArtifacts.exists(s, s"$flatDefault/stats5/_SUCCESS"))
    val viaWindow = TextOps.phraseSearchNgramStored(s, flatDefault, ns = Seq(5),
      perN = 1, nBuckets = 16).collect().toSeq
    assert(viaStored == viaWindow && viaStored.nonEmpty,
      s"stored=$viaStored window=$viaWindow")
    // incremental: per-epoch stats5 written, compaction DISCOVERS and
    // folds it; the folded table equals the whole-corpus build's
    val inc = freshDir("knob-inc")
    TextOps.posIndexIngest(batchA.toDF("doc_id", "text"), inc, 0L,
      nBuckets = 16, statsNs = Seq(3, 4, 5))
    TextOps.posIndexIngest(batchB.toDF("doc_id", "text"), inc, 1L,
      nBuckets = 16, statsNs = Seq(3, 4, 5))
    assert(TextOps.compactPosIndex(s, inc) == 2)
    assert(graft.operators.StoredArtifacts.exists(s, s"$inc/base/stats5/_SUCCESS"))
    val folded = s.read.parquet(s"$inc/base/stats5").collect()
      .map(_.toSeq).toSet
    val whole = s.read.parquet(s"$flat/stats5").collect().map(_.toSeq).toSet
    assert(folded == whole, "doc-disjoint epochs must sum to the corpus stats5")
  }
}
