package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** The token-frequency spectrum: hand-checkable band placement on a
  * planted Zipf-ish vocabulary (the synthetic corpus's 31-type flat
  * vocabulary exercises only two bands, so the spec plants a real
  * tail), exact band boundaries at powers of two, share arithmetic,
  * and whitespace/empty-text robustness. */
class TokenSpectrumSpec extends AnyFunSuite {

  test("bands split at powers of two; hapax band and shares are exact") {
    val spark = TestSpark.spark
    import spark.implicits._
    // vocabulary with known frequencies: 4 hapax (band 0), "two" x2
    // and "three" x3 (band 1), "seven" x7 (band 2), "eight" x8 (band 3)
    val words =
      Seq("h1", "h2", "h3", "h4") ++
      Seq.fill(2)("two") ++ Seq.fill(3)("three") ++
      Seq.fill(7)("seven") ++ Seq.fill(8)("eight")
    val docs = words.grouped(5).zipWithIndex
      .map { case (ws, i) => (i.toLong, ws.mkString("  ")) } // double spaces
      .toSeq.toDF("doc_id", "text")
      .unionByName(Seq((99L, "   ")).toDF("doc_id", "text")) // whitespace-only doc
    val out = graft.operators.TextOps.tokenSpectrum(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
    // (band, n_types, n_occ, min_f, max_f, type_share_bp, occ_share_bp)
    assert(out.toSeq == Seq(
      (0L, 4L, 4L, 1L, 1L, 5000L, 1666L),
      (1L, 2L, 5L, 2L, 3L, 2500L, 2083L),
      (2L, 1L, 7L, 7L, 7L, 1250L, 2916L),
      (3L, 1L, 8L, 8L, 8L, 1250L, 3333L)),
      s"got ${out.toSeq}")
  }

  test("a planted Zipf tail produces the descending-type-count spectrum") {
    val spark = TestSpark.spark
    import spark.implicits._
    // ~Zipf: type i occurs ceil(1000/i) times, i = 1..200
    val words = (1 to 200).flatMap(i => Seq.fill((1000 + i - 1) / i)(s"w$i"))
    val docs = words.grouped(50).zipWithIndex
      .map { case (ws, i) => (i.toLong, ws.mkString(" ")) }.toSeq
      .toDF("doc_id", "text")
    val out = graft.operators.TextOps.tokenSpectrum(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(out.length >= 7, s"a real tail spans many bands: ${out.toSeq}")
    // types per band grow toward the tail (low-frequency bands hold
    // more types) — the Zipf signature the audit exists to show
    val types = out.sortBy(_._1).map(_._2)
    assert(types.head >= types.last,
      s"low bands hold at least as many types as the head: ${types.toSeq}")
    // total types conserved
    assert(types.sum == 200L)
  }

  test("vocabGrowth: monotone curves, exact hand-checked prefix counts, full-corpus final row") {
    val spark = TestSpark.spark
    import spark.implicits._
    // 10 docs, ids 1..10 (max_id = 10 -> thresholds 1, 2, ..., 10):
    // doc i introduces token "new_i" and repeats "base"; doc 6 also
    // repeats "new_1" (so new_1 stops being hapax at step 6)
    val docs = (1 to 10).map { i =>
      val extra = if (i == 6) " new_1" else ""
      (i.toLong, s"base new_$i$extra")
    }.toDF("doc_id", "text")
    val out = graft.operators.TextOps.vocabGrowth(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(out.length == 10)
    // step i: i docs, vocab = 1 + i ("base" + i new tokens)
    for ((step, thr, nDocs, nToks, vocab, hapax) <- out) {
      assert(thr == step && nDocs == step, s"dense ids: threshold=docs=$step")
      assert(vocab == 1 + step, s"step $step vocab")
      val expectedToks = 2 * step + (if (step >= 6) 1 else 0)
      assert(nToks == expectedToks, s"step $step tokens")
      // hapax: the i new_* tokens, minus "base" once repeated (step>=2
      // base is not hapax; at step 1 base IS hapax), minus new_1 after
      // its step-6 repeat
      val expectedHapax =
        (if (step == 1) 2L else step.toLong) - (if (step >= 6) 1 else 0)
      assert(hapax == expectedHapax, s"step $step hapax: $hapax")
    }
    // curves are monotone where mathematics says so
    val vocabs = out.map(_._5); val toks = out.map(_._4)
    assert(vocabs.zip(vocabs.tail).forall { case (a, b) => a <= b })
    assert(toks.zip(toks.tail).forall { case (a, b) => a <= b })
  }

  test("phraseSearch: positional verify counts overlapping occurrences and distinct docs exactly") {
    val spark = TestSpark.spark
    import spark.implicits._
    // "go go go go" holds the trigram "go go go" TWICE (overlapping);
    // the same phrase appears once in doc 2; filler trigrams are rarer
    val docs = Seq(
      (1L, "go go go go"),
      (2L, "then go go go stop"),
      (3L, "alpha beta gamma delta"),
      (4L, "alpha beta gamma other")
    ).toDF("doc_id", "text")
    val out = graft.operators.TextOps.phraseSearch(docs, nPhrases = 2)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(out.length == 2)
    assert(out(0) == ("go go go", 2L, 3L),
      s"overlapping occurrences count positionally: ${out.toSeq}")
    assert(out(1) == ("alpha beta gamma", 2L, 2L), s"got ${out.toSeq}")
  }

  test("textCollocation: exact-integer lift ranks the bound pair above frequent-but-independent ones") {
    val spark = TestSpark.spark
    import spark.implicits._
    // "neural network" occurs 5x, ALWAYS together (true collocation);
    // "the cat" occurs 6x but both words are everywhere (independent)
    val docs = Seq(
      (1L, "the cat saw the dog and the neural network ran"),
      (2L, "the cat and the dog met a neural network today"),
      (3L, "the cat the dog the neural network"),
      (4L, "a neural network and the cat and the dog"),
      (5L, "the neural network likes the cat and the cat likes the dog")
    ).toDF("doc_id", "text")
    val out = graft.operators.TextOps.textCollocation(docs, k = 5, minCount = 5L)
      .collect()
    val rows = out.map(r => r.getString(0) ->
      (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    assert(rows.contains("neural network"))
    val toks = docs.collect().flatMap(_.getString(1).split(" "))
    val nWindows = docs.collect()
      .map(_.getString(1).split(" ").length - 1).sum.toLong
    def f(t: String) = toks.count(_ == t).toLong
    val (fp, f1, f2, nw, lift) = rows("neural network")
    assert((fp, f1, f2, nw) == ((5L, f("neural"), f("network"), nWindows)))
    assert(lift == 10000L * 5L * nWindows / (f("neural") * f("network")),
      "lift is the exact integer formula")
    // the bound pair out-lifts every frequent-but-independent pair
    assert(out.head.getString(0) == "neural network", out.mkString(";"))
    rows.get("the cat").foreach { case (_, _, _, _, l) =>
      assert(l < lift, "independent pair must not out-lift the collocation")
    }
    // the STORED face (stats + stats2, zero corpus reads) and the
    // incremental epoch family answer identically
    val flat = java.nio.file.Files.createTempDirectory("graft-coll-f").toString
    graft.operators.TextOps.buildPosIndex(docs, flat, nBuckets = 16)
    val stored = graft.operators.TextOps
      .textCollocationStored(spark, flat, k = 5, minCount = 5L)
      .collect().toSeq
    assert(stored == out.toSeq, s"stored=$stored direct=${out.toSeq}")
    val inc = java.nio.file.Files.createTempDirectory("graft-coll-i").toString
    graft.operators.TextOps.posIndexIngest(
      docs.filter(col("doc_id") <= 2), inc, 0L, nBuckets = 16)
    graft.operators.TextOps.posIndexIngest(
      docs.filter(col("doc_id") > 2), inc, 1L, nBuckets = 16)
    assert(graft.operators.TextOps
      .textCollocationIncremental(spark, inc, k = 5, minCount = 5L)
      .collect().toSeq == out.toSeq)
  }

  test("vocabGrowth on an empty frame fails with a descriptive require, not an NPE") {
    val spark = TestSpark.spark
    import spark.implicits._
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val e = intercept[IllegalArgumentException] {
      graft.operators.TextOps.vocabGrowth(empty)
    }
    assert(e.getMessage.contains("non-empty documents"))
  }
}
