package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Randomized brute-force nets over the round-10 operators — the
  * standing pattern: generate adversarial-ish random inputs with a
  * fixed seed, recompute each answer naively on the driver, and demand
  * exact agreement (or the certified bound, where the contract IS a
  * bound). These catch the mistakes hand-planted cases miss. */
class RandomizedCrossChecksR10Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("joinEstimate: upper-bound theorem and exact identity hold on random skews") {
    val spark = this.spark
    import spark.implicits._
    val rnd = new scala.util.Random(101)
    for (trial <- 1 to 5) {
      // key domains with random skew: a few hot keys + a long tail
      def keys(n: Int, hot: Int): Seq[Long] =
        Seq.fill(n)(if (rnd.nextInt(100) < hot) rnd.nextInt(3).toLong
          else 100L + rnd.nextInt(500))
      val ka = keys(800 + rnd.nextInt(800), 10 + rnd.nextInt(60))
      val kb = keys(800 + rnd.nextInt(800), 10 + rnd.nextInt(60))
      val out = graft.operators.ScaleOps.joinEstimate(
        ka.toDF("o_orderkey"), kb.toDF("l_orderkey")).head()
      // brute-force join size
      val ca = ka.groupBy(identity).view.mapValues(_.size.toLong)
      val cb = kb.groupBy(identity).view.mapValues(_.size.toLong)
      val exact = ca.keys.toSeq.map(k => ca(k) * cb.getOrElse(k, 0L)).sum
      assert(out.getAs[Long]("exact_join_rows") == exact,
        s"trial $trial: exact identity")
      assert(out.getAs[Long]("est_join_rows") >= exact,
        s"trial $trial: CM inner product must never underestimate")
      assert(out.getAs[Boolean]("never_underestimates"))
    }
  }

  test("dedupEditDistance: complete and exact within blocks on random strings") {
    val spark = this.spark
    import spark.implicits._
    val rnd = new scala.util.Random(103)
    val alphabet = "abcd"
    def mutate(s0: String, edits: Int): String = {
      var s = s0
      for (_ <- 1 to edits) {
        val i = rnd.nextInt(s.length)
        rnd.nextInt(3) match {
          case 0 => s = s.updated(i, alphabet(rnd.nextInt(4)))       // sub
          case 1 => s = s.take(i) + alphabet(rnd.nextInt(4)) + s.drop(i) // ins
          case 2 if s.length > 8 => s = s.take(i) + s.drop(i + 1)    // del
          case _ => ()
        }
      }
      s
    }
    val bases = (0 until 30).map(_ =>
      (0 until 16 + rnd.nextInt(8)).map(_ => alphabet(rnd.nextInt(4))).mkString)
    val docs = bases.zipWithIndex.flatMap { case (b, i) =>
      Seq((i * 10L, "en", b), (i * 10L + 1, "en", mutate(b, rnd.nextInt(5))))
    }.toDF("doc_id", "lang", "text")
    val got = graft.operators.Dedup.dedupEditDistance(docs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // brute force WITH the same blocking (the operator's stated contract)
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) =>
        if (i == 0) j else if (j == 0) i else 0)
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val rows = docs.collect().map(r =>
      (r.getLong(0), r.getString(1), r.getString(2).toLowerCase.trim.take(40)))
      .filter(_._3.nonEmpty)
    def blk(lang: String, t: String) = s"$lang:${t.length / 8}:${t.take(2)}"
    val want = (for {
      a <- rows; b <- rows
      if a._1 < b._1 && blk(a._2, a._3) == blk(b._2, b._3)
      d = lev(a._3, b._3) if d <= 3
    } yield (a._1, b._1, d.toLong)).toSet
    assert(got == want, s"got ${got.size} want ${want.size}: " +
      s"missing=${want -- got} extra=${got -- want}")
  }

  test("phraseSearch: occurrence and doc counts equal sliding-window brute force") {
    val spark = this.spark
    import spark.implicits._
    val rnd = new scala.util.Random(107)
    val vocab = Seq("ga", "bu", "zo", "meu")
    val docs = (0 until 40).map { i =>
      (i.toLong, (0 until 10 + rnd.nextInt(30))
        .map(_ => vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }
    val out = graft.operators.TextOps.phraseSearch(docs.toDF("doc_id", "text"),
      nPhrases = 4).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(out.length == 4)
    for ((phrase, nDocs, nOcc) <- out) {
      val ws = phrase.split(" ")
      val perDoc = docs.map { case (_, text) =>
        text.split("\\s+").sliding(3).count(_.sameElements(ws))
      }
      assert(perDoc.sum.toLong == nOcc, s"'$phrase' occurrences")
      assert(perDoc.count(_ > 0).toLong == nDocs, s"'$phrase' docs")
    }
  }

  test("vocabGrowth: every step equals a brute-force prefix recompute on random docs") {
    val spark = this.spark
    import spark.implicits._
    val rnd = new scala.util.Random(109)
    val vocab = (1 to 60).map(i => s"w$i")
    // sparse, shuffled doc ids — thresholds are VALUES, not ranks
    val ids = rnd.shuffle((1 to 200).map(_ * (1 + rnd.nextInt(5)).toLong)).distinct.take(80)
    val docs = ids.map { id =>
      (id, (0 until 5 + rnd.nextInt(15))
        .map(_ => vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }
    val out = graft.operators.TextOps.vocabGrowth(docs.toDF("doc_id", "text"))
      .collect()
    val maxId = ids.max
    for (r <- out) {
      val t = r.getLong(1)
      assert(t == r.getLong(0) * maxId / 10, "threshold formula")
      val prefix = docs.filter(_._1 <= t)
      val toks = prefix.flatMap(_._2.split("\\s+"))
      val freq = toks.groupBy(identity).view.mapValues(_.size)
      assert(r.getLong(2) == prefix.size.toLong, s"docs@$t")
      assert(r.getLong(3) == toks.size.toLong, s"tokens@$t")
      assert(r.getLong(4) == freq.size.toLong, s"vocab@$t")
      assert(r.getLong(5) == freq.count(_._2 == 1).toLong, s"hapax@$t")
    }
  }

  test("tokenSpectrum: bands equal a brute-force count-of-counts on random frequencies") {
    val spark = this.spark
    import spark.implicits._
    val rnd = new scala.util.Random(113)
    val words = (1 to 120).flatMap(i => Seq.fill(1 + rnd.nextInt(40))(s"t$i"))
    val docs = rnd.shuffle(words).grouped(25).zipWithIndex
      .map { case (ws, i) => (i.toLong, ws.mkString(" ")) }.toSeq
    val out = graft.operators.TextOps.tokenSpectrum(docs.toDF("doc_id", "text"))
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))).toMap
    val freq = words.groupBy(identity).view.mapValues(_.size.toLong)
    val want = freq.values.groupBy(f => 63 - java.lang.Long.numberOfLeadingZeros(f))
      .map { case (band, fs) =>
        (band.toLong, (fs.size.toLong, fs.sum, fs.min, fs.max)) }
    assert(out == want, s"got $out want $want")
  }
}
