package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Randomized brute-force nets over the round-11 operators — the
  * standing pattern: fixed-seed random inputs, naive driver recompute,
  * exact agreement demanded (or the certified bound where the
  * contract IS a bound). */
class RandomizedCrossChecksR11Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("stored phrase probe: any phrase length equals sliding-window brute force on random corpora") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(111)
    val vocab = Vector("aa", "bb", "cc", "dd", "ee")
    for (trial <- 1 to 3) {
      val docs = (1L to 40L).map { id =>
        (id, Seq.fill(4 + rnd.nextInt(12))(vocab(rnd.nextInt(vocab.size)))
          .mkString(" "))
      }
      val df = docs.toDF("doc_id", "text")
      val dir = java.nio.file.Files
        .createTempDirectory(s"graft-rnd-phrase-$trial").toString
      graft.operators.TextOps.buildPosIndex(df, dir, nBuckets = 8)
      // random phrases of length 1..4 (some corpus-absent by chance)
      val phrases = (1 to 6).map(_ =>
        Seq.fill(1 + rnd.nextInt(4))(vocab(rnd.nextInt(vocab.size))))
        .distinct
      val got = graft.operators.TextOps
        .phraseProbeStored(s, dir, phrases, 8)
        .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
        .toMap
      // brute force: count sliding-window matches per doc
      val toks = docs.map { case (id, t) => id -> t.split(" ").toSeq }
      phrases.foreach { p =>
        val occs = toks.map { case (_, ws) =>
          ws.sliding(p.length).count(_ == p)
        }
        val nOcc = occs.sum.toLong
        val nDocs = occs.count(_ > 0).toLong
        val key = p.mkString(" ")
        if (nOcc == 0) assert(!got.contains(key), s"trial $trial: $key")
        else assert(got(key) == ((nDocs, nOcc)),
          s"trial $trial: $key got ${got.get(key)}, want ($nDocs, $nOcc)")
      }
    }
  }

  test("dedupEditDistanceMultipass: complete and exact over the UNION of all three passes' blocks on random strings") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(113)
    val alphabet = "abcd"
    val bases = (0 until 25).map(_ =>
      (0 until 14 + rnd.nextInt(10)).map(_ => alphabet(rnd.nextInt(4))).mkString)
    def mutate(s0: String, edits: Int): String = {
      var str = s0
      for (_ <- 1 to edits) {
        val i = rnd.nextInt(str.length)
        rnd.nextInt(3) match {
          case 0 => str = str.updated(i, alphabet(rnd.nextInt(4)))
          case 1 => str = str.take(i) + alphabet(rnd.nextInt(4)) + str.drop(i)
          case 2 if str.length > 8 => str = str.take(i) + str.drop(i + 1)
          case _ => ()
        }
      }
      str
    }
    val docs = bases.zipWithIndex.flatMap { case (b, i) =>
      Seq((i * 10L, "en", b), (i * 10L + 1, "en", mutate(b, rnd.nextInt(4))))
    }
    val df = docs.toDF("doc_id", "lang", "text")
    val got = graft.operators.Dedup.dedupEditDistanceMultipass(df)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // driver recompute: titles, ALL THREE block keys, union of
    // in-block pairs (no cap bites at this scale), exact Levenshtein
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0
      }
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val titles = docs.map { case (id, _, t) => id -> t.take(40).toLowerCase }
    def blk1(t: String) = s"en:${t.length / 8}:${t.take(2)}"
    def blk2(t: String) = s"en:${(t.length + 4) / 8}:${t.takeRight(2)}"
    def blk3(t: String) = s"en:${t.length / 8}:${t.slice(19, 21)}"
    val want = (for {
      (ia, ta) <- titles; (ib, tb) <- titles
      if ia < ib
      if blk1(ta) == blk1(tb) || blk2(ta) == blk2(tb) || blk3(ta) == blk3(tb)
      d = lev(ta, tb) if d <= 3
    } yield (ia, ib) -> d.toLong).toMap
    assert(got == want,
      s"multipass pairs diverge: extra=${got.keySet -- want.keySet} " +
        s"missing=${want.keySet -- got.keySet}")
  }

  test("quantileSketchDouble: exact order statistics and certified bounds on random sign-mixed doubles") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(117)
    for (trial <- 1 to 3) {
      val n = 1500 + rnd.nextInt(2000)
      val vals = Seq.fill(n)(rnd.nextInt(4) match {
        case 0 => -math.exp(rnd.nextDouble() * 20) // large negatives
        case 1 => rnd.nextDouble() * 1e-5          // tiny positives
        case _ => rnd.nextDouble() * 1e4
      })
      val out = graft.operators.ScaleOps
        .quantileSketchDouble(vals.toDF("value").repartition(5), k = 128)
        .collect()
      val sorted = vals.sorted
      assert(out.length == 5)
      out.foreach { r =>
        val want = sorted((r.getAs[Long]("target_rank") - 1).toInt)
        assert(java.lang.Double.doubleToLongBits(
          r.getAs[Double]("exact_value")) ==
          java.lang.Double.doubleToLongBits(want),
          s"trial $trial ${r.getAs[String]("q_label")}")
        assert(r.getAs[Boolean]("within_bound"), s"trial $trial bound")
      }
    }
  }

  test("joinEstimateStored equals joinEstimate on random key multisets, any epoch split") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(119)
    for (trial <- 1 to 3) {
      def keys(n: Int): Seq[Long] =
        Seq.fill(n)(if (rnd.nextBoolean()) rnd.nextInt(5).toLong
          else 50L + rnd.nextInt(300))
      val ka = keys(400 + rnd.nextInt(400))
      val kb = keys(400 + rnd.nextInt(400))
      val root = java.nio.file.Files
        .createTempDirectory(s"graft-rnd-jes-$trial").toString
      val dirA = graft.operators.ScaleOps.ensureCmSketch(
        ka.map(_.toString).toDF("k"), s"$root/a",
        nEpochs = 1 + rnd.nextInt(5))
      val dirB = graft.operators.ScaleOps.ensureCmSketch(
        kb.map(_.toString).toDF("k"), s"$root/b",
        nEpochs = 1 + rnd.nextInt(5))
      val stored = graft.operators.ScaleOps
        .joinEstimateStored(s, dirA, dirB).head()
      val inQuery = graft.operators.ScaleOps.joinEstimate(
        ka.toDF("o_orderkey"), kb.toDF("l_orderkey")).head()
      assert(stored.getAs[Long]("est_join_rows") ==
        inQuery.getAs[Long]("est_join_rows"), s"trial $trial est")
      assert(stored.getAs[Long]("n_a") == ka.size.toLong &&
        stored.getAs[Long]("n_b") == kb.size.toLong, s"trial $trial n")
    }
  }

  test("textCollocation (+stored +incremental): lift columns equal the driver formula on random corpora") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(123)
    val vocab = Vector("aa", "bb", "cc", "dd")
    for (trial <- 1 to 2) {
      val docs = (1L to 60L).map { id =>
        (id, Seq.fill(3 + rnd.nextInt(10))(vocab(rnd.nextInt(vocab.size)))
          .mkString(" "))
      }
      val df = docs.toDF("doc_id", "text")
      val out = graft.operators.TextOps.textCollocation(df, k = 50, minCount = 1L)
        .collect().map(r => r.getString(0) ->
          (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
      // driver recompute
      val toks = docs.map(_._2.split(" ").toSeq)
      val uni = toks.flatten.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val bis = toks.flatMap(ws => ws.zip(ws.tail))
        .groupBy(identity).view.mapValues(_.size.toLong).toMap
      val nW = bis.values.sum
      out.foreach { case (pair, (fp, f1, f2, nw, lift)) =>
        val Array(t1, t2) = pair.split(" ")
        assert((fp, f1, f2, nw) == ((bis((t1, t2)), uni(t1), uni(t2), nW)),
          s"trial $trial $pair counts")
        assert(lift == 10000L * fp * nW / (f1 * f2), s"trial $trial $pair lift")
      }
      // stored face: identical rows
      val dir = java.nio.file.Files
        .createTempDirectory(s"graft-rnd-coll-$trial").toString
      graft.operators.TextOps.buildPosIndex(df, dir, nBuckets = 8)
      val stored = graft.operators.TextOps
        .textCollocationStored(s, dir, k = 50, minCount = 1L)
        .collect().map(r => r.getString(0) ->
          (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
      assert(stored.toSeq == out.toSeq, s"trial $trial stored ≠ in-query")
    }
  }

  test("proximitySearchStored: NEAR counts equal the driver sliding recompute on random corpora") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(127)
    val vocab = Vector("xx", "yy", "zz", "ww", "vv")
    val docs = (1L to 50L).map { id =>
      (id, Seq.fill(4 + rnd.nextInt(8))(vocab(rnd.nextInt(vocab.size)))
        .mkString(" "))
    }
    val df = docs.toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft-rnd-prox").toString
    graft.operators.TextOps.buildPosIndex(df, dir, nBuckets = 8)
    val w = 4
    val out = graft.operators.TextOps
      .proximitySearchStored(s, dir, nPairs = 3, window = w, nBuckets = 8)
      .collect().map(r => r.getString(0) -> (r.getLong(2), r.getLong(3))).toMap
    val toks = docs.map(_._2.split(" ").toSeq)
    out.foreach { case (pair, (nDocs, nOcc)) =>
      val Array(t1, t2) = pair.split(" ")
      val per = toks.map { ws =>
        val p1 = ws.zipWithIndex.filter(_._1 == t1).map(_._2)
        val p2 = ws.zipWithIndex.filter(_._1 == t2).map(_._2)
        p1.map(a => p2.count(b => b > a && b <= a + w)).sum.toLong
      }
      assert((nDocs, nOcc) == ((per.count(_ > 0).toLong, per.sum)), pair)
    }
    assert(out.nonEmpty)
  }

  test("sortable bits: order preservation and round-trip on random bit patterns") {
    val rnd = new scala.util.Random(121)
    val doubles = Seq.fill(4000) {
      // random BIT PATTERNS cover exponent/mantissa space far better
      // than uniform random values
      java.lang.Double.longBitsToDouble(rnd.nextLong())
    }.filterNot(_.isNaN)
    val H = graft.functions.HashImpls
    doubles.foreach { d =>
      val rt = H.sortableBitsToDouble(H.doubleSortableBits(d))
      assert(java.lang.Double.doubleToLongBits(rt) ==
        java.lang.Double.doubleToLongBits(d), s"round-trip $d")
    }
    val sortedByBits = doubles.sortBy(H.doubleSortableBits)
    val sortedByValue = doubles.sortWith(_ < _)
    // both orders agree wherever < is total (no NaN kept)
    assert(sortedByBits.map(java.lang.Double.doubleToLongBits) ==
      sortedByValue.map(java.lang.Double.doubleToLongBits))
  }
}
