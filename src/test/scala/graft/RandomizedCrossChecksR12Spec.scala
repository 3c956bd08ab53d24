package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-12 randomized net. First property: the `graft_kll`
  * DOUBLE/DECIMAL update arms TRUNCATE toward zero (documented in
  * KllAgg) — this pins exactly what that truncation means for
  * percentiles on sign-mixed data: truncation is a MONOTONE map, so
  * it commutes with order statistics (the truncated domain's exact
  * rank-r value IS trunc(the double domain's exact rank-r value) —
  * `quantileSketchDouble`'s exact path), and the KLL certificate
  * still holds verbatim on the truncated domain. */
class RandomizedCrossChecksR12Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("CM inner product sums near/past 2^63: decimal internals stay exact; a final past 2^63 fails loudly, never wraps") {
    val s = spark
    import s.implicits._
    // cells hold ~n/width counts at corpus scale; individual products
    // fit LONG but their row-sum brushes 2^63 — the regime where LONG
    // arithmetic dies mid-sum (ANSI) or silently wraps (legacy)
    def tbl(cells: Seq[(Int, Long, Long)]) = cells.toDF("row", "cell", "cnt")
    val two = tbl(Seq((0, 0L, 2000000000L), (0, 1L, 2000000000L)))
    val fits = graft.operators.ScaleOps.cmInnerProductEst(two, two, depth = 1)
      .head()
    // 2 * (2e9)^2 = 8e18 < 2^63: exact through the decimal path (a
    // LONG sum would have needed both products AND the sum in range —
    // here they are, but three cells below push the sum over)
    assert(fits.getLong(0) == 8000000000000000000L, fits.toString)
    val three = tbl(Seq((0, 0L, 2000000000L), (0, 1L, 2000000000L),
      (0, 2L, 2000000000L)))
    // 1.2e19 > 2^63: the decimal sum is exact; the final BIGINT cast
    // fails LOUDLY under ANSI — the estimate domain is the declared
    // schema's, and `width` is the knob that keeps real deployments
    // inside it. What must never happen is a wrapped negative
    // masquerading as a small join.
    val e = intercept[Throwable] {
      graft.operators.ScaleOps.cmInnerProductEst(three, three, depth = 1).head()
    }
    assert(e.toString.toLowerCase.contains("overflow"), e.toString)
  }

  test("graft_kll truncating arms (DOUBLE, DECIMAL): certified bounds hold and percentiles equal trunc(exact double path)") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(1213)
    for (trial <- 1 to 2) {
      val n = 1200 + rnd.nextInt(1500)
      val vals = Seq.fill(n)(rnd.nextInt(4) match {
        case 0 => -math.exp(rnd.nextDouble() * 18) // large negatives
        case 1 => -rnd.nextDouble() * 3            // small negatives
        case 2 => rnd.nextDouble() * 1e6
        case _ => rnd.nextDouble() * 7              // integer-bucket ties
      })
      val df = vals.toDF("value").repartition(4)
      // the double face's exact path: bit-exact order statistics
      val exactDouble = graft.operators.ScaleOps
        .quantileSketchDouble(df, k = 128)
        .collect().map(r => r.getAs[String]("q_label") ->
          r.getAs[Double]("exact_value")).toMap
      for (arm <- Seq("double", "decimal")) {
        val vcol =
          if (arm == "double") col("value")
          else col("value").cast("decimal(28,6)")
        // the truncated domain the arm actually sketches
        val cents = df.select(vcol.cast("bigint").as("cents"))
        val entries = df
          .agg(graft.functions.F.kllSketch(vcol, 128).as("sk"))
          .select(explode(col("sk")).as("e"))
          .select(col("e.lvl").as("lvl"), col("e.v").as("v"))
        val report = graft.operators.ScaleOps
          .kllQuantileReport(cents, entries, k = 128)
          .collect()
        assert(report.length == 5, s"$arm trial $trial")
        report.foreach { r =>
          val label = r.getAs[String]("q_label")
          assert(r.getAs[Boolean]("within_bound"),
            s"$arm trial $trial $label: certificate must hold on the truncated domain")
          // truncation commutes with order statistics
          assert(r.getAs[Long]("exact_value") == exactDouble(label).toLong,
            s"$arm trial $trial $label: truncated exact != trunc(double exact)")
        }
      }
    }
  }

  test("ngram query-set derivation: stored statsN path equals the window path on random corpora") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(1217)
    val vocab = Array("ape", "bee", "cat", "dog", "elk", "fox")
    for (trial <- 1 to 3) {
      val docs = (1 to 25 + rnd.nextInt(15)).map { i =>
        (i.toLong, Seq.fill(5 + rnd.nextInt(11))(
          vocab(rnd.nextInt(vocab.length))).mkString(" "))
      }.toDF("doc_id", "text")
      val ns = Seq(2, 3, 4, 5)
      // stored path: every requested length has a stats table
      val stored = java.nio.file.Files
        .createTempDirectory(s"graft-nq-s$trial").toString
      graft.operators.TextOps.buildPosIndex(docs, stored, nBuckets = 16,
        statsNs = Seq(3, 4, 5))
      // window path: same index, statsN sentinels torn away so every
      // length falls back to the n-1-lead-window derivation over the
      // postings (the pre-r12 shape) — outputs must be identical
      val windowed = java.nio.file.Files
        .createTempDirectory(s"graft-nq-w$trial").toString
      graft.operators.TextOps.buildPosIndex(docs, windowed, nBuckets = 16,
        statsNs = Seq(3, 4, 5))
      Seq(2, 3, 4, 5).foreach { n =>
        new java.io.File(s"$windowed/stats$n/_SUCCESS").delete()
      }
      val a = graft.operators.TextOps.phraseSearchNgramStored(s, stored, ns, perN = 3,
        nBuckets = 16).collect().toSeq
      val b = graft.operators.TextOps.phraseSearchNgramStored(s, windowed, ns, perN = 3,
        nBuckets = 16).collect().toSeq
      assert(a == b, s"trial $trial: stored=$a window=$b")
      assert(a.nonEmpty)
    }
  }

  test("range offsets: every completed epoch delivers exactly once under random completion orders, holes stay bounded") {
    import graft.sources.EpochRangeOffset
    val rnd = new scala.util.Random(1219)
    for (trial <- 1 to 25) {
      val n = 5 + rnd.nextInt(40)
      val arrival = rnd.shuffle((0L until n.toLong).toVector)
      var offset = EpochRangeOffset.initial
      var delivered = Vector.empty[Long]
      var completed = Set.empty[Long]
      var maxHoles = 0
      arrival.grouped(1 + rnd.nextInt(4)).foreach { batch =>
        completed ++= batch
        val next = EpochRangeOffset.advance(offset, completed)
        val fresh = EpochRangeOffset.fresh(offset, next)
        assert(fresh.forall(sq => !delivered.contains(sq)),
          s"trial $trial: re-delivery in $fresh after $delivered")
        delivered ++= fresh
        maxHoles = math.max(maxHoles, next.holes.size)
        offset = next
      }
      assert(delivered.sorted == (0L until n.toLong),
        s"trial $trial: delivered ${delivered.sorted} != 0..${n - 1}")
      assert(offset.holes.isEmpty,
        s"trial $trial: holes must drain at the fixed point")
      // a hole only exists while a lower seq is outstanding — bounded
      // by the out-of-orderness, never the epoch count
      assert(maxHoles < n, s"trial $trial")
      // idempotent at the fixed point
      assert(EpochRangeOffset.advance(offset, completed) == offset)
    }
  }
}
