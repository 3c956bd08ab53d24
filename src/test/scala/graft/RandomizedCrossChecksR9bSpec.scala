package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.{Ann, ScaleOps}

/** Randomized cross-checks for the round-9 additions: KMV set-op
  * integers, exact heavy hitters, the zonemap block table, and the
  * binary-rerank degenerate case all replay against brute-force Scala
  * references on random inputs. Fixed seeds: failures reproduce. */
class RandomizedCrossChecksR9bSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("KMV integer columns match brute force on random segmented key sets") {
    val spark = this.spark
    import spark.implicits._
    val rnd = new scala.util.Random(2203)
    def kmvHash(key: Long): Long =
      java.lang.Long.parseLong(md5hex(s"$key:kmv").take(12), 16)
    for (trial <- 1 to 6) {
      val k = Seq(4, 8, 16)(rnd.nextInt(3))
      // guaranteed non-empty sides, overlapping domains, nulls, and a
      // third priority the operator must ignore
      val rows = Seq(("1-URGENT", Option(0L)), ("2-HIGH", Option(1L))) ++
        (0 until 40 + rnd.nextInt(80)).map { _ =>
          (Seq("1-URGENT", "2-HIGH", "3-MEDIUM")(rnd.nextInt(3)),
            if (rnd.nextInt(10) == 0) Option.empty[Long]
            else Option(rnd.nextInt(30).toLong))
        }
      val aKeys = rows.filter(r => r._1 == "1-URGENT" && r._2.nonEmpty)
        .map(_._2.get).distinct
      val bKeys = rows.filter(r => r._1 == "2-HIGH" && r._2.nonEmpty)
        .map(_._2.get).distinct
      val skA = aKeys.map(kmvHash).sorted.take(k)
      val skB = bKeys.map(kmvHash).sorted.take(k)
      val skU = (skA ++ skB).distinct.sorted.take(k)
      val overlap = skU.count(h => skA.contains(h) && skB.contains(h)).toLong
      val want = Seq(k.toLong, skA.size.toLong, skB.size.toLong, skU.size.toLong,
        skA.max, skB.max, skU.max, overlap,
        aKeys.size.toLong, bKeys.size.toLong,
        (aKeys ++ bKeys).distinct.size.toLong,
        (aKeys.toSet & bKeys.toSet).size.toLong)
      val r = ScaleOps.kmvSetOps(
        rows.toDF("o_orderpriority", "o_custkey"), k = k).head()
      val got = (0 until 12).map(i => r.getLong(i))
      assert(got == want, s"trial $trial k=$k: $got vs $want")
    }
  }

  test("heavy hitters match the exact recompute on random skewed corpora and layouts") {
    val spark = this.spark
    import spark.implicits._
    val rnd = new scala.util.Random(2309)
    for (trial <- 1 to 6) {
      val s = 3 + rnd.nextInt(6)
      val vocab = (0 until 12).map(i => s"w$i")
      // skewed: word i drawn with weight ~ 1/(i+1)
      val toks = (0 until 150 + rnd.nextInt(300)).map { _ =>
        vocab(math.min(rnd.nextInt(rnd.nextInt(12) + 1), 11))
      }
      val n = toks.size.toLong
      val want = toks.groupBy(identity).view.mapValues(_.size.toLong)
        .filter { case (_, c) => c * (s + 1) > n }
        .map { case (t, c) => (t, c, 10000L * c / n) }
        .toSeq.sortBy(_._1)
      val docs = toks.grouped(7).zipWithIndex
        .map { case (g, i) => (i.toLong, g.mkString(" ")) }.toSeq
        .toDF("doc_id", "text").repartition(1 + rnd.nextInt(7))
      val got = ScaleOps.heavyHitters(docs, s = s).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
      assert(got == want, s"trial $trial s=$s n=$n: $got vs $want")
    }
  }

  test("heavy earners match the exact weight recompute on random corpora and layouts") {
    val spark = this.spark
    import spark.implicits._
    val rnd = new scala.util.Random(2903)
    for (trial <- 1 to 6) {
      val s = 3 + rnd.nextInt(6)
      val langs = (0 until 10).map(i => s"l$i")
      // skewed weights with zero/negative junk sprinkled in
      val rows = (0 until 120 + rnd.nextInt(200)).map { _ =>
        (langs(math.min(rnd.nextInt(rnd.nextInt(10) + 1), 9)),
          rnd.nextInt(120).toLong - 10L)
      }
      val wTotal = rows.filter(_._2 > 0).map(_._2).sum
      val want = rows.filter(_._2 > 0).groupBy(_._1)
        .view.mapValues(_.map(_._2).sum)
        .filter { case (_, w) => w * (s + 1) > wTotal }
        .map { case (l, w) => (l, w, 10000L * w / wTotal) }
        .toSeq.sortBy(_._1)
      val docs = rows.zipWithIndex.map { case ((l, w), i) => (i.toLong, l, w) }
        .toDF("doc_id", "lang", "n_chars").repartition(1 + rnd.nextInt(7))
      val got = ScaleOps.heavyEarners(docs, s = s).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
      assert(got == want, s"trial $trial s=$s W=$wTotal: $got vs $want")
    }
  }

  test("zonemap block table matches brute force on random dates and keys") {
    val spark = this.spark
    import spark.implicits._
    val rnd = new scala.util.Random(2411)
    val epoch = java.time.LocalDate.parse("1992-01-01")
    for (trial <- 1 to 4) {
      val blockDays = 7 + rnd.nextInt(60)
      // pre-epoch dates included: negative day counts must FLOOR to
      // their block in both engines (div-vs-// sign divergence pin)
      val rows = (0 until 50 + rnd.nextInt(150)).map { _ =>
        (epoch.plusDays(rnd.nextInt(4500).toLong - 500L), rnd.nextInt(5000).toLong)
      }
      val want = rows.groupBy { case (d, _) =>
          Math.floorDiv(
            java.time.temporal.ChronoUnit.DAYS.between(epoch, d), blockDays.toLong) }
        .map { case (b, g) =>
          val ds = g.map(_._1); val ks = g.map(_._2)
          (b, g.size.toLong, ds.min.toString, ds.max.toString, ks.min, ks.max,
            ds.max.isBefore(java.time.LocalDate.parse("1996-01-01")) ||
              !ds.min.isBefore(java.time.LocalDate.parse("1996-07-01")),
            ks.max < 1000L || ks.min >= 2000L)
        }.toSeq.sortBy(_._1)
      val df = rows.map { case (d, okey) =>
        (java.sql.Timestamp.valueOf(d.atStartOfDay()), okey)
      }.toDF("l_shipdate", "l_orderkey")
      val got = ScaleOps.zonemapPrune(df, blockDays = blockDays).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDate(2).toString,
          r.getDate(3).toString, r.getLong(4), r.getLong(5),
          r.getBoolean(6), r.getBoolean(7))).toSeq
      assert(got == want, s"trial $trial blockDays=$blockDays")
    }
  }

  test("M4 downsampling matches brute force on random series with planted ties") {
    val spark = this.spark
    import spark.implicits._
    val rnd = new scala.util.Random(3407)
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime
    for (trial <- 1 to 5) {
      // coarse value/time grids force duplicate values AND instants
      val rows = (0 until 120 + rnd.nextInt(200)).map { i =>
        (i.toLong,
          t0 + rnd.nextInt(5) * 86400_000L + rnd.nextInt(6) * 3600_000L,
          Seq("click", "view")(rnd.nextInt(2)),
          rnd.nextInt(4) * 0.5)
      }
      val want = rows.groupBy { case (_, ms, s, _) =>
          (s, java.time.Instant.ofEpochMilli(ms)
            .atZone(java.time.ZoneOffset.UTC).toLocalDate.toString) }
        .map { case ((s, d), g) =>
          val pts = g.map { case (id, ms, _, v) =>
            (ms * 1000L, id, math.round(v * 1e4)) } // (us, id, v_bp)
          val f = pts.minBy(p => (p._1, p._2, p._3))
          val l = pts.maxBy(p => (p._1, p._2, p._3))
          val mn = pts.minBy(p => (p._3, p._1, p._2))
          val mx = pts.maxBy(p => (p._3, p._1, p._2))
          (s, d, pts.size.toLong, f._1, f._2, f._3, l._1, l._2, l._3,
            mn._3, mn._1, mn._2, mx._3, mx._1, mx._2)
        }.toSeq.sortBy(r => (r._1, r._2))
      val df = rows.map { case (id, ms, s, v) =>
        (id, new java.sql.Timestamp(ms), s, v) }
        .toDF("event_id", "ts", "event_type", "value")
        .repartition(1 + rnd.nextInt(6))
      val got = ScaleOps.m4Downsample(df).collect().map(r =>
        (r.getString(0), r.getDate(1).toString, r.getLong(2), r.getLong(3),
          r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7), r.getLong(8),
          r.getLong(9), r.getLong(10), r.getLong(11), r.getLong(12),
          r.getLong(13), r.getLong(14))).toSeq
      assert(got == want, s"trial $trial")
    }
  }

  test("binary rerank with a corpus-wide shortlist degenerates to exact bruteforce") {
    val spark = this.spark
    import spark.implicits._
    val rnd = new scala.util.Random(2503)
    for (trial <- 1 to 3) {
      val n = 60 + rnd.nextInt(60)
      val df = (0 until n).map(i =>
        (i.toLong, Array.fill(64)(rnd.nextGaussian().toFloat)))
        .toDF("vec_id", "embedding")
      val exact = Ann.annBruteforce(df, k = 5, stride = 10)
        .collect().map(_.toString).toSeq
      val bin = Ann.annBinaryRerank(df, k = 5, stride = 10, shortlist = n)
        .collect().map(_.toString).toSeq
      assert(bin == exact, s"trial $trial n=$n: a corpus-wide shortlist " +
        "must reproduce the exact ranking bit-for-bit")
    }
  }
}
