package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** The graft_kll quantile summary's contract: worst-case rank error
  * within the certified integer bound (H+2)·n/(k−1) for EVERY
  * percentile, on adversarial layouts (sorted, reversed, all-equal,
  * heavy ties) and under forced multi-partition merges; total weight
  * preserved exactly (n rides the summary); the stream face's union
  * of epoch summaries obeys the whole-corpus bound; and the SQL face
  * resolves. */
class KllSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def entriesOf(vals: Seq[Long], k: Int, parts: Int): Seq[(Int, Long)] = {
    val spark = this.spark
    import spark.implicits._
    vals.toDF("v").repartition(parts)
      .agg(graft.functions.F.kllSketch(col("v"), k).as("sk"))
      .select(explode(col("sk")).as("e"))
      .select(col("e.lvl"), col("e.v"))
      .collect().toSeq.map(r => (r.getInt(0), r.getLong(1)))
  }

  private def bound(n: Long, k: Int): Long = {
    val x = math.max(n / (k - 1), 1L)
    val h = 63 - java.lang.Long.numberOfLeadingZeros(x) // floor(log2 x)
    ((h + 2) * n + (k - 2)) / (k - 1)
  }

  /** Estimated value at target rank r: min summary value whose
    * cumulative weight (entries sorted by value) reaches r. */
  private def estAt(entries: Seq[(Int, Long)], r: Long): Long = {
    val sorted = entries.map { case (lvl, v) => (v, 1L << lvl) }.sortBy(_._1)
    var cum = 0L
    for ((v, w) <- sorted) { cum += w; if (cum >= r) return v }
    sorted.last._1
  }

  private def checkAllPercentiles(vals: Seq[Long], k: Int, parts: Int,
                                  what: String): Unit = {
    val entries = entriesOf(vals, k, parts)
    val n = vals.size.toLong
    assert(entries.map { case (lvl, _) => 1L << lvl }.sum == n,
      s"$what: compaction must preserve total weight exactly")
    val b = bound(n, k)
    val sortedVals = vals.sorted
    for (p <- 1 to 99) {
      val r = (p * n + 99) / 100
      val est = estAt(entries, r)
      // exact rank window of the estimate: [count(< est)+1, count(<= est)]
      val le = sortedVals.count(_ <= est).toLong
      val lt = sortedVals.count(_ < est).toLong
      assert(le >= r - b && lt <= r + b,
        s"$what p$p: est $est has exact rank window (${lt + 1}..$le), " +
          s"target $r, certified bound $b, n $n")
    }
  }

  test("rank error within the certified bound on adversarial layouts and merge shapes") {
    val k = 64
    val n = 20000
    val rnd = new scala.util.Random(7)
    val layouts = Seq(
      "sorted" -> (0 until n).map(_.toLong),
      "reversed" -> (0 until n).map(i => (n - i).toLong),
      "all-equal" -> Seq.fill(n)(42L),
      "heavy-ties" -> (0 until n).map(i => (i % 5).toLong),
      "random-dups" -> Seq.fill(n)(rnd.nextInt(300).toLong),
      "zipf-ish" -> (0 until n).map(i => (n / (1 + i % 140)).toLong))
    for ((what, vals) <- layouts; parts <- Seq(1, 7, 32))
      checkAllPercentiles(vals, k, parts, s"$what/parts=$parts")
  }

  test("tiny inputs (below one compaction) are exact") {
    val entries = entriesOf(Seq(5L, 1L, 3L), 64, 2)
    assert(entries.forall(_._1 == 0) && entries.map(_._2).sorted == Seq(1L, 3L, 5L),
      s"n < k keeps every value at level 0: $entries")
  }

  test("kllStream epochs union to a summary obeying the whole-corpus bound") {
    val spark = this.spark
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val k = 64
    val dir = java.nio.file.Files.createTempDirectory("graft-kll-stream").toString
    val epochs = Seq(
      (0 until 6000).map(_.toLong),
      (0 until 5000).map(i => (2 * i + 1).toLong),
      Seq.fill(4000)(77L))
    val mem = MemoryStream[Long]
    val q = graft.operators.ScaleOps.kllStream(mem.toDF().toDF("v"), dir, k)
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("graft-kll-ck").toString)
      .start()
    try {
      epochs.foreach { e => mem.addData(e: _*); q.processAllAvailable() }
    } finally q.stop()

    val merged = graft.operators.ScaleOps.kllMerged(spark, dir)
      .collect().toSeq.map(r => (r.getInt(0), r.getLong(1)))
    val all = epochs.flatten
    val n = all.size.toLong
    assert(merged.map { case (lvl, _) => 1L << lvl }.sum == n,
      "union of epoch summaries carries exact total weight")
    val b = bound(n, k)
    val sortedVals = all.sorted
    for (p <- Seq(1, 10, 25, 50, 75, 90, 99)) {
      val r = (p * n + 99) / 100
      val est = estAt(merged, r)
      val le = sortedVals.count(_ <= est).toLong
      val lt = sortedVals.count(_ < est).toLong
      assert(le >= r - b && lt <= r + b,
        s"merged p$p: est $est rank window (${lt + 1}..$le) vs target $r ± $b")
    }

    // the certification face over the stored summaries agrees with the
    // in-query face's contract: every within_bound is true
    val cents = all.toDF("cents")
    val entries = merged.toDF("lvl", "v")
    val report = graft.operators.ScaleOps.kllQuantileReport(cents, entries, k)
      .collect()
    assert(report.length == 5 && report.forall(_.getAs[Boolean]("within_bound")),
      s"stored-face certification must hold: ${report.mkString(", ")}")
  }

  test("grouped certification: per-group bounds hold incl. a sub-k exact group and a 1000x-skewed group") {
    val spark = this.spark
    import spark.implicits._
    val k = 64
    val rnd = new scala.util.Random(11)
    val rows =
      (0 until 30000).map(i => ("big", (rnd.nextInt(5000) * 7).toLong)) ++
      (0 until 30).map(i => ("tiny", i.toLong)) ++          // n < k: exact
      (0 until 3000).map(_ => ("ties", 42L))                // all-equal group
    val cents = rows.toDF("grp", "cents")
    val entries = cents.groupBy(col("grp"))
      .agg(graft.functions.F.kllSketch(col("cents"), k).as("sk"))
      .select(col("grp"), explode(col("sk")).as("e"))
      .select(col("grp"), col("e.lvl").as("lvl"), col("e.v").as("v"))
    val report = graft.operators.ScaleOps
      .kllQuantileReportGrouped(cents, entries, k).collect()
    assert(report.length == 15, "3 groups x 5 targets")
    assert(report.forall(_.getAs[Boolean]("within_bound")),
      s"every per-group certificate must hold: ${report.mkString(", ")}")
    // per-group n and exact order statistics are the real thing
    val byGrp = report.groupBy(_.getString(0))
    assert(byGrp("tiny").forall(_.getAs[Long]("n") == 30L))
    assert(byGrp("ties").forall(_.getAs[Long]("exact_value") == 42L))
    val bigSorted = rows.filter(_._1 == "big").map(_._2).sorted
    val p50 = byGrp("big").find(_.getString(1) == "p50").get
    assert(p50.getAs[Long]("exact_value") ==
      bigSorted((p50.getAs[Long]("target_rank") - 1).toInt),
      "grouped exact_value is the true per-group order statistic")
  }

  test("sliding windows certify per anchor and react when a shifted day enters the window") {
    val spark = this.spark
    import spark.implicits._
    val rnd = new scala.util.Random(13)
    // 10 days of value ~ N(10, 1); day 6 is shifted to ~ N(1000, 1)
    val rows = (1 to 10).flatMap { d =>
      val base = if (d == 6) 1000.0 else 10.0
      (0 until 400).map { i =>
        (java.sql.Timestamp.valueOf(f"2024-03-$d%02d 12:00:00"),
          base + rnd.nextGaussian())
      }
    }.toDF("ts", "value")
      .withColumn("event_id", monotonically_increasing_id())
    val out = graft.operators.ScaleOps
      .quantileSliding(rows, k = 64, windowDays = 3).collect()
    assert(out.length == 10 * 5, "10 anchors x 5 labels")
    assert(out.forall(_.getAs[Boolean]("within_bound")),
      "every window certificate must hold")
    val p75 = out.filter(_.getString(1) == "p75")
      .map(r => (r.getDate(0).toString, r.getAs[Long]("exact_value"))).toMap
    // 3-day windows: day 6's shifted values are >1/3 of windows 6..8,
    // so their p75 jumps to the shifted mode; window 5 and 9 don't
    assert(p75("2024-03-05") < 200000L && p75("2024-03-09") < 200000L,
      s"unshifted windows stay at the base mode: $p75")
    assert(Seq("2024-03-06", "2024-03-07", "2024-03-08")
      .forall(d => p75(d) > 5000000L),
      s"windows containing day 6 must surface the shift: $p75")
  }

  test("merged faces plan ONE scan regardless of epoch count (multi-path read)") {
    val spark = this.spark
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-kll-plan").toString
    for (b <- 0 until 12)
      Seq((0, b.toLong)).toDF("lvl", "v").write.parquet(s"$dir/delta-b$b")
    val merged = graft.operators.ScaleOps.kllMerged(spark, dir)
    assert(merged.count() == 12L)
    val plan = merged.queryExecution.executedPlan.toString
    assert("FileScan parquet|BatchScan".r.findAllIn(plan).size == 1,
      s"12 epochs must still plan one scan node:\n$plan")
    assert(plan.contains("12 paths"),
      s"the one scan's file index holds every epoch:\n$plan")
    assert(!plan.contains("Union"),
      "no union branch per epoch in the merged face")
  }

  test("SQL face graft_kll resolves and matches the Column face") {
    val spark = this.spark
    import spark.implicits._
    graft.functions.F.register(spark)
    Seq(1L, 2L, 3L, 4L).toDF("v").createOrReplaceTempView("kll_in")
    val viaSql = spark.sql(
      "SELECT graft_kll(v, 64) AS sk FROM kll_in")
      .select(explode(col("sk")).as("e")).select(col("e.v"))
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(viaSql == Seq(1L, 2L, 3L, 4L))
  }

  test("SQL faces graft_double_sortable_bits / graft_sortable_bits_to_double resolve and round-trip") {
    val spark = this.spark
    import spark.implicits._
    graft.functions.F.register(spark)
    Seq(-2.5, -0.0, 0.0, 3.75).toDF("d").createOrReplaceTempView("bits_in")
    val rt = spark.sql(
      "SELECT graft_sortable_bits_to_double(graft_double_sortable_bits(d)) AS r FROM bits_in")
      .collect().map(r => java.lang.Double.doubleToLongBits(r.getDouble(0))).toSeq
    assert(rt == Seq(-2.5, -0.0, 0.0, 3.75).map(java.lang.Double.doubleToLongBits))
  }

  test("sortable bits: exact round-trip and order preservation on negatives, subnormals, infinities, ±0") {
    val spark = this.spark
    import spark.implicits._
    val adversarial = Seq(
      Double.NegativeInfinity, -Double.MaxValue, -1.5e300, -2.0, -1.0,
      -Double.MinPositiveValue, -0.0, 0.0, Double.MinPositiveValue,
      java.lang.Double.longBitsToDouble(0x000fffffffffffffL), // max subnormal
      1.0, 2.0, 1.5e300, Double.MaxValue, Double.PositiveInfinity)
    // bits order == double order, strictly (incl. -0.0 < +0.0)
    val bits = adversarial.map(graft.functions.HashImpls.doubleSortableBits)
    assert(bits == bits.sorted, "mapping must preserve the IEEE total order")
    assert(bits.distinct == bits, "distinct doubles must map to distinct bits")
    // exact round-trip, driver-side and through the codegen'd column
    adversarial.foreach { d =>
      val rt = graft.functions.HashImpls.sortableBitsToDouble(
        graft.functions.HashImpls.doubleSortableBits(d))
      assert(java.lang.Double.doubleToLongBits(rt) ==
        java.lang.Double.doubleToLongBits(d), s"round-trip broke $d -> $rt")
    }
    val viaCol = adversarial.toDF("d")
      .select(graft.functions.F.sortableBitsToDouble(
        graft.functions.F.doubleSortableBits(col("d"))).as("rt"))
      .collect().map(r => java.lang.Double.doubleToLongBits(r.getDouble(0))).toSeq
    assert(viaCol == adversarial.map(java.lang.Double.doubleToLongBits))
  }

  test("quantileSketchDouble: certified quantiles on a fractional column with negatives and subnormals") {
    val spark = this.spark
    import spark.implicits._
    val rnd = new scala.util.Random(47)
    val vals = Seq.tabulate(4000)(i => i match {
      case x if x % 13 == 0 => -rnd.nextDouble() * 1e6   // negatives
      case x if x % 997 == 0 => Double.MinPositiveValue  // subnormal
      case _ => rnd.nextDouble() * 1e3
    })
    val events = vals.toDF("value").repartition(7)
    val out = graft.operators.ScaleOps.quantileSketchDouble(events, k = 128)
      .collect()
    assert(out.length == 5)
    val sorted = vals.sorted
    out.foreach { r =>
      val target = r.getAs[Long]("target_rank")
      // exact_value IS the input order statistic, bit-for-bit
      val expect = sorted((target - 1).toInt)
      assert(java.lang.Double.doubleToLongBits(r.getAs[Double]("exact_value")) ==
        java.lang.Double.doubleToLongBits(expect),
        s"${r.getAs[String]("q_label")}: got ${r.getAs[Double]("exact_value")}, want $expect")
      assert(r.getAs[Boolean]("within_bound"),
        s"${r.getAs[String]("q_label")} estimate outside the certified bound")
      assert(r.getAs[Long]("n") == vals.size.toLong)
    }
  }

  test("quantileSketchStored: certified report from hash-slice epoch summaries matches the in-query face") {
    val spark = this.spark
    import spark.implicits._
    val rnd = new scala.util.Random(53)
    val orders = Seq.tabulate(3000)(i =>
      (i.toLong, 1.0 + rnd.nextInt(100000) / 100.0))
      .toDF("o_orderkey", "o_totalprice")
    val dir = java.nio.file.Files.createTempDirectory("graft-kll-st").toString
    graft.operators.ScaleOps.ensureKllSketch(orders, dir, k = 128, nEpochs = 4)
    val stored = graft.operators.ScaleOps
      .quantileSketchStored(orders, dir, k = 128).collect().toSeq
    val direct = graft.operators.ScaleOps
      .quantileSketch(orders, k = 128).collect().toSeq
    // every gated column is summary-independent or theorem-certified:
    // the stored report equals the in-query one even though the two
    // summaries differ
    assert(stored == direct, s"stored=$stored direct=$direct")
    assert(stored.forall(_.getAs[Boolean]("within_bound")))
  }

  test("graft_kll over DECIMAL and DOUBLE inputs does not crash (documented truncation semantics)") {
    val spark = this.spark
    import spark.implicits._
    // DECIMAL: Spark's Decimal is not a java.lang.Number — needs its
    // own update arm (the ADVICE regression)
    val dec = Seq("1.9", "2.2", "3.7").toDF("s")
      .select(col("s").cast("decimal(10,2)").as("v"))
      .agg(graft.functions.F.kllSketch(col("v"), 64).as("sk"))
      .select(explode(col("sk")).as("e")).select(col("e.v"))
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(dec == Seq(1L, 2L, 3L), s"decimal truncates toward zero: $dec")
    val dbl = Seq(-1.9, 2.7).toDF("v")
      .agg(graft.functions.F.kllSketch(col("v"), 64).as("sk"))
      .select(explode(col("sk")).as("e")).select(col("e.v"))
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(dbl == Seq(-1L, 2L), s"double truncates toward zero: $dbl")
  }
}
