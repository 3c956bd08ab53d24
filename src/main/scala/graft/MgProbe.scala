package graft

import org.apache.spark.sql.functions._

/** High-cardinality heavy-hitter probe (SURVEY §8j): synthesizes a
  * corpus whose key domain dwarfs the hitters — `coldKeys` singleton-ish
  * keys around a handful of genuinely heavy ones — and times the
  * two-pass Misra–Gries operator (§2e-47w: bounded-state candidate
  * sweep + broadcast-candidate exact count) against the naive full
  * groupBy/HAVING, checking result equality on the way. The naive plan
  * shuffles the ENTIRE key domain; the MG plan shuffles
  * partitions·(s+1) summary rows plus the few candidates' partial
  * counts — the gap that becomes the job at 100 TB key cardinality.
  * Not part of the driver gate; run manually:
  *
  *   sbt "runMain graft.MgProbe"            # 20M rows, 5M cold keys
  *   SPARK_GRAFT_MG_ROWS=40000000 sbt "runMain graft.MgProbe"
  */
object MgProbe {
  def main(args: Array[String]): Unit = {
    val rows = sys.env.getOrElse("SPARK_GRAFT_MG_ROWS", "20000000").toLong
    val coldKeys = sys.env.getOrElse("SPARK_GRAFT_MG_COLD", "5000000").toLong
    val s = 30
    val spark = Sessions.local()
    import spark.implicits._

    // 20% of rows spread over 4 hot tokens, 80% over `coldKeys` cold
    // ones — hot shares ~5% each, all above 1/(s+1) ≈ 3.2%
    val docs = spark.range(rows).select(
      when(col("id") % 5 === 0, concat(lit("hot"), col("id") % 4))
        .otherwise(concat(lit("c"), col("id") % coldKeys)).as("text"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    println(s"[mgprobe] rows=${docs.count()} coldKeys=$coldKeys s=$s")

    def timed(name: String)(action: => Seq[(String, Long)]): Seq[(String, Long)] = {
      val runs = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        val out = action
        ((System.nanoTime() - t0) / 1e9, out)
      }
      println(f"[mgprobe] $name best=${runs.map(_._1).min}%.2f s rows=${runs.head._2.size}")
      runs.head._2
    }

    // naive: full key-domain groupBy + HAVING
    val naive = timed("full_groupby") {
      val toks = docs.select(col("text").as("tok"))
      val n = toks.count()
      toks.groupBy(col("tok")).agg(count(lit(1)).as("cnt"))
        .filter(col("cnt") * (s + 1) > n)
        .orderBy(col("tok"))
        .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    }

    // the mapPartitions kernel variant (per-partition summaries — the
    // deterministic-bytes face the STREAM operators use), two-pass
    import spark.implicits._
    val mg = timed("mg_mappartitions_two_pass") {
      val toks = docs.select(col("text").as("tok"))
      val sk = operators.ScaleOps.mgCandidates(toks.as[String], s).collect()
      val n = sk.filter(_.isNullAt(0)).map(_.getLong(1)).sum
      val cands = sk.filter(!_.isNullAt(0)).map(_.getString(0)).distinct.toSeq
      toks.filter(col("tok").isin(cands: _*))
        .groupBy(col("tok")).agg(count(lit(1)).as("cnt"))
        .filter(col("cnt") * (s + 1) > n)
        .orderBy(col("tok"))
        .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    }
    require(mg == naive, s"MG two-pass diverged: $mg vs $naive")

    // the graft_mg aggregate variant: same two-pass, but the candidate
    // sweep runs as a TypedImperativeAggregate with native map-side
    // partials — no Dataset ser/deser hop
    val agg = timed("mg_aggregate_two_pass") {
      val toks = docs.select(col("text").as("tok"))
      val sk = toks.agg(functions.F.mgSketch(col("tok"), lit(1L), s).as("sk"))
        .select(explode(col("sk")).as("c"))
        .select(col("c.tok").as("tok"), col("c.cnt").as("cnt"))
        .collect()
      val n = sk.filter(_.isNullAt(0)).map(_.getLong(1)).sum
      val cands = sk.filter(!_.isNullAt(0)).map(_.getString(0)).toSeq
      toks.filter(col("tok").isin(cands: _*))
        .groupBy(col("tok")).agg(count(lit(1)).as("cnt"))
        .filter(col("cnt") * (s + 1) > n)
        .orderBy(col("tok"))
        .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    }
    require(agg == naive, s"aggregate two-pass diverged: $agg vs $naive")
    println(s"[mgprobe] results verified equal: ${mg.map(_._1).mkString(", ")}")

    // the 100 TB metric: rows crossing the exchange. The naive partial
    // agg emits one row per (partition, distinct key) — ≈ the key
    // domain; MG emits partitions·(s+1) summary rows + the candidates'
    // partial counts. Local wall time hides this (a single-box shuffle
    // is memcpy); on a network the exchange IS the job.
    import spark.implicits._
    val naiveShuffled = docs.select(col("text").as("tok"))
      .groupBy(spark_partition_id().as("p"), col("tok")).agg(count(lit(1)))
      .count()
    val mgShuffled = operators.ScaleOps.mgCandidates(
      docs.select(col("text").as("tok")).as[String], s).count()
    println(s"[mgprobe] exchange rows: naive=$naiveShuffled " +
      s"mg=$mgShuffled (${naiveShuffled / math.max(mgShuffled, 1)}x reduction)")
    spark.stop()
  }
}
