package graft


/** A/B harness for the dupClusters loop-shuffle right-sizing (SURVEY
  * §8e): alternates `graft.clusters.autosize` on/off in ONE JVM so the
  * arms share warmup and box conditions — the between-JVM variance on
  * this box (±50%+) would otherwise swamp the delta. Run manually:
  *
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "runMain graft.ClustersDelta"
  */
object ClustersDelta {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Sessions.local()
    val docs = Tables.documents(spark, sfDir)
    docs.count() // warm parquet footers

    def run(): Double = {
      spark.sharedState.cacheManager.clearCache()
      val t0 = System.nanoTime()
      graft.operators.Dedup.dedupClusters(docs).count()
      (System.nanoTime() - t0) / 1e9
    }
    run() // shared JIT/codegen warmup, discarded

    // interleave arms: 3 samples each, alternating, so slow drift in
    // box conditions hits both arms equally
    val samples = (1 to 3).flatMap { _ =>
      System.setProperty("graft.clusters.autosize", "false")
      val off = run()
      System.setProperty("graft.clusters.autosize", "true")
      val on = run()
      Seq("off" -> off, "on" -> on)
    }
    val on = samples.collect { case ("on", t) => t }
    val off = samples.collect { case ("off", t) => t }
    println(f"""{"autosize_on_best":${on.min}%.2f,"autosize_off_best":${off.min}%.2f,""" +
      f""""on_samples":[${on.map(t => f"$t%.2f").mkString(",")}],""" +
      f""""off_samples":[${off.map(t => f"$t%.2f").mkString(",")}]}""")
    spark.stop()
  }
}
