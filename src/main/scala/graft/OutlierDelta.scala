package graft

/** A/B harness for the embeddingOutliers candidate-cut (r12):
  * alternates cutThreshold = MaxValue (global-window arm) vs 0
  * (histogram-cut arm) in ONE JVM so the arms share warmup and box
  * conditions — the BeamDelta/BpeDelta discipline. Both arms produce
  * identical output; the registered query picks the arm by corpus
  * size (the size-adaptive branch this harness measured: window
  * 0.58 s vs cut 0.99 s at sf0.1's 2k vectors — the cut only pays for
  * itself once the corpus dwarfs its fixed stages). Run manually:
  *
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "runMain graft.OutlierDelta"
  */
object OutlierDelta {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Sessions.local()
    val emb = Tables.embeddings(spark, sfDir)
    emb.count() // warm parquet footers

    def run(cutThreshold: Long): Double = {
      spark.sharedState.cacheManager.clearCache()
      val t0 = System.nanoTime()
      graft.operators.Ann.embeddingOutliers(emb, cutThreshold = cutThreshold).count()
      (System.nanoTime() - t0) / 1e9
    }
    run(Long.MaxValue); run(0L) // shared JIT/codegen warmup, discarded

    val samples = (1 to 4).flatMap { _ =>
      Seq(("window", run(Long.MaxValue)), ("cut", run(0L)))
    }
    val w = samples.filter(_._1 == "window").map(_._2)
    val c = samples.filter(_._1 == "cut").map(_._2)
    println(f"OUTLIERDELTA window(best=${w.min}%.2f samples=${w.map(s => f"$s%.2f").mkString(",")}) " +
      f"cut(best=${c.min}%.2f samples=${c.map(s => f"$s%.2f").mkString(",")})")
    spark.stop()
  }
}
