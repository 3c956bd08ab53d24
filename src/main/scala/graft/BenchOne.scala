package graft

/** Targeted per-query timing: `runMain graft.BenchOne name1 name2 ...`
  * times just those SparkEntry queries on SPARK_GRAFT_SF_DIR with the
  * same protocol as [[Bench]] (warmup, cache cleared between runs,
  * best-of-3, effective parallelism) — the tool for chasing ONE
  * query's regression without paying the full 186-query sweep. */
object BenchOne {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    require(args.nonEmpty, "usage: BenchOne <queryName>...")
    val unknown = args.toSet.diff(SparkEntry.queries.keySet)
    require(unknown.isEmpty, s"unknown: ${unknown.mkString(", ")}")
    val spark = Sessions.local()
    Tables.lineitem(spark, sfDir).groupBy("l_returnflag").count().count()
    def cpu(): Double =
      java.lang.management.ManagementFactory.getOperatingSystemMXBean
        .asInstanceOf[com.sun.management.OperatingSystemMXBean].getProcessCpuTime / 1e9
    args.foreach { name =>
      val runs = (1 to 3).map { _ =>
        spark.sharedState.cacheManager.clearCache()
        val c0 = cpu(); val t0 = System.nanoTime()
        SparkEntry.queries(name)(spark, sfDir).count()
        val wall = (System.nanoTime() - t0) / 1e9
        (wall, (cpu() - c0) / math.max(wall, 1e-9))
      }
      val best = runs.minBy(_._1)
      println(f"BENCHONE $name best=${best._1}%.2f s par=${best._2}%.1f " +
        s"samples=${runs.map(r => f"${r._1}%.2f").mkString(",")}")
    }
    spark.stop()
  }
}
