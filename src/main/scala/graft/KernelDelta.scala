package graft


/** Measures the fast-vs-portable kernel delta (SURVEY §9): the
  * `portable = true` md5 variants exist so the DuckDB oracle can
  * recompute signatures bit-for-bit; the xxhash/splitmix fast paths are
  * the production default. Run manually:
  *
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "runMain graft.KernelDelta"
  */
object KernelDelta {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Sessions.local()
    val docs = Tables.documents(spark, sfDir)
    docs.count() // warm parquet footers

    // best-of-2 with a cache clear per run, mirroring graft.Bench — the
    // first run in a fresh JVM otherwise pays JIT/codegen warmup
    def timed(name: String)(action: => Long): String = {
      var rows = 0L
      val secs = (1 to 2).map { _ =>
        spark.sharedState.cacheManager.clearCache()
        val t0 = System.nanoTime()
        rows = action
        (System.nanoTime() - t0) / 1e9
      }
      f""""$name":{"sec":${secs.min}%.2f,"rows":$rows}"""
    }

    val results = Seq(
      timed("fingerprint_portable") {
        graft.operators.Dedup.dedupFingerprint(docs, portable = true).count()
      },
      timed("fingerprint_fast") {
        graft.operators.Dedup.dedupFingerprint(docs, portable = false).count()
      },
      timed("simhash_portable") {
        graft.operators.Dedup.dedupSimhash(docs, portable = true).count()
      },
      timed("simhash_fast") {
        graft.operators.Dedup.dedupSimhash(docs, portable = false).count()
      })
    println(results.mkString("{", ",", "}"))
    spark.stop()
  }
}
