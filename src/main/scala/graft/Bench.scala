package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every SparkEntry query on SPARK_GRAFT_SF_DIR,
  * prints ONE JSON line {"metric":...} (driver contract). A warmup
  * action first absorbs session/codegen/parquet-footer startup so
  * per-query numbers measure the operators, not JVM warmup.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Warmup: touch the fact table and force one codegen'd agg + shuffle.
    Tables.lineitem(spark, sfDir).groupBy("l_returnflag").count().count()

    // best-of-2: absorbs one-off JIT/IO noise per query, still honest
    // end-to-end runs (the driver reads per-query seconds + the total).
    // Operators may persist() intermediate signature tables internally;
    // the cache is cleared between runs so every timed run pays the
    // full compute (and cached blocks don't accumulate across 61
    // queries). A failing query is recorded under "errors" and fails
    // the whole bench with a nonzero exit — a broken query must never
    // silently deflate the total.
    var errors = Map.empty[String, String]
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val times = (1 to 2).map { _ =>
        spark.sharedState.cacheManager.clearCache()
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count() } catch {
          case e: Throwable =>
            errors += name -> s"${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(200)}"
        }
        (System.nanoTime() - t0) / 1e9
      }
      name -> times.min
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.map(_._2).sum else 0.0
    val errJson =
      if (errors.isEmpty) ""
      else errors.toSeq.sorted.map { case (k, v) =>
        "\"" + k + "\":\"" + v.replaceAll("[\"\\\\\n\r\t]", " ") + "\""
      }.mkString(",\"errors\":{", ",", "}")
    val line = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs$errJson,"sf":"$sfDir"}"""
    println(line)
    // Belt-and-suspenders for the driver's parser: also drop the bare
    // JSON to a file so the result survives any log decoration.
    try {
      java.nio.file.Files.write(
        java.nio.file.Paths.get("bench.json"),
        (line + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    } catch { case _: Throwable => () }
    spark.stop()
    if (errors.nonEmpty) {
      System.err.println(s"BENCH FAILED: ${errors.size} queries threw: " +
        errors.keys.toSeq.sorted.mkString(", "))
      sys.exit(1)
    }
  }
}
