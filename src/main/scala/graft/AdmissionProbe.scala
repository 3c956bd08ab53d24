package graft

import org.apache.spark.sql.functions._

/** Stored-admission probe (SURVEY §8o): measures what the round-12
  * sketch substrate buys a 100 TB planner — at growing corpus
  * multiples, the STORED admission estimate (two ≤ depth·width-row
  * sketch-dir reads) holds a flat wall while the in-query estimate
  * (sketch both corpora per question) grows with the corpus, and the
  * round-12 fingerprint STAMP turns artifact-dir resolution from a
  * corpus-column scan (cold, once per source version) into a
  * metadata read (warm, every query after). Estimates are verified
  * equal along the way (CM merge is exact, so the stored sketch IS
  * the in-query sketch). Not part of the driver gate; run manually:
  *
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "runMain graft.AdmissionProbe"
  */
object AdmissionProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val multiples = sys.env.getOrElse("SPARK_GRAFT_ADM_COPIES", "1,5,25")
      .split(",").map(_.trim.toInt).toSeq
    val spark = Sessions.local()
    import operators.ScaleOps

    def bestOf3(action: => Unit): Double =
      (1 to 3).map { _ =>
        val t = System.nanoTime(); action; (System.nanoTime() - t) / 1e9
      }.min

    val oBase = Tables.orders(spark, sfDir)
      .select(col("o_orderkey").cast("string").as("k")).filter(col("k").isNotNull)
    val lBase = Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey").cast("string").as("k")).filter(col("k").isNotNull)

    multiples.foreach { c =>
      // replicated key corpora ON DISK (a real corpus isn't a cached
      // in-memory frame)
      val root = java.nio.file.Files
        .createTempDirectory(s"graft-admprobe-$c").toString
      def replicate(df: org.apache.spark.sql.DataFrame, path: String) = {
        (0 until c).map(i => df.select(concat(col("k"), lit("#" + i)).as("k")))
          .reduce(_ unionByName _).write.mode("overwrite").parquet(path)
        spark.read.parquet(path)
      }
      val ka = replicate(oBase, s"$root/a")
      val kb = replicate(lBase, s"$root/b")
      val (na, nb) = (ka.count(), kb.count())

      // dir resolution: cold = fingerprint scan + stamp write (the
      // call that will build); warm = stamp read (every later query)
      val tCold = { val t = System.nanoTime()
        ScaleOps.defaultCmSketchDir(ka, s"admprobe$c", "a")
        (System.nanoTime() - t) / 1e9 }
      val tWarm = bestOf3(ScaleOps.defaultCmSketchDir(ka, s"admprobe$c", "a"))

      val dirA = ScaleOps.ensureCmSketch(ka,
        ScaleOps.defaultCmSketchDir(ka, s"admprobe$c", "a"))
      val dirB = ScaleOps.ensureCmSketch(kb,
        ScaleOps.defaultCmSketchDir(kb, s"admprobe$c", "b"))

      var estStored = -1L
      val tStored = bestOf3 {
        estStored = ScaleOps.joinEstimateStored(spark, dirA, dirB)
          .head().getAs[Long]("est_join_rows")
      }
      var estInQuery = -1L
      val tInQuery = bestOf3 {
        estInQuery = ScaleOps.cmInnerProductEst(
          ScaleOps.cmTableOf(ka, 4, 512), ScaleOps.cmTableOf(kb, 4, 512), 4)
          .head().getAs[Long]("est_join_rows")
      }
      require(estStored == estInQuery,
        s"stored and in-query estimates diverge: $estStored vs $estInQuery")
      println(f"[admprobe] x$c%-3d n_a=$na%,d n_b=$nb%,d | stored-est " +
        f"$tStored%.2f s | in-query-est $tInQuery%.2f s | dir cold " +
        f"$tCold%.2f s, warm $tWarm%.3f s | est=$estStored%,d (verified equal)")
    }
    spark.stop()
  }
}
