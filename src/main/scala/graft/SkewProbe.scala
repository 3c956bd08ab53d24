package graft

import org.apache.spark.sql.functions._

/** Hot-key skew probe (SURVEY §8j): plants a pathological key — every
  * event replicated `copies`× under one synthetic user, so that key
  * alone carries copies× the whole corpus — and times the single-window
  * operators against their salted two-phase re-plans (§2e-47p/47q),
  * checking result equality on the way. The unsalted window sorts the
  * hot key's rows in ONE task; the salted plan's phase 1 spreads them
  * across (key, day-bucket) slices. Not part of the driver gate; run
  * manually:
  *
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "runMain graft.SkewProbe"
  */
object SkewProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val copies = sys.env.getOrElse("SPARK_GRAFT_SKEW_COPIES", "10").toInt
    val spark = Sessions.local()

    val events = Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_id"), col("ts"), col("event_type"))
    val n = events.count()
    // the hot key: copies x all events under user -1, event ids unique,
    // timestamps jittered per copy so ordering stays non-degenerate
    val hot = (0 until copies).map { c =>
      events.select(lit(-1L).as("user_id"),
        (col("event_id") * copies + c).as("event_id"),
        (col("ts") + expr(s"INTERVAL $c SECOND")).as("ts"), col("event_type"))
    }.reduce(_ unionAll _)
    val skewed = events.unionByName(hot)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val total = skewed.count()
    println(s"[skewprobe] base=$n rows, skewed=$total rows, hot key carries ${copies}x corpus")

    def timed(name: String)(action: => Long): Long = {
      val runs = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        val rows = action
        ((System.nanoTime() - t0) / 1e9, rows)
      }
      println(f"[skewprobe] $name best=${runs.map(_._1).min}%.2f s rows=${runs.head._2}")
      runs.head._2
    }

    // sessionization: plain single window vs two-phase salted
    val sPlain = timed("q32_sessions_hotkey") {
      operators.Relational.q32Sessions(skewed).count()
    }
    val sSalted = timed("sessions_salted_hotkey") {
      operators.ScaleOps.sessionsSalted(skewed).count()
    }
    require(sPlain == sSalted, s"session counts diverge: $sPlain vs $sSalted")
    val dPlain = operators.Relational.q32Sessions(skewed)
      .agg(sum(col("duration_sec")), sum(col("n_events"))).head()
    val dSalted = operators.ScaleOps.sessionsSalted(skewed)
      .agg(sum(col("duration_sec")), sum(col("n_events"))).head()
    require(dPlain == dSalted, s"session rollups diverge: $dPlain vs $dSalted")

    // as-of: probe the hot key too (orders re-keyed to -1 in part)
    val orders = Tables.orders(spark, sfDir)
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"))
    val probes = orders.unionByName(
        orders.select((col("o_orderkey") + 100000000L).as("o_orderkey"),
          lit(-1L).as("o_custkey"), col("o_orderdate")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    probes.count()
    // time an aggregate that CONSUMES the joined payload — a bare
    // count() lets Catalyst prune the window away (the probe filter
    // needs only is_probe), which would time an empty plan
    def asofRollup(df: org.apache.spark.sql.DataFrame) =
      df.agg(count(lit(1)), count(col("last_event_id")),
        sum(col("staleness_us"))).head()
    var xPlain: org.apache.spark.sql.Row = null
    var xSalted: org.apache.spark.sql.Row = null
    timed("q63_asof_hotkey") {
      xPlain = asofRollup(operators.Relational.q63AsofJoin(skewed, probes))
      xPlain.getLong(0)
    }
    timed("asof_salted_hotkey") {
      xSalted = asofRollup(operators.ScaleOps.asofSalted(skewed, probes))
      xSalted.getLong(0)
    }
    require(xPlain == xSalted, s"as-of rollups diverge: $xPlain vs $xSalted")

    // sink batching under the same hot key (day buckets): different
    // policies (batch-grain crossing-closes), so compare coverage +
    // batch count, not ids
    val sized = skewed.select(col("user_id"), col("event_id"),
      unix_micros(col("ts")).as("us"),
      (pmod(col("event_id"), lit(900L)) + 100L).as("sz"))
      .withColumn("bkt", expr("us div 86400000000"))
    val bPlain = timed("batcher_hotkey") {
      sinks.Batcher.assignBatches(sized, "user_id", "us", "sz",
        maxCount = 1000L, maxBytes = 500000L).count()
    }
    val bSalted = timed("batcher_salted_hotkey") {
      sinks.Batcher.assignBatchesSalted(sized, "user_id", "us", "sz", "bkt",
        maxCount = 1000L, maxBytes = 500000L).count()
    }
    require(bPlain == bSalted && bPlain == total,
      s"batchers must cover every record once: $bPlain vs $bSalted vs $total")
    println("[skewprobe] salted results verified equal to single-window plans")
    spark.stop()
  }
}
