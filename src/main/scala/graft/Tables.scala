package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Typed loaders for the driver-generated TPC-H-ish testdata.
  *
  * Each loader is a plain parquet scan: column pruning and predicate
  * pushdown are left to Catalyst (callers `select`/`filter` and the
  * optimizer pushes into the scan — verified in RelationalSpec via
  * `PushedFilters` in the formatted plan).
  */
object Tables {
  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame     = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = load(s, d, "lineitem")
  /** `events.ts` has shipped in two physical layouts across testdata
    * generations: TIMESTAMP(NANOS) (which Spark's vectorized reader
    * rejects — read nanos as long via the legacy conf and truncate) and
    * plain TIMESTAMP(MICROS) (arrives as TIMESTAMP_NTZ). Normalize both
    * to a microsecond session-TZ TimestampType column so downstream
    * operators and the DuckDB oracle agree on semantics (session TZ is
    * pinned to UTC in Sessions/TestSpark, so NTZ→LTZ is lossless). */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = load(s, d, "events")
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.LongType
    raw.schema("ts").dataType match {
      // `div`, not `/`: long `/` is double division, and at epoch-nanos
      // magnitude (~1.7e18, double ULP 256ns) the truncated microsecond
      // can drift +/-1us from DuckDB's exact integer truncation —
      // enough to reorder near-simultaneous events under a ts sort
      case LongType => raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case _        => raw.withColumn("ts", col("ts").cast("timestamp"))
    }
  }
  def documents(s: SparkSession, d: String): DataFrame  = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
