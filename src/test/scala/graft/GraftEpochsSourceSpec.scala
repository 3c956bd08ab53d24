package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** The graft-epochs DataSource V2 table: completed-epoch resolution
  * (sentinel + has-data, torn/empty invisible), base-table inclusion,
  * ONE scan node over all epochs (vs a union branch per epoch), and
  * predicate pushdown + column pruning reaching the parquet reader. */
class GraftEpochsSourceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def freshDir(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  test("reads exactly the completed epochs; torn and empty dirs are invisible") {
    val spark = this.spark
    import spark.implicits._
    val dir = freshDir("graft-epochs-read")
    Seq((1L, "a"), (2L, "b")).toDF("id", "v").write.parquet(s"$dir/delta-b0")
    Seq((3L, "c")).toDF("id", "v").write.parquet(s"$dir/delta-b1")
    // torn epoch: data but no sentinel
    Seq((9L, "x")).toDF("id", "v").write.parquet(s"$dir/delta-b2")
    assert(new java.io.File(s"$dir/delta-b2/_SUCCESS").delete())
    // sentinel but no data
    val empty = new java.io.File(s"$dir/delta-b3")
    assert(empty.mkdirs() && new java.io.File(empty, "_SUCCESS").createNewFile())
    // unrelated dir (wrong prefix) is not an epoch
    Seq((8L, "y")).toDF("id", "v").write.parquet(s"$dir/centroids")

    val got = spark.read.format("graft-epochs").option("path", dir).load()
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got == Set((1L, "a"), (2L, "b"), (3L, "c")),
      s"completed delta-b* epochs only: $got")
  }

  test("base table + epochs plan as ONE scan with predicate pushdown") {
    val spark = this.spark
    import spark.implicits._
    val dir = freshDir("graft-epochs-sketch")
    // a flat 'sketch' base + two delta epochs — the stored-KMV layout
    Seq(("a", 1L), ("a", 2L), ("b", 3L)).toDF("side", "h")
      .write.parquet(s"$dir/sketch")
    Seq(("a", 10L)).toDF("side", "h").write.parquet(s"$dir/delta-b0")
    Seq(("b", 20L)).toDF("side", "h").write.parquet(s"$dir/delta-b1")

    val df = spark.read.format("graft-epochs")
      .option("path", dir).option("table", "sketch").load()
    assert(df.collect().map(_.getLong(1)).toSet ==
      Set(1L, 2L, 3L, 10L, 20L), "base + every epoch, one table")

    // one scan node over all three dirs — the plan the union faces
    // cannot make (one BatchScan vs an exchange-feeding union branch
    // per epoch): the at-scale argument for the connector
    val plan = df.queryExecution.executedPlan.toString
    assert("BatchScan".r.findAllIn(plan).size == 1,
      s"one BatchScan over the multi-path set expected:\n$plan")

    // predicate pushdown on a data column reaches the parquet reader
    val pushed = df.filter(col("h") > 9L)
    val pushedPlan = pushed.queryExecution.toString
    assert(pushedPlan.contains("GreaterThan(h,9)"),
      s"h predicate must push to the parquet scan:\n$pushedPlan")
    assert(pushed.collect().map(_.getLong(1)).toSet == Set(10L, 20L))

    // column pruning: a single-column projection reads one column
    val prunedSchema = df.select(col("h")).queryExecution.toString
    assert(prunedSchema.contains("ReadSchema: struct<h: bigint>") ||
      prunedSchema.contains("ReadSchema: struct<h:bigint>"),
      s"projection must prune the scan schema:\n$prunedSchema")
  }

  test("missing base sentinel and empty families fail loudly; custom prefix works") {
    val spark = this.spark
    import spark.implicits._
    val dir = freshDir("graft-epochs-err")
    val e1 = intercept[Exception] {
      spark.read.format("graft-epochs").option("path", dir).load()
    }
    assert(e1.getMessage.contains("no completed epochs"))

    Seq((1L, "a")).toDF("id", "v").write.parquet(s"$dir/b0")
    // custom prefix: the Dedup/Multimodal signature-index layout
    val got = spark.read.format("graft-epochs")
      .option("path", dir).option("prefix", "b").load()
    assert(got.count() == 1L)

    val e2 = intercept[Exception] {
      spark.read.format("graft-epochs")
        .option("path", dir).option("prefix", "b")
        .option("table", "lists").load()
    }
    assert(e2.getMessage.contains("no _SUCCESS sentinel"))
  }
}
