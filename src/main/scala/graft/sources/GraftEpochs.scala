package graft.sources

import java.util

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.connector.catalog.Table
import org.apache.spark.sql.connector.catalog.TableProvider
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetTable
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.operators.StoredArtifacts

/** `format("graft-epochs")` — the stored-epoch families (sketch
  * deltas, index appends, CDC logs) as first-class DataSource V2
  * tables: the provider resolves the COMPLETED epoch set at planning
  * time (the `_SUCCESS`-sentinel + has-data contract of
  * [[StoredArtifacts.listEpochs]], through the Hadoop FileSystem that
  * owns the path — torn and empty epochs are invisible, exactly as
  * the programmatic merged faces see them) and hands the multi-path
  * set to Spark's own parquet table implementation. Every FileTable
  * capability comes free and AS ONE SCAN over all epochs: column
  * pruning, predicate pushdown, file coalescing — where the
  * equivalent programmatic union plans one scan node per epoch.
  * Scope: the flat epoch families (sketch deltas, CDC logs, signature
  * indexes — every `delta-b*`/`b*` layout the stream faces write).
  * PARTITION-dir index families (IVF/PQ `list_id=*` epochs) are
  * heterogeneous partition roots, which one Spark FileIndex cannot
  * merge (CONFLICTING_DIRECTORY_STRUCTURES, by design) — their
  * stored probes already plan a partition-pruned scan per epoch,
  * which IS Spark's own plan for that layout. SQL users read a
  * living sketch directory with zero graft code on the classpath
  * beyond this jar:
  *
  * {{{
  *   spark.read.format("graft-epochs")
  *     .option("path", sketchDir)          // the family dir
  *     .option("table", "lists")           // optional base table
  *     .option("prefix", "delta-b")        // epoch prefix (default)
  *     .load()
  * }}}
  *
  * Read-only by design: epochs are written by the stream faces'
  * replay-idempotent per-epoch overwrite contract, which a generic
  * table write cannot honor. */
class GraftEpochs extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-epochs"
  override def supportsExternalMetadata(): Boolean = true

  /** Base table (when named) + completed epoch dirs, resolved NOW —
    * a snapshot: an epoch landing mid-query is simply not in this
    * read, the same isolation the programmatic faces give. The
    * snapshot PINS at planning time: a loaded (and especially a
    * cached) table keeps the epoch list it was planned with for its
    * whole lifetime — call `.load()` again for a fresh snapshot of a
    * living family. */
  private def resolvePaths(options: CaseInsensitiveStringMap): Seq[String] = {
    val spark = SparkSession.active
    val dir = Option(options.get("path")).getOrElse(throw new IllegalArgumentException(
      "graft-epochs requires option 'path' (the epoch family directory)"))
    val prefix = Option(options.get("prefix")).getOrElse("delta-b")
    val base = Option(options.get("table")).map { t =>
      val p = s"$dir/$t"
      require(StoredArtifacts.exists(spark, s"$p/_SUCCESS"),
        s"graft-epochs: base table '$t' under $dir has no _SUCCESS sentinel " +
          "(torn or absent build)")
      p
    }.toSeq
    val epochs = StoredArtifacts.listEpochs(spark, dir, prefix)
    val paths = base ++ epochs
    require(paths.nonEmpty,
      s"graft-epochs: no completed epochs under $dir (prefix '$prefix')")
    paths
  }

  private def mkTable(options: CaseInsensitiveStringMap,
                      schema: Option[StructType]): ParquetTable =
    ParquetTable("graft-epochs", SparkSession.active, options,
      resolvePaths(options), schema, classOf[ParquetFileFormat])

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    mkTable(options, None).schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    mkTable(new CaseInsensitiveStringMap(properties), Option(schema))
}
