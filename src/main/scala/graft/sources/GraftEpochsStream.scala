package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, SupportsTriggerAvailableNow}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetTable
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.operators.StoredArtifacts

/** `readStream.format("graft-epochs-stream")` — a LIVING epoch family
  * (a sketch directory the stream faces keep appending to) as a
  * Structured Streaming SOURCE: each micro-batch delivers the epochs
  * that COMPLETED since the last batch, resolved through the same
  * [[StoredArtifacts.listEpochs]] contract as every merged face
  * (`_SUCCESS` sentinel + has-data, via the Hadoop FileSystem that
  * owns the path) — torn and empty epochs are invisible, an epoch
  * becomes visible exactly once its write commits.
  *
  * OFFSETS ARE EPOCH-NAME SETS, not a high-water mark: batchId-keyed
  * names (`delta-b9`, `delta-b10`) do not sort numerically as
  * strings, and compaction may REMOVE folded deltas — set difference
  * (end − start) is correct under both, and the engine's offset log
  * replays it deterministically (exactly-once per epoch name; a
  * REWRITTEN epoch is not re-delivered, matching the families'
  * replay-overwrite-idempotency contract where a replay writes
  * identical content). Offsets are metadata-scale: epoch counts are
  * bounded by ingest batches, and compaction folds them down.
  *
  * Each batch's read delegates to Spark's own [[ParquetTable]] over
  * just the new epoch paths — the one-scan multi-path planning of the
  * batch `graft-epochs` table, per micro-batch. Like that table, the
  * scope is FLAT epoch families (partitioned IVF/PQ roots are a
  * FileIndex invariant — excluded). Read-only by the same contract.
  * Schema: pass `.schema(...)` or let it infer from the completed
  * epochs present at start (inference requires at least one).
  * COMPACTION COORDINATION: folding deltas into a base REMOVES epoch
  * dirs — vanished names never re-deliver (set difference only adds),
  * but a batch planned over a dir deleted mid-flight fails like any
  * vanished input; run compaction under the family's one-owner
  * contract, quiescing live stream readers first. */
class GraftEpochsStream extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-epochs-stream"
  override def supportsExternalMetadata(): Boolean = true

  private def familyDir(options: CaseInsensitiveStringMap): String =
    Option(options.get("path")).getOrElse(throw new IllegalArgumentException(
      "graft-epochs-stream requires option 'path' (the epoch family directory)"))

  private def prefix(options: CaseInsensitiveStringMap): String =
    Option(options.get("prefix")).getOrElse("delta-b")

  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val spark = SparkSession.active
    val dir = familyDir(options)
    val epochs = StoredArtifacts.listEpochs(spark, dir, prefix(options))
    require(epochs.nonEmpty,
      s"graft-epochs-stream: cannot infer a schema with no completed epochs " +
        s"under $dir — pass .schema(...) or write one epoch first")
    ParquetTable("graft-epochs-stream", spark, options, epochs, None,
      classOf[ParquetFileFormat]).schema
  }

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table = {
    val options = new CaseInsensitiveStringMap(properties)
    new EpochsStreamTable(schema, familyDir(options), prefix(options))
  }
}

private[sources] class EpochsStreamTable(tableSchema: StructType,
                                         dir: String, prefix: String)
    extends Table with SupportsRead {
  override def name(): String = s"graft-epochs-stream($dir)"
  override def schema(): StructType = tableSchema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.MICRO_BATCH_READ).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new Scan {
        override def readSchema(): StructType = tableSchema
        override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
          new EpochsMicroBatchStream(tableSchema, dir, prefix)
      }
    }
}

/** JSON offset carrying the delivered epoch-name set (name-sorted for
  * a canonical serialized form). Names are directory basenames —
  * quoted defensively anyway. */
private[sources] case class EpochSetOffset(names: Seq[String]) extends Offset {
  override def json(): String =
    names.sorted.map(n => "\"" + n.replace("\\", "\\\\").replace("\"", "\\\"") + "\"")
      .mkString("[", ",", "]")
}

private[sources] object EpochSetOffset {
  /** Parses exactly what [[EpochSetOffset.json]] writes. */
  def fromJson(s: String): EpochSetOffset = {
    val body = s.trim.stripPrefix("[").stripSuffix("]").trim
    if (body.isEmpty) EpochSetOffset(Nil)
    else EpochSetOffset(body.split("\",\\s*\"").toSeq
      .map(_.stripPrefix("\"").stripSuffix("\"")
        .replace("\\\"", "\"").replace("\\\\", "\\")))
  }
}

private[sources] class EpochsMicroBatchStream(tableSchema: StructType,
                                              dir: String, prefix: String)
    extends MicroBatchStream with SupportsTriggerAvailableNow {

  private def spark = SparkSession.active

  private def completedNow(): Seq[String] =
    StoredArtifacts.listEpochs(spark, dir, prefix)
      .map(p => new Path(p).getName)

  // Trigger.AvailableNow pins the target set ONCE so the run drains
  // to a fixed point even while writers keep appending
  @volatile private var availableNowTarget: Option[Seq[String]] = None
  override def prepareForTriggerAvailableNow(): Unit =
    availableNowTarget = Some(completedNow())

  override def initialOffset(): Offset = EpochSetOffset(Nil)
  override def latestOffset(): Offset =
    EpochSetOffset(availableNowTarget.getOrElse(completedNow()))
  // SupportsAdmissionControl (via SupportsTriggerAvailableNow): every
  // completed epoch is admitted — epochs are metadata-scale units
  override def getDefaultReadLimit: org.apache.spark.sql.connector.read.streaming.ReadLimit =
    org.apache.spark.sql.connector.read.streaming.ReadLimit.allAvailable()
  override def latestOffset(start: Offset,
      limit: org.apache.spark.sql.connector.read.streaming.ReadLimit): Offset =
    latestOffset()
  override def deserializeOffset(json: String): Offset =
    EpochSetOffset.fromJson(json)
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()

  // planInputPartitions and createReaderFactory are called as a pair
  // per micro-batch (MicroBatchScanExec); the factory built for the
  // planned range is handed back from the next factory call. A batch
  // with NO new epochs still gets its factory asked for (the exec
  // node probes supportColumnarReads before running) — hand back an
  // inert one; with zero partitions it is never invoked on a row.
  @volatile private var lastFactory: PartitionReaderFactory = null

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val done = start.asInstanceOf[EpochSetOffset].names.toSet
    val fresh = end.asInstanceOf[EpochSetOffset].names.filterNot(done).sorted
    if (fresh.isEmpty) { lastFactory = null; return Array.empty }
    val fs = StoredArtifacts.fsOf(spark, dir)
    val paths = fresh.map(n => fs.makeQualified(new Path(dir, n)).toString)
    val batch = ParquetTable("graft-epochs-stream", spark,
      CaseInsensitiveStringMap.empty(), paths, Some(tableSchema),
      classOf[ParquetFileFormat])
      .newScanBuilder(CaseInsensitiveStringMap.empty()).build().toBatch
    lastFactory = batch.createReaderFactory()
    batch.planInputPartitions()
  }

  override def createReaderFactory(): PartitionReaderFactory = {
    val f = lastFactory
    if (f != null) f
    else new PartitionReaderFactory {
      override def createReader(p: InputPartition) =
        throw new IllegalStateException(
          "graft-epochs-stream: reader requested for an empty micro-batch")
    }
  }
}
