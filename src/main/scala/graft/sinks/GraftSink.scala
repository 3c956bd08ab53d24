package graft.sinks

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.util.LongAccumulator

/** DataFrame-level sink facade: the user-facing assembly of the
  * pipeline the reference builds by hand (batch → serialize → append
  * with retries/splitting), executed distributed via foreachPartition
  * with Spark accumulators carrying the reference's metric surface
  * (metric/BigQueryStreamMetrics.java) back to the driver.
  */
object GraftSink {

  /** Driver-visible totals, backed by accumulators (executor updates
    * survive task retries per Spark's accumulator semantics for
    * actions). */
  final case class Totals(batches: Long, bytes: Long, splits: Long, retries: Long, rows: Long)

  /** At-least-once append of `df` to `transport` (rows serialized with
    * `JsonRowSerializer`), batching per partition with the greedy
    * count/bytes trigger, splitting oversized appends, retrying
    * transient failures. Returns driver-side totals. */
  def writeAtLeastOnce(df: DataFrame, table: TableRef, settings: WriterSettings,
                       transport: Seq[Array[Byte]] => Unit): Totals = {
    val sc = df.sparkSession.sparkContext
    val batches = sc.longAccumulator("graft.sink.batches")
    val bytes = sc.longAccumulator("graft.sink.bytes")
    val splits = sc.longAccumulator("graft.sink.splits")
    val retries = sc.longAccumulator("graft.sink.retries")
    val rows = sc.longAccumulator("graft.sink.rows")

    df.foreachPartition { (it: Iterator[Row]) =>
      val serializer = new JsonRowSerializer
      val metrics = new SinkMetrics
      val writer = new AtLeastOnceWriter[Array[Byte]](
        transport, b => b.length.toLong, settings.maxAppendBytes,
        settings.retry.maxRetries, metrics)
      val buf = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
      var bufBytes = 0L
      def flush(): Unit = if (buf.nonEmpty) {
        writer.write(RowBatch.defaultStream(buf.toList, table))
        rows.add(buf.size.toLong)
        buf.clear(); bufBytes = 0
      }
      it.foreach { row =>
        val payload = serializer.serialize(row)
        buf += payload
        bufBytes += payload.length
        if (buf.size >= settings.maxBatchCount || bufBytes >= settings.maxBatchBytes) flush()
      }
      flush()
      batches.add(metrics.batchCount)
      bytes.add(metrics.batchSizeBytes)
      splits.add(metrics.splitBatchCount)
      retries.add(metrics.appendRetries)
    }
    Totals(batches.value, bytes.value, splits.value, retries.value, rows.value)
  }
}
