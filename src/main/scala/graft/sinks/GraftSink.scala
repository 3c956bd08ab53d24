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

  /** Keyed at-least-once append: each row routes to its key's write
    * stream through the pooled writer registry — the full reference
    * pipeline (key → stream name, one live writer per stream,
    * recreate-on-closed, per-stream batching, retry) distributed via
    * foreachPartition. `newWriter` builds a stream's transport (a real
    * deployment opens a gRPC append stream here). */
  def writeKeyedAtLeastOnce(df: DataFrame, keyCol: String, table: TableRef,
                            settings: WriterSettings,
                            newWriter: String => BatchAppender[Array[Byte]]): Totals = {
    val sc = df.sparkSession.sparkContext
    val batches = sc.longAccumulator("graft.sink.batches")
    val bytes = sc.longAccumulator("graft.sink.bytes")
    val retries = sc.longAccumulator("graft.sink.retries")
    val writersCreated = sc.longAccumulator("graft.sink.writersCreated")
    val rows = sc.longAccumulator("graft.sink.rows")
    val keyIdx = df.schema.fieldIndex(keyCol)

    df.foreachPartition { (it: Iterator[Row]) =>
      val serializer = new JsonRowSerializer
      val metrics = new SinkMetrics
      val appender = new PooledStreamAppender[Array[Byte]](newWriter,
        settings.retry.maxRetries, metrics)
      val bufs = scala.collection.mutable.Map.empty[String, scala.collection.mutable.ArrayBuffer[Array[Byte]]]
      val bufBytes = scala.collection.mutable.Map.empty[String, Long]
      def flush(stream: String): Unit = bufs.get(stream).filter(_.nonEmpty).foreach { b =>
        appender.append(stream, b.toList)
        batches.add(1)
        bytes.add(bufBytes(stream))
        rows.add(b.size.toLong)
        b.clear(); bufBytes(stream) = 0
      }
      try {
        it.foreach { row =>
          val stream = s"${table.fullPath}/streams/${row.get(keyIdx)}"
          val payload = serializer.serialize(row)
          val b = bufs.getOrElseUpdate(stream, scala.collection.mutable.ArrayBuffer.empty)
          b += payload
          bufBytes(stream) = bufBytes.getOrElse(stream, 0L) + payload.length
          if (b.size >= settings.maxBatchCount ||
              bufBytes(stream) >= settings.maxBatchBytes) flush(stream)
        }
        bufs.keys.toSeq.foreach(flush)
        retries.add(metrics.appendRetries)
        writersCreated.add(appender.pool.createdCount)
      } finally appender.close()
    }
    Totals(batches.value, bytes.value, 0L, retries.value, rows.value)
  }
}
