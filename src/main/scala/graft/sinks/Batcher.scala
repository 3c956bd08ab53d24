package graft.sinks

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.{ExpressionEncoder, RowEncoder}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Batch assembly — the Spark re-expression of the reference's
  * `BatchTrigger` (process/BatchTrigger.java:33-59: fire on count limit
  * OR accumulated byte size) + `RowBatcher` (process/RowBatcher.java).
  *
  * Flink fires per-key window triggers as records arrive; the batch
  * analog is a deterministic greedy scan per key in arrival order.
  * Implemented as repartition(key) + sortWithinPartitions(key, order) +
  * a single mapPartitions pass — one shuffle, O(1) state per key,
  * arbitrarily many keys per partition, no driver involvement: the
  * same plan shape works at 100 TB.
  */
object Batcher {

  /** Greedy trigger over one key's ordered records: returns batch ids.
    * A record fires the batch *it joins* when the count limit is
    * reached, or when accumulated bytes cross maxBytes (reference
    * semantics: size check happens after adding the element, count
    * check fires on the element completing the batch). */
  private[graft] def greedyAssign(sizes: Iterator[Long], maxCount: Long, maxBytes: Long): Iterator[Long] = {
    var batchId = -1L
    var count = 0L
    var bytes = 0L
    sizes.map { sz =>
      if (batchId < 0) { batchId = 0 }
      count += 1
      bytes += sz
      val cur = batchId
      if (count >= maxCount || bytes >= maxBytes) {
        batchId += 1; count = 0; bytes = 0
      }
      cur
    }
  }

  /** Assigns every record a `batch_id` within its key, firing on count
    * or byte size. `sizeCol` is the record's serialized-size estimate
    * (BigQueryRecord.getSize analog). Output = input columns + batch_id.
    */
  def assignBatches(df: DataFrame, keyCol: String, orderCol: String, sizeCol: String,
                    maxCount: Long, maxBytes: Long = Long.MaxValue): DataFrame = {
    val spark = df.sparkSession
    val outSchema = StructType(df.schema.fields :+ StructField("batch_id", LongType, nullable = false))
    val keyIdx = df.schema.fieldIndex(keyCol)
    val sizeIdx = df.schema.fieldIndex(sizeCol)
    val encoder = RowEncoder.encoderFor(outSchema)
    val sorted = df.repartition(col(keyCol)).sortWithinPartitions(col(keyCol), col(orderCol))
    sorted.mapPartitions { it =>
      var curKey: Any = null
      var first = true
      var count = 0L
      var bytes = 0L
      var batchId = 0L
      it.map { row =>
        val k = row.get(keyIdx)
        if (first || k != curKey) { curKey = k; first = false; count = 0; bytes = 0; batchId = 0 }
        val sz = row.get(sizeIdx) match {
          case l: Long => l
          case i: Int => i.toLong
          case other => other.toString.toLong
        }
        count += 1
        bytes += sz
        val cur = batchId
        if (count >= maxCount || bytes >= maxBytes) { batchId += 1; count = 0; bytes = 0 }
        Row.fromSeq(row.toSeq :+ cur)
      }
    }(encoder)
  }
}
