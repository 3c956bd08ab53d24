package graft.sinks

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
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

  private def toLong(v: Any): Long = v match {
    case l: Long => l
    case i: Int => i.toLong
    case other => other.toString.toLong
  }

  /** THE crossing-closes trigger pass, shared by every batch-assembly
    * face (unsalted, salted phase 1, salted phase 2 — one body, so the
    * budget semantics cannot drift between them): repartition on
    * `keyCols`, sort by (keys, order), then one stateful scan that
    * accumulates `countOf`/`bytesOf` per key group and closes the
    * batch the crossing element joined. */
  private def greedyPass(df: DataFrame, keyCols: Seq[String], orderCols: Seq[Column],
                         countOf: Row => Long, bytesOf: Row => Long,
                         maxCount: Long, maxBytes: Long,
                         outSchema: StructType)(emit: (Row, Long) => Row): DataFrame = {
    val keyIdxs = keyCols.map(df.schema.fieldIndex)
    df.repartition(keyCols.map(col): _*)
      .sortWithinPartitions(keyCols.map(col) ++ orderCols: _*)
      .mapPartitions { it =>
        var curKey: Seq[Any] = null
        var first = true
        var count = 0L
        var bytes = 0L
        var batchId = 0L
        it.map { row =>
          val k = keyIdxs.map(row.get)
          if (first || k != curKey) { curKey = k; first = false; count = 0; bytes = 0; batchId = 0 }
          count += countOf(row)
          bytes += bytesOf(row)
          val cur = batchId
          if (count >= maxCount || bytes >= maxBytes) { batchId += 1; count = 0; bytes = 0 }
          emit(row, cur)
        }
      }(RowEncoder.encoderFor(outSchema))
  }

  /** Assigns every record a `batch_id` within its key, firing on count
    * or byte size. `sizeCol` is the record's serialized-size estimate
    * (BigQueryRecord.getSize analog). Output = input columns + batch_id.
    */
  def assignBatches(df: DataFrame, keyCol: String, orderCol: String, sizeCol: String,
                    maxCount: Long, maxBytes: Long = Long.MaxValue): DataFrame = {
    val outSchema = StructType(df.schema.fields :+ StructField("batch_id", LongType, nullable = false))
    val sizeIdx = df.schema.fieldIndex(sizeCol)
    greedyPass(df, Seq(keyCol), Seq(col(orderCol)),
      _ => 1L, row => toLong(row.get(sizeIdx)),
      maxCount, maxBytes, outSchema)((row, cur) => Row.fromSeq(row.toSeq :+ cur))
  }

  /** HOT-KEY-SALTED batch assembly — the sink-side analog of
    * `ScaleOps.sessionsSalted` for when `scale_window_preflight` flags
    * a sink key too hot for [[assignBatches]]' single ordered pass:
    * phase 1 runs the greedy trigger independently per (key,
    * `bucketCol`) slice — a hot key's records spread across as many
    * tasks as buckets it spans — and phase 2 re-runs the SAME
    * crossing-closes trigger at LOCAL-BATCH grain per key (rows =
    * batches + buckets, not records), gluing bucket-boundary partial
    * batches. A local batch that already crossed its budget closes
    * alone in phase 2, so away from bucket boundaries the result
    * converges to the unsalted policy, and with one bucket per key it
    * EQUALS it (spec-pinned). Budget semantics at batch grain: a
    * merged batch closes when it crosses, so overshoot is bounded by
    * one LOCAL batch instead of one record — the documented trade for
    * never serializing a key.
    *
    * Output = input columns + batch_id (final per-key id, numbered in
    * (bucket, local batch) order). */
  def assignBatchesSalted(df: DataFrame, keyCol: String, orderCol: String,
                          sizeCol: String, bucketCol: String,
                          maxCount: Long, maxBytes: Long = Long.MaxValue): DataFrame = {
    val sizeIdx = df.schema.fieldIndex(sizeCol)
    // phase 1: the record-grain trigger, salted on (key, bucket)
    val localSchema = StructType(df.schema.fields :+ StructField("local_batch", LongType, nullable = false))
    val local = greedyPass(df, Seq(keyCol, bucketCol), Seq(col(orderCol)),
      _ => 1L, row => toLong(row.get(sizeIdx)),
      maxCount, maxBytes, localSchema)((row, cur) => Row.fromSeq(row.toSeq :+ cur))
    // phase 2: the SAME trigger at local-batch grain — per key, scan
    // batches in (bucket, local) order accumulating their record
    // counts and bytes; rows here = batches + buckets per key
    val grain = local.groupBy(col(keyCol), col(bucketCol), col("local_batch"))
      .agg(count(lit(1)).as("b_count"), sum(col(sizeCol).cast("long")).as("b_bytes"))
    val mapSchema = StructType(Seq(
      grain.schema(keyCol), grain.schema(bucketCol), grain.schema("local_batch"),
      StructField("batch_id", LongType, nullable = false)))
    val gk = grain.schema.fieldIndex(keyCol)
    val gb = grain.schema.fieldIndex(bucketCol)
    val gl = grain.schema.fieldIndex("local_batch")
    val gc = grain.schema.fieldIndex("b_count")
    val gz = grain.schema.fieldIndex("b_bytes")
    val mapping = greedyPass(grain, Seq(keyCol), Seq(col(bucketCol), col("local_batch")),
      _.getLong(gc), _.getLong(gz), maxCount, maxBytes, mapSchema)(
      (row, cur) => Row.fromSeq(Seq(row.get(gk), row.get(gb), row.get(gl), cur)))
    // phase 3: records pick up their final id on the (key, bucket,
    // local_batch) join — NULL-SAFE equality, because a NULL key or
    // bucket is a legal record the unsalted trigger batches too and a
    // plain equi-join would silently drop it
    local.join(mapping.withColumnRenamed(keyCol, "__mk")
        .withColumnRenamed(bucketCol, "__mb")
        .withColumnRenamed("local_batch", "__ml"),
        col(keyCol) <=> col("__mk") && col(bucketCol) <=> col("__mb") &&
          col("local_batch") <=> col("__ml"))
      .select(df.columns.toIndexedSeq.map(col) :+ col("batch_id"): _*)
  }

  /** The sink-side preflight→mitigation router (the
    * `ScaleOps.sessionsAuto` analog): one metadata-scale
    * `scale_window_preflight` pass over `keyCol` decides whether
    * [[assignBatches]]' single ordered pass is safe or the key
    * distribution needs [[assignBatchesSalted]]'s two-phase re-plan.
    * `keyCol` must be numeric (the preflight's contract — hash a
    * string sink key to 64 bits first). Note the two faces are NOT
    * bit-identical at bucket boundaries (salting's documented
    * overshoot trade), so unlike the session/as-of routers the verdict
    * here changes batch boundaries, never coverage: every record still
    * lands in exactly one batch respecting the budget semantics of the
    * face chosen. */
  def assignBatchesAuto(df: DataFrame, keyCol: String, orderCol: String,
                        sizeCol: String, bucketCol: String,
                        maxCount: Long, maxBytes: Long = Long.MaxValue,
                        hotThreshold: Long = 1000000L): DataFrame = {
    val verdict = graft.operators.ScaleOps
      .windowPreflight(df.select(col(keyCol)), keyCol, hotThreshold)
      .select(col("advice")).head().getString(0)
    if (verdict == "salt")
      assignBatchesSalted(df, keyCol, orderCol, sizeCol, bucketCol, maxCount, maxBytes)
    else assignBatches(df, keyCol, orderCol, sizeCol, maxCount, maxBytes)
  }
}
