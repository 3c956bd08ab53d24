package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming surface, SURVEY.md §2c. The aggregation
  * functions are written once and run unchanged on batch or streaming
  * DataFrames (watermark applied only when streaming); the stateful
  * offset tracker mirrors the reference's StreamStateHandler.
  */
/** One keyed micro-batch heading to the sink. */
case class KeyedBatch(key: String, n: Long, eventMillis: Long)

/** Offset ledger output: where this batch starts in its key's write
  * stream, and whether the stream was (re)created for it. */
case class OffsetAssignment(key: String, stream: String, offsetStart: Long,
                            n: Long, recreated: Boolean)

private[streaming] case class TrackerState(streamEpoch: Long, offset: Long, lastUpdateMillis: Long)

/** A keyed record with a serialized-size estimate and event time. */
case class TimedRecord(key: String, payload: String, sizeBytes: Long, eventMillis: Long)

/** A fired batch and why it fired: "count" | "bytes" | "timeout". */
case class FiredBatch(key: String, n: Long, bytes: Long, reason: String)

private[streaming] case class PendingBatch(n: Long, bytes: Long, anchorMillis: Long)

/** One keyed state-change event heading into the SCD2 ledger. */
case class StateEvent(user_id: Long, event_type: String,
                      eventMicros: Long, event_id: Long)

/** A CLOSED SCD2 version: [valid_from_us, valid_to_us) half-open. */
case class Scd2Version(user_id: Long, state: String, valid_from_us: Long,
                       valid_to_us: Long, n_events: Long)

private[streaming] case class Scd2Open(state: String, validFromUs: Long,
                                       nEvents: Long)

/** One tagged row entering the as-of enrichment stream: an event
  * (isProbe = false, payload = event_type) or a probe to enrich
  * (isProbe = true, id = the probe's own key, e.g. an order key). */
case class AsofInput(key: Long, us: Long, isProbe: Boolean, id: Long,
                     payload: String)

/** An enriched probe: the latest at-or-before event's id/payload and
  * its exact integer-µs staleness; None before the key's first event. */
case class AsofEnriched(key: Long, probe_id: Long, probe_us: Long,
                        last_event_id: Option[Long],
                        last_event_type: Option[String],
                        staleness_us: Option[Long])

private[streaming] case class AsofState(us: Long, id: Long, payload: String)

object Streams {

  /** Event-time tumbling window aggregate. Streaming: watermark bounds
    * state; late events beyond `lateness` are dropped. */
  def windowAgg(events: DataFrame, width: String = "1 hour",
                lateness: String = "10 minutes"): DataFrame = {
    val in = if (events.isStreaming) events.withWatermark("ts", lateness) else events
    val agg = in
      .groupBy(window(col("ts"), width), col("event_type"))
      .agg(count(lit(1)).as("n_events"), round(sum(col("value")), 2).as("sum_value"))
      .select(col("window.start").as("hour"), col("event_type"),
        col("n_events"), col("sum_value"))
    if (events.isStreaming) agg else agg.orderBy(col("hour"), col("event_type"))
  }

  /** Gap-based sessionization. Batch path: gaps-and-islands via lag +
    * running sum (one shuffle on user_id) — semantically equal to
    * `session_window(ts, gap)`, and DuckDB-expressible for the oracle.
    * Streaming path would use session_window directly (see spec). */
  def sessionize(events: DataFrame, gapMinutes: Int = 30): DataFrame = {
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"))
    val cum = Window.partitionBy(col("user_id")).orderBy(col("ts"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events
      .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
      .withColumn("new_session",
        when(col("prev_ts").isNull ||
          col("ts") >= col("prev_ts") + expr(s"INTERVAL $gapMinutes MINUTES"), 1L).otherwise(0L))
      .withColumn("session_id", sum(col("new_session")).over(cum))
      .groupBy(col("user_id"), col("session_id"))
      .agg(
        date_trunc("second", min(col("ts"))).as("session_start"),
        count(lit(1)).as("n_events"),
        round(sum(col("value")), 2).as("session_value"))
      .orderBy(col("user_id"), col("session_id"))
  }

  /** Streaming variant via native session_window (stateful, watermark-
    * bounded) — used by the ScalaTest streaming spec. */
  def sessionizeStreaming(events: DataFrame, gapMinutes: Int = 30,
                          lateness: String = "10 minutes"): DataFrame =
    events.withWatermark("ts", lateness)
      .groupBy(session_window(col("ts"), s"$gapMinutes minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("session_window.start").as("session_start"), col("user_id"), col("n_events"))

  /** The HOT-KEY-SALTED streaming sessionization — the §9 streaming
    * knob: state is keyed by (user_id, time bucket), so a hot user's
    * in-flight rows spread across as many state partitions as buckets
    * they span instead of serializing one task per trigger (the same
    * bound [[graft.operators.ScaleOps.sessionsSalted]] breaks for the
    * batch window). Emits WATERMARK-FINALIZED BUCKET-LOCAL sessions in
    * append mode; [[graft.operators.ScaleOps.glueLocalSessions]] is
    * the downstream glue — bucket-boundary session pairs within the
    * gap merge at SESSION grain (S rows per key, not N), run batch-
    * periodically over the emitted table or by the reading query (the
    * lambda seam every at-scale sessionizer has). The structural-
    * correctness argument is sessionsSalted's own: local sessions
    * within a bucket are > gap apart, and buckets partition the time
    * axis. Route on [[statePreflight]]'s verdict — "window" keeps the
    * one-stage [[sessionizeStreaming]] face. */
  def sessionizeStreamingSalted(events: DataFrame, gapMinutes: Int = 30,
                                bucketMinutes: Int = 1440,
                                lateness: String = "10 minutes"): DataFrame = {
    val bucketUs = bucketMinutes * 60L * 1000000L
    events.withWatermark("ts", lateness)
      .withColumn("bkt", expr(s"unix_micros(ts) div $bucketUs"))
      .groupBy(session_window(col("ts"), s"$gapMinutes minutes"),
        col("user_id"), col("bkt"))
      .agg(count(lit(1)).as("n"),
        min(unix_micros(col("ts"))).as("s_us"),
        max(unix_micros(col("ts"))).as("e_us"))
      .select(col("user_id"), col("bkt"), col("n"), col("s_us"), col("e_us"))
  }

  /** Pre-deploy hot-key check for the STATEFUL stream faces
    * ([[sessionizeStreaming]], [[windowAgg]], scd2Stream, asofStream,
    * streamDedup): per-key state and per-trigger work serialize on the
    * state key exactly like a batch window partition, so the SAME
    * metadata-scale preflight decides the same routing — run it over a
    * history sample (yesterday's corpus) BEFORE deploying the stream,
    * and deploy [[sessionizeStreamingSalted]] + glue when the verdict
    * says "salt". Delegates to
    * [[graft.operators.ScaleOps.windowPreflight]]. */
  def statePreflight(history: DataFrame, keyCol: String,
                     hotThreshold: Long = 1000000L): DataFrame =
    graft.operators.ScaleOps.windowPreflight(history, keyCol, hotThreshold)

  /** Count/bytes/timeout batch trigger with optional reset-on-new-
    * record — the Structured Streaming re-expression of the reference's
    * composed trigger (BatchTrigger.Builder.build, BatchTrigger.java:
    * 117-125: PurgingTrigger(ProcessingTimeoutTrigger(BatchTrigger))).
    * Count/bytes fire inline as records accumulate; a partial batch
    * fires via processing-time timeout. `resetTimerOnNewRecord` re-arms
    * the timeout on every arrival (idle-gap flush) instead of only when
    * a batch opens. */
  def timeoutBatcher(records: Dataset[TimedRecord], maxCount: Long, maxBytes: Long,
                     timeoutMs: Long, resetTimerOnNewRecord: Boolean = false): Dataset[FiredBatch] = {
    val spark = records.sparkSession
    import spark.implicits._
    // Event-time timeouts (watermark-driven) instead of wall-clock: same
    // flush-partial-batch semantics, but deterministic and replayable —
    // the right trade at scale, where wall-clock timers skew per
    // executor and break recovery.
    val withTs = records
      .withColumn("ts", timestamp_millis(col("eventMillis")))
      .withWatermark("ts", "0 seconds")
      .as[TimedRecord]
    withTs.groupByKey(_.key)
      .flatMapGroupsWithState[PendingBatch, FiredBatch](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (key: String, rows: Iterator[TimedRecord], state: GroupState[PendingBatch]) =>
          if (state.hasTimedOut) {
            val pending = state.getOption.getOrElse(PendingBatch(0, 0, -1L))
            state.remove()
            if (pending.n > 0) Iterator(FiredBatch(key, pending.n, pending.bytes, "timeout"))
            else Iterator.empty
          } else {
            var pending = state.getOption.getOrElse(PendingBatch(0, 0, -1L))
            val fired = scala.collection.mutable.Buffer.empty[FiredBatch]
            rows.foreach { r =>
              // anchor: batch-open time, or last arrival when resetting
              val anchor =
                if (pending.n == 0 || resetTimerOnNewRecord) r.eventMillis
                else pending.anchorMillis
              pending = PendingBatch(pending.n + 1, pending.bytes + r.sizeBytes, anchor)
              if (pending.n >= maxCount) {
                fired += FiredBatch(key, pending.n, pending.bytes, "count")
                pending = PendingBatch(0, 0, -1L)
              } else if (pending.bytes >= maxBytes) {
                fired += FiredBatch(key, pending.n, pending.bytes, "bytes")
                pending = PendingBatch(0, 0, -1L)
              }
            }
            if (pending.n > 0) {
              state.update(pending)
              // Spark rejects event-time timeouts at/behind the current
              // watermark; clamp so a slow key whose anchor lags the
              // global watermark flushes next micro-batch instead of
              // crashing the query.
              state.setTimeoutTimestamp(math.max(
                pending.anchorMillis + timeoutMs, state.getCurrentWatermarkMs() + 1))
            } else {
              state.remove()
            }
            fired.iterator
          }
      }
  }

  /** Ingest face of `Relational.q58Scd2` — the SCD2 dimension ledger
    * maintained AT ingest: `flatMapGroupsWithState` keeps each user's
    * current (open) version in state; a state CHANGE emits the closed
    * version with its half-open [valid_from, valid_to) interval, so
    * downstream sees exactly the immutable rows a warehouse MERGE
    * would append. Same-state arrivals fold into the open version's
    * event count (O(1) state per user — one open version, never the
    * history). Within a micro-batch rows sort by (eventMicros,
    * event_id) — the batch face's determinism rule; ACROSS batches
    * the ledger assumes in-order ingest per user (the append-only
    * CDC contract; out-of-order reprocessing is the batch face's
    * job). */
  def scd2Stream(events: Dataset[StateEvent]): Dataset[Scd2Version] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[Scd2Open, Scd2Version](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (uid: Long, rows: Iterator[StateEvent], state: GroupState[Scd2Open]) =>
          val sorted = rows.toSeq.sortBy(r => (r.eventMicros, r.event_id))
          val out = scala.collection.mutable.Buffer.empty[Scd2Version]
          var cur = state.getOption
          sorted.foreach { r =>
            cur match {
              case Some(s) if s.state == r.event_type =>
                cur = Some(s.copy(nEvents = s.nEvents + 1))
              case Some(s) =>
                out += Scd2Version(uid, s.state, s.validFromUs, r.eventMicros, s.nEvents)
                cur = Some(Scd2Open(r.event_type, r.eventMicros, 1L))
              case None =>
                cur = Some(Scd2Open(r.event_type, r.eventMicros, 1L))
            }
          }
          cur.foreach(state.update)
          out.iterator
      }
  }

  /** Ingest face of `Relational.q63AsofJoin` — AS-OF ENRICHMENT at
    * the stream: each key carries its latest event as O(1) state (the
    * Flink temporal-table-function shape), and every probe row is
    * emitted enriched with that at-or-before event + exact integer-µs
    * staleness. The caller unions its event and probe streams into
    * one tagged [[AsofInput]] stream (the batch face's union-window
    * shape, keyed instead of windowed). Within a micro-batch rows
    * sort by (us, isProbe, id) — inclusive at-or-before, event_id
    * tie-breaks, the batch face's exact rule; ACROSS batches the
    * state keeps the max-(us, id) event ever seen, so a late event
    * can never regress the state, but probes already emitted are not
    * retracted (at-ingest enrichment is append-only; full
    * out-of-order correctness is the batch face's job). */
  def asofStream(rows: Dataset[AsofInput]): Dataset[AsofEnriched] = {
    val spark = rows.sparkSession
    import spark.implicits._
    rows.groupByKey(_.key)
      .flatMapGroupsWithState[AsofState, AsofEnriched](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (k: Long, it: Iterator[AsofInput], state: GroupState[AsofState]) =>
          val sorted = it.toSeq.sortBy(r => (r.us, r.isProbe, r.id))
          val out = scala.collection.mutable.Buffer.empty[AsofEnriched]
          var cur = state.getOption
          sorted.foreach { r =>
            if (!r.isProbe) {
              if (cur.forall(s => s.us < r.us || (s.us == r.us && s.id < r.id)))
                cur = Some(AsofState(r.us, r.id, r.payload))
            } else {
              out += AsofEnriched(k, r.id, r.us, cur.map(_.id),
                cur.map(_.payload), cur.map(r.us - _.us))
            }
          }
          cur.foreach(state.update)
          out.iterator
      }
  }

  /** Stream-stream interval join: purchases matched to the same user's
    * view events within the preceding `windowMinutes`. In streaming both
    * sides carry watermarks and the time-range condition bounds join
    * state (Spark discards rows older than watermark - interval). The
    * same expression tree runs in batch for the oracle. */
  def intervalJoin(views: DataFrame, purchases: DataFrame,
                   windowMinutes: Int = 60): DataFrame = {
    val v = (if (views.isStreaming) views.withWatermark("ts", "10 minutes") else views)
      .select(col("user_id").as("v_user"), col("ts").as("v_ts"),
        col("event_id").as("view_id"))
    val p = (if (purchases.isStreaming) purchases.withWatermark("ts", "10 minutes") else purchases)
      .select(col("user_id").as("p_user"), col("ts").as("p_ts"),
        col("event_id").as("purchase_id"))
    p.join(v,
      col("p_user") === col("v_user") &&
      col("v_ts") <= col("p_ts") &&
      col("v_ts") > col("p_ts") - expr(s"INTERVAL $windowMinutes MINUTES"))
  }

  /** Batch/oracle shape: per purchase, how many prior-hour views. */
  def intervalJoinCounts(events: DataFrame, windowMinutes: Int = 60): DataFrame =
    intervalJoin(
      events.filter(col("event_type") === "view"),
      events.filter(col("event_type") === "purchase"), windowMinutes)
      .groupBy(col("purchase_id"), col("p_user"))
      .agg(count(lit(1)).as("n_views"))
      .select(col("purchase_id"), col("p_user").as("user_id"), col("n_views"))
      .orderBy(col("purchase_id"))

  /** Streaming exact dedup on a key with bounded state:
    * dropDuplicatesWithinWatermark keeps ids only as long as the
    * watermark can still admit a duplicate — the streaming face of
    * Dedup.dedupExact. */
  def streamDedup(events: DataFrame, lateness: String = "10 minutes"): DataFrame =
    events.withWatermark("ts", lateness)
      .dropDuplicatesWithinWatermark("event_id")

  /** Per-key monotone offset assignment with TTL-based stream
    * recreation — `mapGroupsWithState` re-expression of the reference's
    * StreamStateHandler (process/StreamStateHandler.java:96-160:
    * NOT_EXISTS/EXPIRED → create stream at offset 0, else append at the
    * tracked offset; 7-day TTL). */
  def assignOffsets(batches: Dataset[KeyedBatch], ttlDays: Int = 7): Dataset[OffsetAssignment] = {
    import batches.sparkSession.implicits._
    val ttlMillis = ttlDays.toLong * 24 * 60 * 60 * 1000
    batches.groupByKey(_.key)
      .flatMapGroupsWithState[TrackerState, OffsetAssignment](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (key: String, rows: Iterator[KeyedBatch], state: GroupState[TrackerState]) =>
          var st = state.getOption.getOrElse(TrackerState(0L, 0L, Long.MinValue))
          val out = rows.toSeq.sortBy(_.eventMillis).map { b =>
            val expired = st.lastUpdateMillis != Long.MinValue &&
              b.eventMillis >= st.lastUpdateMillis + ttlMillis
            val recreated = st.lastUpdateMillis == Long.MinValue || expired
            if (expired) st = TrackerState(st.streamEpoch + 1, 0L, b.eventMillis)
            val assignment = OffsetAssignment(key, s"$key/streams/${st.streamEpoch}",
              st.offset, b.n, recreated)
            st = TrackerState(st.streamEpoch, st.offset + b.n, b.eventMillis)
            assignment
          }
          state.update(st)
          out.iterator
      }
  }
}
