package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, GroupStateTimeout, OutputMode, Trigger}
import org.apache.spark.sql.types._

/** Running per-user aggregate carried in stream state. */
final case class UserStats(user_id: Long, n_events: Long, total_value: Double)

/** Last event seen per user, carried across micro-batches so transitions
  * spanning a batch boundary are still emitted.
  */
final case class LastEvent(ts_micros: Long, event_id: Long, event_type: String)

/** One observed consecutive-event transition for a user. */
final case class Transition(user_id: Long, from_type: String, to_type: String)

/** State for [[EventStreams.eventTransitionsOrdered]]: the last
  * FINALIZED event (the chain head for the next emission) plus the
  * watermark-bounded reorder buffer of not-yet-final events.
  */
final case class PendingEvents(tail: Option[LastEvent], pending: Seq[LastEvent])

/** Structured Streaming surface — the streaming formalisation of the
  * reference's scheduled incremental batch (SURVEY.md §2.3): a file source
  * watched incrementally with checkpointed offsets, event-time watermarks,
  * tumbling/session windows, stateful dedup, and a foreachBatch sink for
  * arbitrary day-commit logic.
  *
  * The reference's cadence (every 12 h, whole days at a time) is
  * `Trigger.AvailableNow` + a day-partition column; its progress file is
  * the checkpoint; its "late data within a committed day is lost" quirk
  * maps to the watermark dropping late rows.
  */
object EventStreams {

  /** Schema of the `events` table (TESTDATA.md), micros timestamps. */
  val eventSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)
  ))

  /** File-source stream over a directory of event parquet files. At scale:
    * `maxFilesPerTrigger` bounds batch size; offsets live in the checkpoint
    * exactly like the reference's watermark file.
    */
  def readEventStream(spark: SparkSession, dir: String, maxFilesPerTrigger: Int = 10): DataFrame =
    spark.readStream
      .schema(eventSchema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(dir)

  /** Tumbling 1-hour window counts with a watermark — the streaming twin
    * of the batch `q30_tumbling_hour` query. Late rows beyond 30 min are
    * dropped, mirroring the reference's committed-day semantics.
    */
  def tumblingCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "30 minutes")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("total_value"))
      .select(col("window.start").as("window_start"), col("event_type"), col("n"), col("total_value"))

  /** Session windows keyed by user with a 30-minute inactivity gap — the
    * streaming twin of `q31_sessions`.
    */
  def sessionCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "30 minutes")
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("session_window.start").as("session_start"), col("n_events"))

  /** Stateful exact dedup on (user_id, event_type) within the watermark —
    * the streaming twin of `q32_event_dedup`.
    */
  def dedupEvents(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "30 minutes")
      .dropDuplicatesWithinWatermark("user_id", "event_type")

  /** Per-user cumulative stats via arbitrary stateful processing
    * (`mapGroupsWithState`) — the custom-state surface beyond built-in
    * windows: state survives across micro-batches in the checkpoint, and
    * each batch emits the updated running totals per user seen in it.
    */
  def runningUserStats(spark: SparkSession, events: DataFrame): Dataset[UserStats] = {
    import spark.implicits._
    events
      .selectExpr("user_id", "value")
      .as[(Long, Double)]
      .groupByKey(_._1)
      .mapGroupsWithState[UserStats, UserStats](GroupStateTimeout.NoTimeout) {
        case (userId, rows, state) =>
          val prev = state.getOption.getOrElse(UserStats(userId, 0L, 0.0))
          var n = prev.n_events
          var total = prev.total_value
          rows.foreach { case (_, v) => n += 1; total += v }
          val next = UserStats(userId, n, math.round(total * 100.0) / 100.0)
          state.update(next)
          next
      }
  }

  /** Per-user event-transition stream — the streaming twin of the batch
    * `q92_event_transitions`/`q94_event_paths` window queries, built on
    * `flatMapGroupsWithState` (the emit-many stateful rung next to
    * [[runningUserStats]]'s mapGroupsWithState): each user's state is
    * ONLY their last event (constant per key — the property that keeps
    * state O(active users) on an unbounded stream); every micro-batch
    * sorts the user's in-batch rows by (ts, event_id) — bounded: a
    * user's slice of one micro-batch — and emits one Transition per
    * consecutive pair, including the pair that spans the previous
    * batch's tail. Ordering caveat (documented, matching the
    * reference's committed-day semantics): rows arriving in a LATER
    * micro-batch with an EARLIER timestamp than the stored tail are
    * counted as arrival-order transitions; bound disorder upstream with
    * a watermark + sorted file feed (the spec drives time-split files),
    * or use [[eventTransitionsOrdered]], which restores event-time
    * order across batches via a watermark-bounded reorder buffer.
    */
  def eventTransitions(spark: SparkSession, events: DataFrame): Dataset[Transition] = {
    import spark.implicits._
    events
      .selectExpr("user_id", "ts", "event_id", "event_type")
      .as[(Long, java.sql.Timestamp, Long, String)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[LastEvent, Transition](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case (userId, rows, state) =>
          val sorted = rows.toSeq
            .map { case (_, ts, id, tpe) =>
              // full microsecond precision: getTime truncates to millis
              val micros = Math.floorDiv(ts.getTime, 1000L) * 1000000L + ts.getNanos / 1000L
              LastEvent(micros, id, tpe)
            }
            .sortBy(e => (e.ts_micros, e.event_id))
          if (sorted.isEmpty) Iterator.empty
          else {
            val chain = state.getOption.toSeq ++ sorted
            state.update(chain.last)
            chain.sliding(2).collect {
              case Seq(a, b) => Transition(userId, a.event_type, b.event_type)
            }
          }
      }
  }

  /** [[eventTransitions]] with EVENT-TIME ordering restored across
    * micro-batches: the exact-parity variant for feeds whose disorder is
    * bounded by the watermark (the round-9 advisory's open item — the
    * simple variant counts a cross-batch out-of-order row in ARRIVAL
    * order, so its q92 parity was a feed-contract property).
    *
    * Mechanics: each user's state holds the last FINALIZED event plus a
    * reorder buffer of events newer than the watermark. Per batch:
    * arriving rows older than the current watermark are DROPPED (the
    * reference's committed-day semantics — and the reason finalization
    * is sound: any future arrival must be newer than the watermark, so
    * it can never sort among the finalized prefix); the buffer merges
    * the survivors in (ts, event_id) order; the prefix at or below the
    * watermark is finalized and emitted as transitions chained from the
    * stored tail. An event-time timeout set to watermark+1 flushes
    * newly-final buffer entries on no-data batches, so the emitted set
    * always covers every event at or below the FINAL watermark — the
    * spec pins exact q92 parity on that prefix for an out-of-order
    * feed. State is O(events inside the watermark window) per user —
    * bounded on an unbounded stream, unlike an unbounded sort.
    */
  def eventTransitionsOrdered(
      spark: SparkSession,
      events: DataFrame,
      delay: String = "30 minutes"
  ): Dataset[Transition] = {
    import spark.implicits._
    def finalize(userId: Long, st: PendingEvents, wmMicros: Long): (PendingEvents, Iterator[Transition]) = {
      val sorted = st.pending.sortBy(e => (e.ts_micros, e.event_id))
      val (fin, pend) = sorted.partition(_.ts_micros <= wmMicros)
      val chain = st.tail.toSeq ++ fin
      val out = chain.sliding(2).collect { case Seq(a, b) => Transition(userId, a.event_type, b.event_type) }
      (PendingEvents(chain.lastOption.orElse(st.tail), pend), out)
    }
    events
      .withWatermark("ts", delay)
      .selectExpr("user_id", "ts", "event_id", "event_type")
      .as[(Long, java.sql.Timestamp, Long, String)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[PendingEvents, Transition](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        case (userId, rows, state) =>
          val wmMicros = state.getCurrentWatermarkMs() * 1000L
          val prev = state.getOption.getOrElse(PendingEvents(None, Nil))
          val incoming = rows.map { case (_, ts, id, tpe) =>
            val micros = Math.floorDiv(ts.getTime, 1000L) * 1000000L + ts.getNanos / 1000L
            LastEvent(micros, id, tpe)
          }.filter(_.ts_micros > wmMicros).toSeq // watermark-late rows dropped
          val (next, out) = finalize(userId, PendingEvents(prev.tail, prev.pending ++ incoming), wmMicros)
          state.update(next)
          // Wake this group when the watermark next advances, so the
          // buffer keeps draining even with no new rows for the user —
          // but ONLY while something is buffered: re-arming a drained
          // user would time out every user ever seen on every
          // subsequent batch (O(total users) per batch forever); a
          // drained user needs no no-data flush, and a new row for
          // them triggers processing anyway.
          if (next.pending.nonEmpty)
            state.setTimeoutTimestamp(state.getCurrentWatermarkMs() + 1)
          out
      }
  }

  /** Stream-stream INTERVAL join with watermarks on BOTH sides — the
    * attribution shape: each purchase matched to the same user's clicks
    * in the preceding hour. The event-time bound
    * (`purchase_ts` ∈ [click_ts, click_ts + 1h]) plus the two watermarks
    * let Spark EVICT join state once the bound passes — without it a
    * stream-stream join buffers forever; with it state is
    * O(users active in the last watermark+interval window), the property
    * that keeps this runnable on an unbounded 100 TB stream. Batch twin:
    * `q47_interval_join` (oracle-checked).
    */
  def clickAttribution(events: DataFrame, sameUserWindow: String = "1 hour"): DataFrame = {
    val clicks = events
      .filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("event_id").as("click_id"), col("ts").as("click_ts"))
      .withWatermark("click_ts", "30 minutes")
    val purchases = events
      .filter(col("event_type") === "purchase")
      .select(
        col("user_id").as("user_id"),
        col("event_id").as("purchase_id"),
        col("ts").as("purchase_ts"),
        col("value")
      )
      .withWatermark("purchase_ts", "30 minutes")
    purchases.join(
      clicks,
      col("user_id") === col("c_user") &&
        col("purchase_ts") >= col("click_ts") &&
        col("purchase_ts") <= col("click_ts") + expr(s"INTERVAL $sameUserWindow")
    )
      .select(col("user_id"), col("click_id"), col("purchase_id"), col("value"))
  }

  /** Stream-STATIC enrichment join: each streamed event joined to a
    * bounded dimension table (the lookup/enrichment shape — user →
    * nation here as a stand-in for any profile dim). The static side is
    * planned per micro-batch as an ordinary broadcast hash join: no
    * stream state at all, which is what makes enrichment free at
    * unbounded stream length; only the dim's size matters, and a dim too
    * big to broadcast degrades to a shuffled join per batch. No broadcast
    * HINT: the planner broadcasts under autoBroadcastJoinThreshold and
    * falls back to a shuffle above it — a mandatory hint would instead
    * OOM the driver on an oversized dim.
    */
  def enrichWithDim(events: DataFrame, dim: DataFrame, key: String): DataFrame =
    events.join(dim, key)

  /** foreachBatch sink: the hook where per-batch (per-day) commit logic —
    * like the reference's watermark write — runs transactionally with the
    * batch id. Caller supplies the body.
    */
  def foreachBatchSink(df: DataFrame, checkpoint: String)(
      body: (DataFrame, Long) => Unit
  ): DataStreamWriter[org.apache.spark.sql.Row] =
    df.writeStream
      .outputMode(OutputMode.Update)
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch(body)
}
