package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming surface (SURVEY.md §2.12 — green-field
  * capability; the reference is batch-only). Three canonical shapes over
  * the events schema:
  *
  *  - watermarked tumbling-window aggregation (decision-point bucketing),
  *  - sliding-window rates,
  *  - per-user sessionization with custom state via mapGroupsWithState
  *    (processing-time timeout closes idle sessions).
  *
  * All transforms are source-agnostic: tests drive them with
  * MemoryStream; production would swap in kafka/files readStream. The
  * same column logic runs identically in batch mode (Spark's unified
  * Dataset semantics), which is how the batch q20_sessionize oracle
  * cross-checks the logic.
  */
object EventStreams {

  final case class Event(eventId: Long, ts: java.sql.Timestamp, userId: Long,
                         eventType: String, value: Double)

  /** Tumbling 10-minute window counts per event type, 30-minute
    * watermark: late events beyond the watermark are dropped, window
    * state is bounded — the knob that keeps state finite at 100 TB/day.
    */
  def windowedCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "30 minutes")
      .groupBy(window(col("ts"), "10 minutes"), col("eventType"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("total_value"))
      .select(col("window.start").as("window_start"), col("eventType"),
        col("n_events"), col("total_value"))

  /** Sliding 10-minute windows every 5 minutes: per-window event rate. */
  def slidingRates(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "30 minutes")
      .groupBy(window(col("ts"), "10 minutes", "5 minutes"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("window.start").as("window_start"), col("n_events"))

  /** Native session windows (30-minute gap): Spark's built-in
    * session_window aggregation — the declarative sibling of
    * `sessionize` (which keeps custom per-user state instead). */
  def sessionWindows(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "30 minutes")
      .groupBy(session_window(col("ts"), "30 minutes"), col("userId"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("total_value"))
      .select(col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("userId"), col("n_events"), col("total_value"))

  /** Streaming exact dedup — the streaming sibling of the batch d1
    * operator: duplicate deliveries of the same event id are dropped as
    * long as they arrive within the watermark horizon. State is a
    * per-key marker EVICTED once the watermark passes, so it tracks the
    * dedup window, not the full history — the only shape that survives
    * an unbounded 100 TB/day stream (an unwindowed dropDuplicates would
    * grow state forever). */
  def dedupEvents(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "30 minutes")
      .dropDuplicatesWithinWatermark("eventId")

  /** Stream-static enrichment join — the canonical "decorate the event
    * stream with dimension attributes" shape. The static side is
    * broadcast, so the streaming side keeps its partitioning and the
    * join is STATELESS (no watermark, no state store): each micro-batch
    * joins against the dimension as-of that batch, which is also how
    * slowly-changing dims pick up refreshes. At 100 TB/day the stream
    * never shuffles for this join; only the (small) dim moves. */
  def enrichEvents(events: DataFrame, userDim: DataFrame): DataFrame =
    events.join(broadcast(userDim), Seq("userId"), "left")

  /** Watermarked stream-stream INTERVAL join — the canonical
    * attribution shape (impression ⋈ click within an attribution
    * window): same user, click timestamp inside
    * [impression ts, impression ts + 15 min]. BOTH sides carry
    * watermarks and the join condition bounds event time on BOTH
    * sides, which is what lets Spark compute a state eviction horizon:
    * an impression can be dropped from the buffer once the click
    * watermark passes its window end, and vice versa — without the
    * range bound the state store grows with the full history, which no
    * 100 TB/day stream survives. Inner join → Append output (each
    * matched pair is final the moment it is emitted). */
  def intervalJoin(impressions: DataFrame, clicks: DataFrame): DataFrame =
    attributionJoin(impressions, clicks, "inner")

  /** LEFT-OUTER variant of [[intervalJoin]] — the attribution-report
    * shape: EVERY impression is emitted, matched or not. A matched pair
    * emits immediately (inner-join semantics); an UNMATCHED impression
    * can only become final once the click-side watermark has passed the
    * end of its attribution window — "no click arrived" is unknowable
    * before that — at which point Spark emits it exactly once with null
    * click columns and evicts its buffer entry. Same two-sided
    * watermark + time-bound condition as the inner join, so state stays
    * evictable: the outer row's emission is watermark-DRIVEN, trading
    * latency (one watermark delay) for completeness, never unbounded
    * state. */
  def intervalJoinLeftOuter(impressions: DataFrame, clicks: DataFrame): DataFrame =
    attributionJoin(impressions, clicks, "leftOuter")

  /** FULL-OUTER variant — the reconciliation shape: unmatched rows from
    * BOTH sides surface (null-click impressions AND orphan clicks, each
    * exactly once after the global watermark passes its window). Same
    * evictable-state bounds; click-side columns are null-padded on the
    * impression-only rows and vice versa. */
  def intervalJoinFullOuter(impressions: DataFrame, clicks: DataFrame): DataFrame =
    attributionJoin(impressions, clicks, "fullOuter")

  /** One copy of the attribution-join logic (watermarks, 15-minute
    * window, output projection) shared by the inner, left-outer and
    * full-outer variants — the window/watermark knobs can never diverge
    * between them. */
  private def attributionJoin(impressions: DataFrame, clicks: DataFrame,
                              joinType: String): DataFrame = {
    val imp = impressions.withWatermark("ts", "30 minutes")
      .select(col("eventId").as("impressionId"), col("userId").as("impUserId"),
        col("ts").as("impTs"))
    val clk = clicks.withWatermark("ts", "30 minutes")
      .select(col("eventId").as("clickId"), col("userId").as("clickUserId"),
        col("ts").as("clickTs"))
    imp.join(clk, expr(
      """impUserId = clickUserId AND
         clickTs >= impTs AND
         clickTs <= impTs + interval 15 minutes"""), joinType)
      // coalesce: an orphan click (full-outer) has no impression side,
      // but its user is known — the join condition forces equality on
      // matched rows, so this never changes inner/left-outer output
      .select(col("impressionId"), col("clickId"),
        coalesce(col("impUserId"), col("clickUserId")).as("userId"),
        col("impTs"), col("clickTs"))
  }

  final case class SessionState(nEvents: Long, lastTs: Long, nSessions: Long)
  final case class SessionUpdate(userId: Long, nSessions: Long, nEvents: Long)

  /** Per-user session counting with explicit state: a new session starts
    * after a 30-minute gap. State per user is O(1). With
    * `evictIdle = true` a processing-time timeout evicts idle users, so
    * state size tracks ACTIVE users, not all users ever seen — the
    * production setting. (Timeout-driven batches make
    * `processAllAvailable` spin forever, so deterministic tests and
    * bounded runs use `evictIdle = false`.)
    */
  def sessionize(events: Dataset[Event], evictIdle: Boolean = false): Dataset[SessionUpdate] = {
    import events.sparkSession.implicits._
    val gapMs = 30L * 60 * 1000
    val timeoutMode =
      if (evictIdle) GroupStateTimeout.ProcessingTimeTimeout else GroupStateTimeout.NoTimeout
    events
      .groupByKey(_.userId)
      .mapGroupsWithState[SessionState, SessionUpdate](timeoutMode) {
        (userId: Long, batch: Iterator[Event], state: GroupState[SessionState]) =>
          if (evictIdle && state.hasTimedOut) {
            val s = state.get
            state.remove()
            SessionUpdate(userId, s.nSessions, s.nEvents)
          } else {
            val sorted = batch.toSeq.sortBy(e => (e.ts.getTime, e.eventId))
            var s = state.getOption.getOrElse(SessionState(0L, Long.MinValue, 0L))
            for (e <- sorted) {
              val newSession = s.lastTs == Long.MinValue || e.ts.getTime - s.lastTs > gapMs
              s = SessionState(s.nEvents + 1, e.ts.getTime,
                s.nSessions + (if (newSession) 1 else 0))
            }
            state.update(s)
            if (evictIdle) state.setTimeoutDuration("1 hour")
            SessionUpdate(userId, s.nSessions, s.nEvents)
          }
      }
  }
}
