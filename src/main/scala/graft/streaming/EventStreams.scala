package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import java.sql.Timestamp

/** Structured-Streaming surface (SURVEY.md §2.10).
  *
  * The reference is one-shot batch; its closest streaming analog is
  * Firebase's own listener API, which it does not use. This module adds
  * the streaming layer a live event pipeline needs, built so the SAME
  * transformations run in batch (where the DuckDB oracle can check
  * them — operators.Events) and on a stream:
  *
  *  - `windowedCounts`: watermarked tumbling-window aggregate
  *    (readStream -> withWatermark -> groupBy(window) -> agg).
  *  - `sessionize`: custom stateful sessionization with
  *    flatMapGroupsWithState + event-time timeout — the state machine
  *    the reference's per-path IPP memo (BackupProcessor.php:151-156)
  *    would become if paths were keys and pages were events.
  *
  * State is per-key and bounded by the watermark; at 100 TB/day the
  * shuffle key (user_id) partitions state across executors and the
  * watermark bounds the state store.
  */
object EventStreams {

  final case class Ev(event_id: Long, ts: Timestamp, user_id: Long,
                      event_type: String, value: Double)

  final case class SessionState(start: Long, lastTs: Long, nEvents: Long)

  /** `start_ms`/`end_ms` carry the session bounds EXACTLY: the
    * presentation seconds are floor-truncated, so deriving an end from
    * `session_start_sec + duration_sec` under-reports the true last
    * event by up to ~1 s — enough to flip a gap comparison right at
    * the threshold when Events.compactSessions re-merges
    * boundary-split fragments (compact on the exact bounds, present
    * in seconds). */
  final case class Session(user_id: Long, session_start_sec: Long,
                           n_events: Long, duration_sec: Long,
                           start_ms: Long, end_ms: Long)

  /** Tumbling 1-hour counts per event type; `delay` is the watermark
    * (late data beyond it is dropped and its windows finalized). */
  def windowedCounts(events: DataFrame, delay: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", delay)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("ws"), col("event_type"), col("n"))

  /** Streaming exact dedup: at-most-once per event_id within the
    * watermark horizon — the streaming twin of q_dedup_exact (keyed by
    * event_id so state shards across executors). Must be the
    * WithinWatermark variant: plain dropDuplicates("event_id") never
    * evicts state unless the event-time column is part of the key —
    * unbounded state on a long-running stream. */
  def dedupStream(events: DataFrame, delay: String = "2 hours"): DataFrame =
    events.withWatermark("ts", delay)
      .dropDuplicatesWithinWatermark("event_id")

  /** Stream-stream interval join: each purchase joined to the same
    * user's clicks from the preceding hour — the streaming twin of the
    * batch as-of join (operators.Events q_join_asof), except streams
    * keep EVERY qualifying click (as-of's "latest only" needs ordered
    * state; the interval join needs none). Watermarks on both sides +
    * the two-sided time-range predicate bound the join state: rows
    * older than watermark + interval are evicted, so state is
    * O(rate x interval) per user shard regardless of stream length. */
  def clickPurchaseJoin(events: DataFrame, delay: String = "1 hour"): DataFrame = {
    val clicks = events.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("click_ts"),
        col("event_id").as("click_id"))
      .withWatermark("click_ts", delay)
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("purchase_ts"),
        col("event_id").as("purchase_id"))
      .withWatermark("purchase_ts", delay)
    purchases.join(clicks,
      col("p_user") === col("c_user") &&
        col("click_ts") <= col("purchase_ts") &&
        col("click_ts") >= col("purchase_ts") - expr("INTERVAL 1 HOUR"))
      .select(col("purchase_id"), col("p_user").as("user_id"),
        col("purchase_ts"), col("click_id"), col("click_ts"))
  }

  /** Stream-static enrichment: a streaming event feed joined to a
    * batch dimension (users, configs, model registries — anything
    * slowly changing). No state store at all: the static side is
    * re-planned per micro-batch, so a broadcast-size dimension costs
    * one broadcast per batch and an updated dimension table is picked
    * up on the next batch without restarting the query. */
  def enrich(events: DataFrame, dim: DataFrame,
             eventKey: String = "user_id",
             dimKey: String = "user_id"): DataFrame =
    events.join(dim, events(eventKey) === dim(dimKey), "left_outer")
      .drop(dim(dimKey))

  /** Gap-based sessionization (30-min inactivity) with explicit state:
    * emits a Session row when a session closes (gap exceeded within a
    * batch, or event-time timeout fires after the watermark passes). */
  def sessionize(events: Dataset[Ev], gapSec: Long = 1800): Dataset[Session] = {
    import events.sparkSession.implicits._
    def emit(user: Long, s: SessionState): Session =
      Session(user, s.start / 1000, s.nEvents,
        (s.lastTs - s.start) / 1000, s.start, s.lastTs)
    events
      .withWatermark("ts", "2 hours")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (user: Long, evs: Iterator[Ev], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator(emit(user, s))
          } else {
            val sorted = evs.toSeq.sortBy(_.ts.getTime)
            var cur = state.getOption
            val closed = Seq.newBuilder[Session]
            // late (within-watermark) events from BEFORE the open
            // session, with a full gap between them and it, form their
            // own already-closed sessions. ADJACENT late events — gaps
            // under gapSec between each other — are one session in the
            // batch twin, so they COALESCE into a fragment here instead
            // of emitting one singleton per event; the fragment closes
            // when a non-adjacent event arrives (events are sorted, so
            // nothing later in this batch can extend it), or MERGES
            // into the open session when the closing event bridges
            // them (fragment → joiner → session, every hop under
            // gapSec — one session in the batch twin). Fragments
            // split across micro-batch BOUNDARIES still emit separately
            // (coalescing them would need a second state slot and
            // retractions Append mode cannot express) — the documented
            // residual stream-vs-batch divergence; the batch operator
            // remains the retrospective exact path.
            var pendingLate = Option.empty[SessionState]
            def flushLate(): Unit = {
              pendingLate.foreach(f => closed += emit(user, f))
              pendingLate = None
            }
            sorted.foreach { e =>
              val t = e.ts.getTime
              cur match {
                case Some(s) if t - s.lastTs >= gapSec * 1000 =>
                  flushLate()
                  closed += emit(user, s)
                  cur = Some(SessionState(t, t, 1))
                case Some(s) if t < s.start - gapSec * 1000 =>
                  pendingLate match {
                    case Some(f) if t - f.lastTs < gapSec * 1000 =>
                      // lastTs never regresses (the cur-session rule):
                      // sorted input makes t >= f.lastTs, but keep max
                      pendingLate = Some(SessionState(f.start,
                        math.max(f.lastTs, t), f.nEvents + 1))
                    case _ =>
                      flushLate()
                      pendingLate = Some(SessionState(t, t, 1))
                  }
                case Some(s) =>
                  // in-order events extend lastTs; a late event inside
                  // the session (or within gap before its start) joins
                  // it — lastTs must NEVER move backwards (a regressed
                  // lastTs yields negative durations and bogus splits)
                  // and start extends back to cover an early joiner.
                  // If this joiner BRIDGES the pending late fragment
                  // to the session (fragment → joiner → session, every
                  // hop under gap), the batch twin chains them all
                  // into one session — merge the fragment in instead
                  // of flushing it as its own
                  pendingLate match {
                    case Some(f) if t - f.lastTs < gapSec * 1000 =>
                      pendingLate = None
                      cur = Some(SessionState(
                        math.min(math.min(s.start, t), f.start),
                        math.max(s.lastTs, t), s.nEvents + 1 + f.nEvents))
                    case _ =>
                      flushLate()
                      cur = Some(SessionState(math.min(s.start, t),
                        math.max(s.lastTs, t), s.nEvents + 1))
                  }
                case None =>
                  cur = Some(SessionState(t, t, 1))
              }
            }
            flushLate()
            cur.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.lastTs + gapSec * 1000)
            }
            closed.result().iterator
          }
      }
  }
}
