package graft.operators

import graft.{GraftQuery, Tables}
import graft.GraftQuery.decSum
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-time windowing over the `events` table (SURVEY.md §2.10).
  *
  * The reference is strictly one-shot batch (BackupProcessor.php:39-53) —
  * these queries add the event-time aggregation surface a data pipeline
  * needs, expressed with Spark's built-in `window`/`session_window`
  * grouping expressions. The same expressions run unchanged under
  * Structured Streaming (graft.streaming wires them to readStream with
  * watermarks); here they run in batch so the DuckDB oracle can check
  * them.
  *
  * Timestamp discipline: events.ts is µs parquet (TIMESTAMP_NTZ to
  * Spark, normalized by Tables.events; naive TIMESTAMP to DuckDB). All
  * outputs are either hour/half-hour bucket starts (truncation-safe)
  * or whole-second epochs, so no precision edge can flip a bucket.
  */
object Events {

  /** Merge boundary-split session fragments back into whole sessions.
    *
    * Streaming sessionization in Append mode cannot retract an emitted
    * row, so a session whose events straddle a micro-batch boundary
    * (late fragment flushed in batch N, adjacent events in batch N+1)
    * emits as SEPARATE fragments (EventStreams.sessionize's documented
    * residual divergence). This batch operator compacts such fragments
    * retrospectively: interval gaps-and-islands per user — fragments
    * whose start is within `gap` of the running max end of their
    * predecessors chain into one session, mirroring the event-level
    * rule (new session iff gap >= threshold).
    *
    * Expects columns (user_id, start, end, n_events) with start/end in
    * one numeric unit and `gap` in the same unit. Two window passes +
    * one aggregate, all partitioned by user_id — the fragment table is
    * tiny relative to the event log, and nothing here is a global
    * window, so the shape survives any corpus size. */
  def compactSessions(frags: DataFrame, gap: Long): DataFrame = {
    val wOrd = Window.partitionBy("user_id").orderBy("start", "end")
    val wRun = wOrd.rowsBetween(Window.unboundedPreceding, -1)
    val wCum = wOrd.rowsBetween(Window.unboundedPreceding, 0)
    val prevEnd = max(col("end")).over(wRun)
    frags
      .withColumn("_new",
        when(prevEnd.isNull || col("start") - prevEnd >= gap, 1L)
          .otherwise(0L))
      .withColumn("_sid", sum(col("_new")).over(wCum))
      .groupBy(col("user_id"), col("_sid"))
      .agg(min(col("start")).as("start"), max(col("end")).as("end"),
           sum(col("n_events")).as("n_events"))
      .drop("_sid")
  }

  val queries: Seq[GraftQuery] = Seq(

    GraftQuery(
      "q_events_window",
      "Tumbling 1-hour window aggregate — epoch-aligned, so the window " +
        "start equals date_trunc('hour'). Partial aggregation is map-side; " +
        "the shuffle key (bucket, type) has bounded cardinality at any " +
        "scale.",
      (s, d) => Tables.events(s, d)
        .groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n"),
             decSum(col("value"), 18, 6).as("total_value"))
        .select(col("window.start").as("ws"), col("event_type"),
                col("n"), col("total_value"))
        .orderBy("ws", "event_type"),
      Some("SELECT date_trunc('hour', ts) AS ws, event_type, " +
        "count(*) AS n, " +
        "CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value " +
        "FROM events GROUP BY ws, event_type ORDER BY ws, event_type")),

    GraftQuery(
      "q_events_sliding",
      "Sliding window (1 h length, 30 min slide): every event lands in " +
        "exactly two windows; Spark's window() generates both replicas " +
        "before the aggregate, mirrored in SQL by unnesting the two " +
        "half-hour buckets.",
      (s, d) => Tables.events(s, d)
        .groupBy(window(col("ts"), "1 hour", "30 minutes"), col("event_type"))
        .agg(count(lit(1)).as("n"))
        .select(col("window.start").as("ws"), col("event_type"), col("n"))
        .orderBy("ws", "event_type"),
      Some("SELECT ws, event_type, count(*) AS n FROM (" +
        "SELECT unnest([time_bucket(INTERVAL '30 minutes', ts), " +
        "time_bucket(INTERVAL '30 minutes', ts) - INTERVAL '30 minutes']) " +
        "AS ws, event_type FROM events) " +
        "GROUP BY ws, event_type ORDER BY ws, event_type")),

    GraftQuery(
      "q_events_session",
      "Session windows (30 min inactivity gap) per user — " +
        "session_window() in batch mode; the oracle re-derives sessions " +
        "with the classic gaps-and-islands lag/cumsum. Session start " +
        "emitted as whole-second epoch (ns-vs-µs safe).",
      (s, d) => Tables.events(s, d)
        .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
        .agg(count(lit(1)).as("n_events"))
        .select(col("user_id"),
                unix_timestamp(col("session_window.start"))
                  .as("session_start_sec"),
                col("n_events"))
        .orderBy("user_id", "session_start_sec"),
      Some("WITH flagged AS (" +
        "SELECT user_id, ts, CASE WHEN lag(ts) OVER w IS NULL " +
        "OR ts - lag(ts) OVER w >= INTERVAL '30 minutes' THEN 1 ELSE 0 END " +
        "AS new_sess FROM events WINDOW w AS " +
        "(PARTITION BY user_id ORDER BY ts)), " +
        "sess AS (SELECT user_id, ts, sum(new_sess) OVER " +
        "(PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) AS sid " +
        "FROM flagged) " +
        "SELECT user_id, CAST(floor(epoch(min(ts))) AS BIGINT) " +
        "AS session_start_sec, count(*) AS n_events " +
        "FROM sess GROUP BY user_id, sid " +
        "ORDER BY user_id, session_start_sec")),

    GraftQuery(
      "q_join_asof",
      "As-of join: each purchase matched to the user's latest click at " +
        "or before it. Spark lacks a native ASOF operator; the scalable " +
        "formulation is union-tag + one window (sort both sides together " +
        "per user, carry the last click forward with last(ignoreNulls)) " +
        "— a single shuffle on user_id, O(n log n) within partitions, no " +
        "join explosion, vs. the naive range self-join's O(clicks x " +
        "purchases) per user. Ties (click.ts == purchase.ts) match, so " +
        "clicks sort before purchases at equal ts; output carries the " +
        "matched click's ts (whole-second epoch), which is " +
        "tie-deterministic where event_id would not be. Oracle is " +
        "DuckDB's native ASOF LEFT JOIN.",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val ev = Tables.events(s, d)
          .filter(col("event_type").isin("click", "purchase"))
          .select(col("event_id"), col("user_id"), col("ts"),
            when(col("event_type") === "click", 0).otherwise(1).as("kind"))
        val w = Window.partitionBy("user_id")
          .orderBy(col("ts"), col("kind"), col("event_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ev.withColumn("click_ts",
            last(when(col("kind") === 0, col("ts")), ignoreNulls = true).over(w))
          .filter(col("kind") === 1)
          .select(col("event_id"), col("user_id"),
            unix_timestamp(col("ts")).as("purchase_sec"),
            unix_timestamp(col("click_ts")).as("click_sec"))
          .orderBy("event_id")
      },
      Some("SELECT p.event_id, p.user_id, " +
        "CAST(floor(epoch(p.ts)) AS BIGINT) AS purchase_sec, " +
        "CAST(floor(epoch(c.ts)) AS BIGINT) AS click_sec " +
        "FROM (SELECT * FROM events WHERE event_type = 'purchase') p " +
        "ASOF LEFT JOIN " +
        "(SELECT user_id, ts FROM events WHERE event_type = 'click') c " +
        "ON p.user_id = c.user_id AND c.ts <= p.ts " +
        "ORDER BY event_id")),

    GraftQuery(
      "q_events_gapfill",
      "Time-series gap fill: hourly aggregate densified over a " +
        "generated hour spine (sequence + explode), missing hours " +
        "zero-filled via left join. The heavy work is the bounded-key " +
        "hourly aggregate; the spine is O(#hours) — generated from a " +
        "1-row bounds aggregate and broadcast into the join at any " +
        "corpus size. Hour starts emitted as whole-second epochs " +
        "(ns-vs-µs safe).",
      (s, d) => {
        // referenced twice (spine bounds + the join's right side):
        // pin the bounded-cardinality aggregate so the events corpus
        // is scanned ONCE (the q_source_mix single-scan rule)
        val hourly = Tables.events(s, d)
          .groupBy(date_trunc("hour", col("ts")).as("h"))
          .agg(count(lit(1)).as("n"),
               decSum(col("value"), 18, 6).as("total_value"))
          .localCheckpoint()
        val spine = hourly.agg(min("h").as("hmin"), max("h").as("hmax"))
          .select(explode(sequence(col("hmin"), col("hmax"),
            expr("interval 1 hour"))).as("h"))
        spine.join(hourly, Seq("h"), "left")
          .select(unix_timestamp(col("h")).as("hour_sec"),
            coalesce(col("n"), lit(0L)).as("n"),
            coalesce(col("total_value"), lit(0.0d)).as("total_value"))
          .orderBy("hour_sec")
      },
      Some("WITH hourly AS (SELECT date_trunc('hour', ts) AS h, " +
        "count(*) AS n, " +
        "CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value " +
        "FROM events GROUP BY h), " +
        "spine AS (SELECT unnest(generate_series(min(h), max(h), " +
        "INTERVAL 1 HOUR)) AS h FROM hourly) " +
        "SELECT CAST(floor(epoch(spine.h)) AS BIGINT) AS hour_sec, " +
        "coalesce(n, 0) AS n, coalesce(total_value, 0.0) AS total_value " +
        "FROM spine LEFT JOIN hourly ON spine.h = hourly.h " +
        "ORDER BY hour_sec")),

    GraftQuery(
      "q_session_compact",
      "Boundary-fragment compaction law, end to end: slice the event " +
        "log into 2-hour \"micro-batches\", sessionize each slice " +
        "independently (the fragments a streaming Append sink would " +
        "emit), then compactSessions merges fragments across slice " +
        "boundaries. The oracle sessionizes the unsliced log directly " +
        "— compaction must reconstruct it exactly. Gap arithmetic in " +
        "exact microseconds; whole-second epochs only at presentation.",
      (s, d) => {
        val gapUs = 1800L * 1000000L
        val sliceUs = 7200L * 1000000L
        val wB = Window.partitionBy(col("user_id"), col("batch_id"))
          .orderBy("us")
        val frags = Tables.events(s, d)
          .select(col("user_id"), unix_micros(col("ts")).as("us"))
          .withColumn("batch_id", floor(col("us") / lit(sliceUs)))
          .withColumn("_new",
            when(lag(col("us"), 1).over(wB).isNull ||
              col("us") - lag(col("us"), 1).over(wB) >= gapUs, 1L)
              .otherwise(0L))
          .withColumn("_fid", sum(col("_new"))
            .over(wB.rowsBetween(Window.unboundedPreceding, 0)))
          .groupBy(col("user_id"), col("batch_id"), col("_fid"))
          .agg(min(col("us")).as("start"), max(col("us")).as("end"),
               count(lit(1)).as("n_events"))
          .select("user_id", "start", "end", "n_events")
        compactSessions(frags, gapUs)
          .select(col("user_id"),
            expr("start div 1000000").as("session_start_sec"),
            col("n_events"))
          .orderBy("user_id", "session_start_sec")
      },
      Some("WITH flagged AS (" +
        "SELECT user_id, ts, CASE WHEN lag(ts) OVER w IS NULL " +
        "OR ts - lag(ts) OVER w >= INTERVAL '30 minutes' THEN 1 ELSE 0 END " +
        "AS new_sess FROM events WINDOW w AS " +
        "(PARTITION BY user_id ORDER BY ts)), " +
        "sess AS (SELECT user_id, ts, sum(new_sess) OVER " +
        "(PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) AS sid " +
        "FROM flagged) " +
        "SELECT user_id, CAST(floor(epoch(min(ts))) AS BIGINT) " +
        "AS session_start_sec, count(*) AS n_events " +
        "FROM sess GROUP BY user_id, sid " +
        "ORDER BY user_id, session_start_sec"))
  )
}
