package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.streaming.EventStreams

/** Batch-mode registrations of the streaming window aggregations
  * (graft.streaming.EventStreams) so the DuckDB oracle can check
  * their semantics — window()/session_window() produce identical
  * results in batch and streaming for on-time data, so the gate
  * covers the streaming plans (SURVEY §7.3 M3).
  */
object StreamingOps {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "st01_tumbling_window" -> ((s, d) =>
      EventStreams.tumblingCounts(Tables.events(s, d))
        .orderBy("window_start", "event_type")),

    "st02_sliding_window" -> ((s, d) =>
      EventStreams.slidingCounts(Tables.events(s, d))
        .orderBy("window_start", "event_type")),

    "st03_session_window" -> ((s, d) =>
      EventStreams.sessionStats(Tables.events(s, d))
        .orderBy("user_id", "session_start")),

    // st04: the stream-stream interval join, batch-mode — watermarks
    // are a no-op on a bounded source, so this checks exactly the join
    // predicate/state-bound condition the true streaming run uses
    // (StreamingSpec asserts batch/stream parity on the same plan).
    "st04_stream_stream_join" -> ((s, d) =>
      EventStreams.purchaseErrorJoinBatch(Tables.events(s, d))
        .orderBy("purchase_id", "error_id")),

    // st05: the convergent state of the flatMapGroupsWithState custom
    // aggregator (EventStreams.userTotalsStreaming), batch-mode — the
    // stream run's final snapshot equals this aggregate (parity pinned
    // in StreamingSpec); registering the batch twin puts the custom-
    // state semantics under the DuckDB hash gate too.
    "st05_stateful_user_totals" -> ((s, d) =>
      EventStreams.userTotalsBatch(Tables.events(s, d))
        .orderBy("user_id")),

    // st06: per-window distinct-user SKETCH maintenance — the batch
    // registration of EventStreams.windowUserSketch (streaming parity
    // is pinned in StreamingSpec: the HLL merge is register-max,
    // order-free, so stream and batch estimates are bit-identical).
    // The oracle-checkable half is the exact per-window distinct and
    // event count; the sketch's contribution is the per-window hll_ok
    // flag (a04/a08 convention: |est − exact| within the rsd-2%
    // envelope, +2 absolute for the small-window tail) — a constant-1
    // column the DuckDB replay derives independently, so estimator
    // drift flips the hash red. The exact leg is gate pricing only:
    // at 100 TB the PRODUCT is the sketch (fixed bytes per window);
    // the exact distinct exists to price it, the a05 pattern.
    "st06_window_distinct_hll" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val exact = ev
        .groupBy(window(col("ts"), "6 hours").as("w"))
        .agg(countDistinct(col("user_id")).as("exact_users"))
        .select(col("w.start").as("window_start"), col("exact_users"))
      EventStreams.windowUserSketch(ev)
        .join(exact, Seq("window_start"))
        .select(col("window_start"), col("n_events"), col("exact_users"),
          when(abs(col("hll_users") - col("exact_users"))
            .cast(org.apache.spark.sql.types.DoubleType)
            <= col("exact_users") * 0.05 + lit(2.0), 1L)
            .otherwise(0L).as("hll_ok"))
        .orderBy("window_start")
    })
  )

  // Oracle notes: Spark tumbling windows align to the epoch, exactly
  // like DuckDB time_bucket for sub-month widths. A sliding (1h, 30m)
  // window set == two phase-shifted tumbling sets (offsets 0m and 30m).
  // Session windows are the classic gaps-and-islands rewrite.
  val oracle: Map[String, String] = Map(
    "st01_tumbling_window" -> """
      SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start, event_type,
        COUNT(*) AS n_events,
        CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
      FROM events
      GROUP BY 1, 2 ORDER BY window_start, event_type""",

    "st02_sliding_window" -> """
      WITH starts AS (
        SELECT time_bucket(INTERVAL '30 minutes', ts) AS window_start, event_type FROM events
        UNION ALL
        SELECT time_bucket(INTERVAL '30 minutes', ts) - INTERVAL '30 minutes' AS window_start,
               event_type FROM events)
      SELECT window_start, event_type, COUNT(*) AS n_events
      FROM starts GROUP BY 1, 2 ORDER BY window_start, event_type""",

    "st03_session_window" -> """
      WITH ordered AS (
        SELECT user_id, ts,
          CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) > INTERVAL '30 minutes'
                 OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
               THEN 1 ELSE 0 END AS new_session
        FROM events),
      sessioned AS (
        SELECT user_id, ts,
          SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
        FROM ordered)
      SELECT MIN(ts) AS session_start, user_id,
        COUNT(*) AS n_events, MAX(ts) AS last_ts
      FROM sessioned GROUP BY user_id, session_id
      ORDER BY user_id, session_start""",

    "st04_stream_stream_join" -> """
      SELECT p.user_id AS user_id, p.event_id AS purchase_id,
        e.event_id AS error_id, p.ts AS purchase_ts, e.ts AS error_ts
      FROM events p JOIN events e
        ON p.event_type = 'purchase' AND e.event_type = 'error'
        AND e.user_id = p.user_id
        AND e.ts >= p.ts AND e.ts <= p.ts + INTERVAL '30 minutes'
      ORDER BY purchase_id, error_id""",

    "st05_stateful_user_totals" -> """
      SELECT user_id, COUNT(*) AS n_events,
        CAST(SUM(CAST(value AS DECIMAL(14,2))) AS DOUBLE) AS sum_value,
        epoch_ms(MAX(ts)) AS last_seen_ms
      FROM events GROUP BY user_id ORDER BY user_id""",

    // st06: the exact per-window leg replays in SQL; the sketch's
    // accuracy contract arrives as the independently-derived
    // constant-1 hll_ok column
    "st06_window_distinct_hll" -> """
      SELECT time_bucket(INTERVAL '6 hours', ts) AS window_start,
        COUNT(*) AS n_events,
        COUNT(DISTINCT user_id) AS exact_users,
        CAST(1 AS BIGINT) AS hll_ok
      FROM events GROUP BY 1 ORDER BY window_start"""
  )
}
