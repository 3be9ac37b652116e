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
        .orderBy("user_id"))
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
      FROM events GROUP BY user_id ORDER BY user_id"""
  )
}
