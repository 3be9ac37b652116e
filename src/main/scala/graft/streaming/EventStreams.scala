package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Structured Streaming surface over the `events` fixture. The
  * reference has no streaming at all (its batch loop is bounded file
  * iteration, `/root/reference/src/main.rs:75` — SURVEY §2.2), so this
  * is pure extension: watermarked tumbling/sliding/session windows.
  *
  * Design: each windowed aggregation is defined ONCE as a DataFrame
  * transform that works on either a batch or a streaming source —
  * batch mode feeds the DuckDB oracle (graft.operators.StreamingOps),
  * streaming mode (readStream + watermark + memory sink) is exercised
  * in StreamingSpec. That "one definition, two modes" shape is exactly
  * how Structured Streaming is meant to be used, and it means the
  * correctness gate covers the same plan the stream runs.
  */
object EventStreams {

  /** Schema for streaming reads (streams can't infer). The fixture's
    * `ts` has shipped as TIMESTAMP(NANOS) — readable only as
    * epoch-nanos int64 via nanosAsLong — TIMESTAMP(MICROS) UTC-adjusted
    * (TimestampType), and TIMESTAMP(MICROS) non-adjusted
    * (TIMESTAMP_NTZ); see graft.Tables. The stream declares whichever
    * shape the batch footer reports and [[normalize]] maps all of them
    * to microsecond TimestampType — watermarks and event-time windows
    * require the LTZ type. */
  private def rawSchema(tsType: org.apache.spark.sql.types.DataType): StructType =
    StructType(Seq(
      StructField("event_id", LongType),
      StructField("ts", tsType),
      StructField("user_id", LongType),
      StructField("event_type", StringType),
      StructField("value", DoubleType),
      StructField("props", StringType)))

  def normalize(raw: DataFrame): DataFrame = raw.schema("ts").dataType match {
    case LongType         => raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    // value-identical under the UTC session timezone; watermarks
    // reject NTZ (EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE) so the cast is
    // mandatory for every streaming path
    case TimestampNTZType => raw.withColumn("ts", col("ts").cast(TimestampType))
    case _                => raw // already TimestampType (micros)
  }

  /** Open the events fixture as an unbounded file stream. The file
    * source wants a directory, so stream the sf dir with a glob filter
    * — also the realistic shape: new event files landing in a
    * directory is exactly how a 100 TB stream arrives. */
  def readEventStream(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // one footer read decides which physical ts shape this fixture has
    val tsType = spark.read.parquet(s"$sfDir/events.parquet").schema("ts").dataType
    normalize(spark.readStream.schema(rawSchema(tsType))
      .option("maxFilesPerTrigger", "1")
      .option("pathGlobFilter", "events.parquet")
      .parquet(sfDir))
  }

  /** Stream a directory of already-NORMALIZED event files (written by
    * the late-feed tests from Tables.events output, so ts is µs
    * TimestampType) one file per trigger, oldest mtime first — the
    * replay harness for out-of-order arrival, where trigger order is
    * the test's control variable. */
  def readEventFeed(spark: SparkSession, dir: String): DataFrame =
    spark.readStream.schema(rawSchema(TimestampType))
      .option("maxFilesPerTrigger", "1")
      .parquet(dir)

  /** Tumbling 1-hour counts/sums per event type. */
  def tumblingCounts(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast(DecimalType(12, 2))).cast(DoubleType).as("sum_value"))
      .select(col("w.start").as("window_start"), col("event_type"),
        col("n_events"), col("sum_value"))

  /** Sliding 1-hour windows every 30 minutes. */
  def slidingCounts(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour", "30 minutes").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("w.start").as("window_start"), col("event_type"), col("n_events"))

  /** Per-user session windows with a 30-minute inactivity gap. */
  def sessionStats(events: DataFrame): DataFrame =
    events
      .groupBy(session_window(col("ts"), "30 minutes").as("w"), col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        max(col("ts")).as("last_ts"))
      .select(col("w.start").as("session_start"), col("user_id"),
        col("n_events"), col("last_ts"))

  /** Tumbling 6-hour per-window DISTINCT-USER sketch: the mergeable
    * HLL++ register set per window — the only distinct an unbounded
    * 100 TB stream can afford. Exact per-window distinct needs
    * per-window key state proportional to the user space; the sketch
    * is FIXED-size per window, its partials merge across partitions
    * and micro-batches by register-max (order-free, so the streaming
    * estimate is BIT-IDENTICAL to the batch one — pinned in
    * StreamingSpec), and the watermark lets the window's registers
    * evict once closed. rsd 2%, the a01 sketch convention; the
    * estimate-vs-exact error is gated in st06. */
  def windowUserSketch(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "6 hours").as("w"))
      .agg(count(lit(1)).as("n_events"),
        approx_count_distinct(col("user_id"), 0.02).as("hll_users"))
      .select(col("w.start").as("window_start"), col("n_events"),
        col("hll_users"))

  def windowUserSketchStreaming(events: DataFrame): DataFrame =
    windowUserSketch(events.withWatermark("ts", "2 hours"))

  /** Watermarked variant for true streaming runs: drop events >2 hours
    * late before windowing (append-mode compatible). */
  def tumblingCountsStreaming(events: DataFrame): DataFrame =
    tumblingCounts(events.withWatermark("ts", "2 hours"))

  def sessionStatsStreaming(events: DataFrame): DataFrame =
    sessionStats(events.withWatermark("ts", "2 hours"))

  // -------------------------------------------------------------------
  // Late-data decomposition (st07) — the load-bearing watermark path.
  // The events fixture arrives in exact ts order, so every watermark
  // test that streams it verbatim is vacuous: no row is ever late and
  // the suite stays green with the watermark deleted (the r13 verdict
  // finding). These helpers define a DETERMINISTIC late-arrival replay
  // of the same fixture — the on-time rows (the full ts span) are
  // delivered first, the late set replays in a LATER trigger, after
  // the watermark has advanced to (max on-time ts − 2 h) — and the
  // drop model below reproduces, µs-exactly, which late rows Spark
  // admits: the engine floors the tracked max event time to MILLIS
  // (EventTimeStats accumulates ms), subtracts the 2 h delay, and
  // drops a row iff its 1-hour WINDOW END (exclusive, epoch-aligned)
  // is ≤ that watermark — lateness is judged per window, not per row.
  // StreamingSpec pins the real stream to this model (and fails if
  // the watermark is removed: the late rows would then be counted);
  // st07's DuckDB oracle replays the model arithmetic independently.
  //
  // One engine subtlety the feed must respect: since Spark 3.4 the
  // late-record filter uses the PREVIOUS batch's watermark while
  // state eviction uses the current one (the StateStoreSave operator
  // prints both), so a watermark advanced by batch N only starts
  // DROPPING in batch N+2. The replay therefore runs three triggers:
  // the on-time span (advances the watermark), a small on-time nudge
  // batch (lets the advance become the late-filter's watermark), then
  // the late set — which is filtered against (max on-time ts − 2 h)
  // exactly as the model assumes. The nudge rows are chosen strictly
  // below the on-time max, so they advance nothing themselves.
  // -------------------------------------------------------------------

  /** The on-time feed: every event outside the %11 late class. Spans
    * the fixture's whole ts range, so processing it as trigger 1
    * advances the watermark to (its max ts − 2 h). */
  def lateOnTime(events: DataFrame): DataFrame =
    events.filter(col("event_id") % 11 =!= 0)

  /** Trigger-2 nudge: a deterministic on-time subset (%19 ≡ 7, ≥6 h
    * below the on-time max so it can never raise the watermark or be
    * filtered itself — its own batch's late-filter watermark is still
    * the initial 0). Its only job is to let trigger 1's watermark
    * advance become the late filter for trigger 3. */
  def lateNudge(events: DataFrame): DataFrame = {
    val onTimeMaxTs = lateOnTime(events)
      .agg(max(col("ts"))).head().getTimestamp(0)
    lateOnTime(events).filter(col("event_id") % 19 === 7 &&
      col("ts") < lit(onTimeMaxTs) - expr("INTERVAL 6 HOURS"))
  }

  /** Trigger 1 = the on-time rows minus the nudge batch (predicate
    * complement, no join). Contains the on-time max ts row by
    * construction (the nudge excludes the last 6 h), so the watermark
    * after trigger 1 is (max on-time ts − 2 h). */
  def lateMain(events: DataFrame): DataFrame = {
    val onTimeMaxTs = lateOnTime(events)
      .agg(max(col("ts"))).head().getTimestamp(0)
    lateOnTime(events).filter(!(col("event_id") % 19 === 7 &&
      col("ts") < lit(onTimeMaxTs) - expr("INTERVAL 6 HOURS")))
  }

  /** The late feed, delivered as trigger 2: the %11 class replayed at
    * its ORIGINAL timestamps (spread over 30 days — almost all of it
    * far below the watermark and droppable) plus a fresh-arrival twin
    * class (%17 ≡ 3) re-stamped AT the on-time max ts — inside the
    * 2 h horizon by construction, so the keep side of the boundary is
    * exercised at every SF (the natural last-2-hours tail is near
    * empty at sf0.001). */
  def lateArrivals(events: DataFrame): DataFrame = {
    val onTimeMaxTs = lateOnTime(events)
      .agg(max(col("ts"))).head().getTimestamp(0) // bounded: 1 scalar
    events.filter(col("event_id") % 11 === 0)
      .unionByName(events.filter(col("event_id") % 17 === 3)
        .withColumn("ts", lit(onTimeMaxTs)))
  }

  /** The rows a 2-h-watermarked 1-h tumbling aggregation admits when
    * [[lateArrivals]] replays after [[lateOnTime]] — Spark's exact
    * arithmetic: wm_µs = (floor(max_on_time_µs / 1000) − 7 200 000) ×
    * 1000; a late row survives iff its window end (exclusive) exceeds
    * wm. */
  def lateSurvivors(events: DataFrame): DataFrame = {
    val a = lateOnTime(events)
    val maxUs = a.agg(max(unix_micros(col("ts")))).head().getLong(0)
    val wmUs = (maxUs / 1000L - 7200000L) * 1000L
    a.unionByName(lateArrivals(events)
      .filter((expr("unix_micros(ts) div 3600000000") + 1L) * 3600000000L
        > wmUs))
  }

  /** Custom arbitrary state: per-user running totals via
    * flatMapGroupsWithState — the escape hatch for stateful logic the
    * built-in windows can't express (here: lifetime event count, value
    * sum, and last-seen timestamp emitted per micro-batch). State is
    * partitioned by user_id, so it scales with the key space across
    * executors, and the emitted snapshot converges to the batch
    * groupBy aggregate once the stream is drained.
    */
  def userTotalsStreaming(events: DataFrame): org.apache.spark.sql.Dataset[UserTotals] = {
    import org.apache.spark.sql.{Encoders, Row}
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    implicit val stateEnc = Encoders.product[UserTotals]
    implicit val longEnc = Encoders.scalaLong
    // Event-time is reduced to epoch-millis IN THE PLAN, not inside the
    // state function: a Row accessor sees whichever JVM type the
    // physical ts shape maps to (java.sql.Timestamp for LTZ,
    // java.time.LocalDateTime for NTZ) and a hard getAs cast is
    // shape-fragile — a column cast + unix_millis is not, and it keeps
    // the conversion codegen'd instead of per-row reflective.
    val prepared = events.select(
      col("user_id"), col("value"),
      unix_millis(col("ts").cast(TimestampType)).as("ts_ms"))
    prepared
      .groupByKey((r: Row) => r.getAs[Long]("user_id"))(longEnc)
      .flatMapGroupsWithState[UserTotals, UserTotals](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (userId: Long, rows: Iterator[Row], state: GroupState[UserTotals]) =>
          val prev = state.getOption.getOrElse(UserTotals(userId, 0L, 0.0, Long.MinValue))
          val next = rows.foldLeft(prev) { (acc, r) =>
            UserTotals(userId, acc.n_events + 1,
              // cents-exact accumulation (value has 2dp) so the final
              // snapshot is order-independent
              math.rint(acc.sum_value * 100 + r.getAs[Double]("value") * 100) / 100,
              math.max(acc.last_seen_ms, r.getAs[Long]("ts_ms")))
          }
          state.update(next)
          Iterator(next)
      }
  }

  /** Exactly-once-style stream dedup on event id: duplicates arriving
    * within the watermark horizon are dropped with bounded state
    * (state evicts as the watermark passes — the only dedup that
    * survives an unbounded 100 TB stream; plain dropDuplicates would
    * grow state forever). */
  def dedupedStream(events: DataFrame): DataFrame =
    events.withWatermark("ts", "2 hours")
      .dropDuplicatesWithinWatermark("event_id")

  /** Stream-static enrichment join: the static side is planned per
    * micro-batch (broadcast at dim size), the stream side stays
    * unbounded — the canonical fact-stream ⋈ dimension shape. */
  def enriched(events: DataFrame, dim: DataFrame): DataFrame =
    events.join(broadcast(dim), Seq("event_type"), "left_outer")

  /** Stream-STREAM inner join: purchases matched to errors by the same
    * user within the following 30 minutes. Both sides carry watermarks
    * and the join condition time-bounds the match window, so each
    * side's buffered state evicts once the other side's watermark
    * passes — bounded state on an unbounded pair of streams, the only
    * stream-stream join shape that survives at 100 TB/day. The range
    * predicate doubles as the state-cleanup condition; without it
    * Spark would buffer both streams forever.
    */
  def purchaseErrorJoin(purchases: DataFrame, errors: DataFrame): DataFrame = {
    val p = purchases.filter(col("event_type") === "purchase")
      .withWatermark("ts", "1 hour")
      .select(col("event_id").as("purchase_id"), col("user_id"),
        col("ts").as("purchase_ts"))
    val e = errors.filter(col("event_type") === "error")
      .withWatermark("ts", "1 hour")
      .select(col("event_id").as("error_id"), col("user_id").as("err_user"),
        col("ts").as("error_ts"))
    p.join(e, expr("""
      user_id = err_user AND
      error_ts >= purchase_ts AND
      error_ts <= purchase_ts + INTERVAL 30 MINUTES"""))
      .select(col("user_id"), col("purchase_id"), col("error_id"),
        col("purchase_ts"), col("error_ts"))
  }

  /** Batch equivalent of [[purchaseErrorJoin]] for parity checks. */
  def purchaseErrorJoinBatch(events: DataFrame): DataFrame =
    purchaseErrorJoin(events, events)

  /** Batch equivalent of the final state of [[userTotalsStreaming]].
    * The ts cast is a no-op on normalized input and keeps unix_millis
    * legal if a caller hands in a raw NTZ frame. */
  def userTotalsBatch(events: DataFrame): DataFrame =
    events.groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        (sum(col("value").cast(org.apache.spark.sql.types.DecimalType(14, 2)))
          .cast(org.apache.spark.sql.types.DoubleType)).as("sum_value"),
        (unix_millis(max(col("ts").cast(TimestampType)))).as("last_seen_ms"))
}

/** State/output record for the stateful stream. */
case class UserTotals(user_id: Long, n_events: Long, sum_value: Double,
                      last_seen_ms: Long)
