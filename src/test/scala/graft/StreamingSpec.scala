package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.streaming.EventStreams

/** True Structured Streaming runs (readStream → watermark → window →
  * memory sink), checked against the batch-mode definition of the
  * same transform — the core "one definition, two modes" guarantee.
  */
class StreamingSpec extends AnyFunSuite {
  lazy val s = TestSpark.spark
  val d = TestSpark.sf0001

  test("streaming tumbling-window counts equal batch counts") {
    val stream = EventStreams.readEventStream(s, d)
    val q = EventStreams.tumblingCountsStreaming(stream)
      .writeStream.outputMode("complete")
      .format("memory").queryName("tumbling_out")
      .start()
    try {
      q.processAllAvailable()
      val streamed = s.table("tumbling_out")
        .orderBy("window_start", "event_type").collect()
      val batch = EventStreams.tumblingCounts(Tables.events(s, d))
        .orderBy("window_start", "event_type").collect()
      assert(streamed.length === batch.length)
      assert(streamed.map(_.toSeq).toSeq === batch.map(_.toSeq).toSeq)
    } finally q.stop()
  }

  test("stateful flatMapGroupsWithState totals converge to the batch aggregate") {
    val stream = EventStreams.readEventStream(s, d)
    val q = EventStreams.userTotalsStreaming(stream)
      .writeStream.outputMode("append")
      .format("memory").queryName("totals_out")
      .start()
    try {
      q.processAllAvailable()
      // last emission per user == final state snapshot
      val streamed = s.table("totals_out")
        .groupBy("user_id")
        .agg(max(struct(col("n_events"), col("sum_value"), col("last_seen_ms"))).as("st"))
        .select(col("user_id"), col("st.n_events"), col("st.sum_value"), col("st.last_seen_ms"))
        .orderBy("user_id").collect()
      val batch = EventStreams.userTotalsBatch(Tables.events(s, d))
        .orderBy("user_id").collect()
      assert(streamed.length === batch.length)
      streamed.zip(batch).foreach { case (st, b) =>
        assert(st.getLong(0) === b.getLong(0))
        assert(st.getLong(1) === b.getLong(1), s"n_events for user ${st.getLong(0)}")
        assert(math.abs(st.getDouble(2) - b.getDouble(2)) < 1e-9,
          s"sum_value for user ${st.getLong(0)}")
        assert(st.getLong(3) === b.getLong(3), s"last_seen for user ${st.getLong(0)}")
      }
    } finally q.stop()
  }

  test("streaming session windows equal batch session windows") {
    val stream = EventStreams.readEventStream(s, d)
    val q = EventStreams.sessionStatsStreaming(stream)
      .writeStream.outputMode("complete")
      .format("memory").queryName("session_out")
      .start()
    try {
      q.processAllAvailable()
      val streamed = s.table("session_out")
        .orderBy("user_id", "session_start").collect()
      val batch = EventStreams.sessionStats(Tables.events(s, d))
        .orderBy("user_id", "session_start").collect()
      assert(streamed.map(_.toSeq).toSeq === batch.map(_.toSeq).toSeq)
    } finally q.stop()
  }
}
