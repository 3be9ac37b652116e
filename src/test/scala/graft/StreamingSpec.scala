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
