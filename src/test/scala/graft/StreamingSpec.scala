package graft

import graft.streaming.Streams
import org.apache.spark.sql.functions._

/** Live Structured Streaming runs of the §2.10 twins: file source →
  * windowed/session aggregation → memory sink, driven synchronously and
  * cross-checked against the batch forms (SURVEY §2.10: the batch queries
  * are the oracle; the stream must agree).
  */
class StreamingSpec extends SparkSpec {

  private lazy val inputDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_stream").toString
    Streams.prepareStreamInput(spark, sf, dir)
    dir
  }

  test("streaming tumbling window agg matches batch result") {
    val q = Streams.toMemorySink(
      Streams.tumblingCounts(Streams.eventStream(spark, inputDir)),
      "stream_tumbling", complete = true).start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.table("stream_tumbling")
      .select("win_start", "event_type", "n")
      .orderBy("win_start", "event_type").collect().toSeq
    val batch = Registry.byName("q_stream_1_tumbling").fn(spark, sf)
      .select("win_start", "event_type", "n")
      .orderBy("win_start", "event_type").collect().toSeq
    assert(streamed == batch)
  }

  test("streaming session windows match batch session_window") {
    val q = Streams.toMemorySink(
      Streams.sessionCounts(Streams.eventStream(spark, inputDir)),
      "stream_sessions", complete = true).start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.table("stream_sessions")
      .orderBy("user_id", "session_start").collect().toSeq
    val batch = Registry.byName("q_stream_3_session").fn(spark, sf)
      .select(col("session_start"), col("user_id"), col("n_events"))
      .orderBy("user_id", "session_start").collect().toSeq
    assert(streamed == batch)
  }

  test("streaming dropDuplicates keeps one row per (user, type)") {
    val q = Streams.toMemorySink(
      Streams.dedupeKeyed(Streams.eventStream(spark, inputDir)),
      "stream_dedupe", complete = false).start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.table("stream_dedupe")
    val nKeys = graft.sources.Tables(spark, sf, "events")
      .select("user_id", "event_type").distinct().count()
    assert(streamed.count() == nKeys)
    assert(streamed.select("user_id", "event_type").distinct().count() == nKeys)
  }

  test("stream-stream click-purchase join matches the batch join") {
    val q = Streams.toMemorySink(
      Streams.clickPurchaseJoin(Streams.eventStream(spark, inputDir)),
      "stream_sj", complete = false).start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.table("stream_sj")
      .orderBy("purchase_id", "click_id").collect().toSeq
    val batchEvents = graft.sources.Tables(spark, sf, "events")
      .select("event_id", "ts", "user_id", "event_type", "value")
    val batch = Streams.clickPurchaseJoin(batchEvents)
      .orderBy("purchase_id", "click_id").collect().toSeq
    assert(streamed.nonEmpty)
    assert(streamed == batch)
  }
}
