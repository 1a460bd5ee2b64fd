package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, Trigger}
import org.apache.spark.sql.types._
import org.apache.spark.sql.Row

/** Structured Streaming twins of the §2.10 batch queries.
  *
  * The batch forms in graft.operators.EventOps are the oracle-checkable
  * contract; these builders run the SAME aggregations under `readStream`,
  * proving the operators are genuinely streaming-capable. Unit tests
  * drive them with a file source + memory sink + processAllAvailable.
  *
  * Scale notes: watermarks bound state (events later than the mark are
  * dropped, closed windows are evicted); session windows merge per key —
  * state is O(open sessions). At 100 TB/day the source would be Kafka
  * with the same code from `.withWatermark` onward.
  */
object Streams {

  /** Schema of the events stream (FIXTURES.md), ts already a timestamp. */
  val eventSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType)))

  /** File-source stream over a directory of event parquet (ts must
    * already be µs — write through `prepareStreamInput`).
    */
  def eventStream(spark: SparkSession, dir: String): DataFrame =
    spark.readStream.schema(eventSchema).parquet(dir)

  /** Write the fixture events table into a temp dir in the stream-ready
    * shape (ns→µs fix applied, props dropped).
    */
  def prepareStreamInput(spark: SparkSession, sfDir: String, outDir: String): Unit =
    graft.sources.Tables(spark, sfDir, "events")
      .select("event_id", "ts", "user_id", "event_type", "value")
      .write.mode("overwrite").parquet(outDir)

  /** Tumbling 1h counts/sums per event_type with a 10min watermark —
    * streaming twin of q_stream_1_tumbling.
    */
  def tumblingCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum("value").as("sum_value"))
      .select(col("window.start").as("win_start"), col("event_type"), col("n"), col("sum_value"))

  /** Per-user session windows (30min gap) — streaming twin of
    * q_stream_3_session.
    */
  def sessionCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("session_window.start").as("session_start"), col("user_id"), col("n_events"))

  /** Streaming keyed dedupe — twin of q_stream_5_dedupe_keyed.
    * dropDuplicatesWithinWatermark so per-key state is EVICTED once the
    * watermark passes (plain dropDuplicates on a key subset without the
    * event-time column would retain every key forever). Semantics:
    * first-arrived row per key within the watermark window; the batch
    * twin picks min(ts, event_id) — they agree when input is one
    * time-ordered batch (the test setup), not under arbitrary arrival
    * orders.
    */
  def dedupeKeyed(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("user_id", "event_type")

  /** ts_us = epoch microseconds (`unix_micros(ts)`) — java.sql.Timestamp
    * getters would silently truncate to milliseconds.
    */
  final case class SessionEvent(user_id: Long, ts_us: Long)
  final case class UserSession(user_id: Long, session_start_us: Long, n_events: Long)

  /** Custom-state sessionizer via `flatMapGroupsWithState` — the escape
    * hatch when `session_window` can't express the state machine (e.g.
    * per-session value caps, dynamic gaps). Batch mode: each key's full
    * iterator arrives at once and the gap fold runs in place. In a
    * streaming query the identical callback runs incrementally with
    * `GroupStateTimeout.EventTimeTimeout` driving session closure.
    *
    * Scale note: one shuffle on the grouping key; state is O(1) per open
    * session. Uses the same inclusive-gap merge rule as session_window
    * (an event at exactly prev+gap merges) so the two agree exactly.
    */
  def sessionize(ds: org.apache.spark.sql.Dataset[SessionEvent], gapMinutes: Int): org.apache.spark.sql.Dataset[UserSession] = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    import ds.sparkSession.implicits._
    val gapUs = gapMinutes * 60000000L
    ds.groupByKey(_.user_id)
      .flatMapGroupsWithState[Long, UserSession](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (user: Long, events: Iterator[SessionEvent], _: GroupState[Long]) =>
          val ts = events.map(_.ts_us).toArray.sorted
          val out = scala.collection.mutable.ArrayBuffer.empty[UserSession]
          var start = 0
          for (i <- 1 until ts.length)
            if (ts(i) - ts(i - 1) > gapUs) { // strictly greater: prev+gap merges
              out += UserSession(user, ts(start), (i - start).toLong)
              start = i
            }
          if (ts.nonEmpty)
            out += UserSession(user, ts(start), (ts.length - start).toLong)
          out.iterator
      }
  }

  /** Stream-stream join: each purchase joined to the same user's clicks
    * from the preceding hour. Both sides watermarked (bounds the join
    * state buffers); the click's validity end is precomputed per row —
    * interval arithmetic must never sit in the join residual (PERF.md
    * finding 1).
    */
  def clickPurchaseJoin(events: DataFrame): DataFrame = {
    val clicks = events.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("event_id").as("click_id"),
        col("ts").as("click_ts"))
      .withColumn("click_end", col("click_ts") + expr("INTERVAL 1 HOUR"))
      .withWatermark("click_ts", "2 hours")
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("event_id").as("purchase_id"),
        col("ts").as("purchase_ts"))
      .withWatermark("purchase_ts", "2 hours")
    purchases.join(clicks,
      col("p_user") === col("c_user") &&
        col("purchase_ts") >= col("click_ts") &&
        col("purchase_ts") < col("click_end"))
      .select(col("p_user").as("user_id"), col("purchase_id"), col("click_id"),
        col("purchase_ts"), col("click_ts"))
  }

  /** Memory-sink writer used by the tests (complete mode for aggregates). */
  def toMemorySink(df: DataFrame, name: String, complete: Boolean): DataStreamWriter[Row] =
    df.writeStream
      .format("memory")
      .queryName(name)
      .outputMode(if (complete) "complete" else "append")
      .trigger(Trigger.AvailableNow())
}
