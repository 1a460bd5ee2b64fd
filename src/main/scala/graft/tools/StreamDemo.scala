package graft.tools

import graft.streaming.Streams
import org.apache.spark.sql.SparkSession

/** Dev utility / demo: run the Structured Streaming twins end-to-end
  * (file source → windowed aggregation → memory sink) against a fixture
  * directory and print the results.
  */
object StreamDemo {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = LocalSession("4")
    spark.sparkContext.setLogLevel("ERROR")
    val dir = java.nio.file.Files.createTempDirectory("graft_stream_demo").toString
    Streams.prepareStreamInput(spark, sfDir, dir)

    val tumbling = Streams.toMemorySink(
      Streams.tumblingCounts(Streams.eventStream(spark, dir)), "demo_tumbling", complete = true).start()
    tumbling.processAllAvailable(); tumbling.stop()
    println(s"tumbling windows: ${spark.table("demo_tumbling").count()} rows")
    spark.table("demo_tumbling").orderBy("win_start", "event_type").show(5)

    val sessions = Streams.toMemorySink(
      Streams.sessionCounts(Streams.eventStream(spark, dir)), "demo_sessions", complete = true).start()
    sessions.processAllAvailable(); sessions.stop()
    println(s"session windows: ${spark.table("demo_sessions").count()} rows")
    spark.table("demo_sessions").orderBy("user_id", "session_start").show(5)

    val sj = Streams.toMemorySink(
      Streams.clickPurchaseJoin(Streams.eventStream(spark, dir)), "demo_sj", complete = false).start()
    sj.processAllAvailable(); sj.stop()
    println(s"stream-stream click→purchase joins: ${spark.table("demo_sj").count()} rows")
    spark.table("demo_sj").orderBy("purchase_id", "click_id").show(5)
    spark.stop()
  }
}
