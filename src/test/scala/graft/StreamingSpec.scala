package graft

import graft.streaming.EventsStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** Structured Streaming smoke over the real events parquet: windowed agg
  * with watermark matches the equivalent batch query; stateful running
  * per-user stats accumulate.
  */
class StreamingSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  /** File-source streams need a directory; stage the single events file
    * into one.
    */
  private lazy val eventsDir: String = {
    val d = java.nio.file.Files.createTempDirectory("graft-stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$dir/events.parquet"),
      d.resolve("events.parquet"))
    d.toString
  }

  test("windowed streaming aggregation matches the batch equivalent") {
    val streamed = EventsStream.runToMemorySink(
      EventsStream.windowedRates(EventsStream.read(spark, eventsDir)),
      "stream_rates")
    val batch = EventsStream.windowedRates(
      graft.core.Tables(spark, dir).events
        .select("event_id", "ts", "user_id", "event_type", "value", "props"))
    // batch "streaming" DF: same expression tree works on a static frame
    val batchRows = batch.count()
    assert(streamed.count() == batchRows && batchRows > 0)
    val s = streamed.agg(sum("n_events")).head.getLong(0)
    assert(s == 1000) // every event lands in exactly one tumbling window
  }

  test("mapGroupsWithState accumulates running per-user stats") {
    val out = EventsStream.runToMemorySink(
      EventsStream.runningUserStats(
        EventsStream.read(spark, eventsDir)).toDF(),
      "stream_user_stats", OutputMode.Update())
    val total = out.agg(sum("n")).head.getLong(0)
    assert(total == 1000)
    assert(out.filter(col("mean") < 0).count() == 0)
  }
}
