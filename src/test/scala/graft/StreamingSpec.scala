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

  test("flatMapGroupsWithState sessionization matches batch sessions (closed ones)") {
    import org.apache.spark.sql.expressions.Window
    val streamed = EventsStream.runToMemorySink(
      EventsStream.sessionizeStream(EventsStream.read(spark, eventsDir)).toDF(),
      "stream_sessions", OutputMode.Append())
      .select("user_id", "session_start", "session_end",
              "n_events", "total_value", "duration_seconds")
    val ev = graft.core.Tables(spark, dir).events
    val sess = graft.operators.TemporalJoins
      .sessionize(ev, Seq("user_id"), "ts", 30L * 60 * 1000000)
    val batch = sess.groupBy(col("user_id"), col("session_seq"))
      .agg(min(col("ts")).as("session_start"), max(col("ts")).as("session_end"),
           count(lit(1)).as("n_events"),
           sum(col("value").cast("decimal(18,2)")).cast("double").as("total_value"),
           ((unix_micros(max(col("ts"))) - unix_micros(min(col("ts")))) / lit(1000000L))
             .cast("long").as("duration_seconds"))
    // each user's LAST session is still open in stream state → closed only
    val closedBatch = batch
      .withColumn("max_seq", max(col("session_seq")).over(Window.partitionBy(col("user_id"))))
      .filter(col("session_seq") < col("max_seq"))
      .select("user_id", "session_start", "session_end",
              "n_events", "total_value", "duration_seconds")
    assert(streamed.count() > 0)
    assert(streamed.exceptAll(closedBatch).isEmpty, "stream rows missing from batch")
    assert(closedBatch.exceptAll(streamed).isEmpty, "batch rows missing from stream")
  }

  test("foreachBatch incremental sink upserts by key and replays idempotently") {
    val target = java.nio.file.Files.createTempDirectory("graft-inc-target").toString
    def runOnce(checkpoint: String): Unit = {
      val q = EventsStream.incrementalSink(
        EventsStream.read(spark, eventsDir).select("event_id", "ts", "value"),
        target, "event_id", checkpoint, s"inc_sink_${checkpoint.hashCode}")
      q.processAllAvailable(); q.stop()
    }
    runOnce(java.nio.file.Files.createTempDirectory("graft-inc-cp1").toString)
    val after1 = spark.read.parquet(target).count()
    assert(after1 == 1000) // every distinct event_id landed once
    // fresh checkpoint → the source REPLAYS everything; the key anti-join
    // must keep the target unchanged
    runOnce(java.nio.file.Files.createTempDirectory("graft-inc-cp2").toString)
    val after2 = spark.read.parquet(target)
    assert(after2.count() == 1000)
    assert(after2.select("event_id").distinct().count() == 1000)
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
