package graft.streaming

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** Structured Streaming over the `events` table — the stretch goal from
  * SURVEY §2.10: nothing in the reference streams, but its incremental
  * high-watermark append is exactly a batch rendering of this pipeline,
  * so the engine ships the streaming form too:
  * `readStream → withWatermark → window agg → sink`, plus a
  * `mapGroupsWithState` running per-user aggregate for custom state.
  *
  * The parquet ts column is TIMESTAMP(NANOS) (unsupported by the reader),
  * so the stream reads it as long and truncates to µs, matching
  * [[graft.core.Tables.events]].
  */
object EventsStream {

  val eventSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType), // nanos-as-long (legacy reader mode)
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** File-source stream of events from a directory of parquet files. */
  def read(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.readStream
      .schema(eventSchema)
      .parquet(dir)
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }

  /** Tumbling-window rates per event type with a late-data watermark —
    * the canonical streaming aggregation (guide §Structured Streaming).
    */
  def windowedRates(events: DataFrame,
                    watermark: String = "1 hour",
                    window_ : String = "6 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), window_), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
           sum(col("value")).as("total_value"))
      .select(col("window.start").as("window_start"),
              col("window.end").as("window_end"),
              col("event_type"), col("n_events"), col("total_value"))

  final case class UserEvent(user_id: Long, value: Double)
  final case class UserRunning(user_id: Long, n: Long, total: Double, mean: Double)

  /** Custom state: running per-user count/sum/mean via mapGroupsWithState —
    * the streaming analog of the incremental materializer's "only fold in
    * what's new" semantics.
    */
  def runningUserStats(events: DataFrame): Dataset[UserRunning] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.select(col("user_id"), col("value")).as[UserEvent]
      .groupByKey(_.user_id)
      .mapGroupsWithState[UserRunning, UserRunning](GroupStateTimeout.NoTimeout) {
        (uid, batch, state: GroupState[UserRunning]) =>
          val prev = state.getOption.getOrElse(UserRunning(uid, 0L, 0.0, 0.0))
          val (n, total) = batch.foldLeft((prev.n, prev.total)) {
            case ((cn, ct), e) => (cn + 1, ct + e.value)
          }
          val next = UserRunning(uid, n, total, if (n > 0) total / n else 0.0)
          state.update(next)
          next
      }
  }

  /** Drive a streaming DataFrame to completion against currently-available
    * files (Trigger.AvailableNow-style smoke path for local verification).
    */
  def runToMemorySink(df: DataFrame, queryName: String,
                      outputMode: OutputMode = OutputMode.Complete()): DataFrame = {
    val q = df.writeStream
      .format("memory")
      .queryName(queryName)
      .outputMode(outputMode)
      .start()
    q.processAllAvailable()
    q.stop()
    df.sparkSession.table(queryName)
  }
}
