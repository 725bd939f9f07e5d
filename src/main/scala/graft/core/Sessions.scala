package graft.core

import org.apache.spark.sql.SparkSession

/** SparkSession factory.
  *
  * Mirrors the reference's execution profile (dbt-duckdb, single machine,
  * `profiles.yml:10,14` threads) but on Spark's execution model: the
  * parallelism knob becomes task parallelism (`spark.sql.shuffle.partitions`),
  * sized for local[32] test runs; on a real cluster this is raised to
  * O(cores) and AQE coalesces the rest.
  *
  * Event-time contract: `events.ts` (TIMESTAMP(NANOS) parquet) reads as
  * TIMESTAMP_NTZ on this toolchain (Spark 4.1) and is canonicalized at
  * first read by [[Tables.canonicalEventsTs]] — a schema probe that fails
  * loudly on any other reading, NOT a conf (the 3.x
  * `spark.sql.legacy.parquet.nanosAsLong` conf is dead on 4.1 and is
  * deliberately not set anywhere). The UTC session timezone below is part
  * of that contract: the ntz→timestamp cast preserves the instant only
  * under UTC, and DuckDB-oracle parity requires UTC regardless.
  */
object Sessions {

  /** Local session tuned for the test harness (local[n], small data). */
  def local(cpus: Int = 32, appName: String = "graft"): SparkSession = {
    val spark = SparkSession
      .builder()
      .master(s"local[$cpus]")
      .appName(appName)
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
