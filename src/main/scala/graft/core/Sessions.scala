package graft.core

import org.apache.spark.sql.SparkSession

/** SparkSession factory.
  *
  * Mirrors the reference's execution profile (dbt-duckdb, single machine,
  * `profiles.yml:10,14` threads) but on Spark's execution model: the
  * parallelism knob becomes task parallelism (`spark.sql.shuffle.partitions`),
  * sized for local[32] test runs; on a real cluster this is raised to
  * O(cores) and AQE coalesces the rest.
  */
object Sessions {

  /** events.ts is TIMESTAMP(NANOS) parquet: readers need
    * `spark.sql.legacy.parquet.nanosAsLong=true`. Set at session build
    * ideally; for plain external sessions this self-configures — but only
    * when the key is UNSET, and always to the same constant, so
    * concurrent readers cannot race to different values. An explicitly
    * conflicting setting is an error, not silently flipped.
    */
  def ensureNanosAsLong(spark: SparkSession): Unit = {
    val key = "spark.sql.legacy.parquet.nanosAsLong"
    // conf.getOption returns the REGISTERED DEFAULT ("false") for sessions
    // that never set the key, so it cannot distinguish "unset" from "user
    // said false" — the self-configure fallback must consult the user-set
    // map directly (graftx.Bridge; round-2 advisor finding).
    if (!org.apache.spark.sql.graftx.Bridge.isExplicitlySet(spark, key))
      spark.conf.set(key, "true")
    else if (spark.conf.get(key) != "true")
      throw new IllegalStateException(
        s"$key=${spark.conf.get(key)} conflicts with the events readers; " +
          "set it true at session build")
  }

  /** Local session tuned for the test harness (local[n], small data).
    * UTC session timezone is required for DuckDB-oracle parity.
    */
  def local(cpus: Int = 32, appName: String = "graft"): SparkSession = {
    val spark = SparkSession
      .builder()
      .master(s"local[$cpus]")
      .appName(appName)
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.adaptive.enabled", "true")
      // events.ts is TIMESTAMP(NANOS) parquet; static so every reader
      // agrees and no accessor mutates session config (Tables.events).
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
