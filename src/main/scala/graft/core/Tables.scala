package graft.core

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loader for the driver-provided parquet tables under a scale-factor dir
  * (see /root/repo/TESTDATA.md). One parquet file per table; reading them
  * through `spark.read.parquet` keeps filter pushdown and column pruning
  * available to Catalyst (verify with `.explain("formatted")`:
  * PushedFilters / ReadSchema).
  */
final case class Tables(spark: SparkSession, dir: String) {
  def table(name: String): DataFrame = spark.read.parquet(s"$dir/$name.parquet")

  def region: DataFrame     = table("region")
  def nation: DataFrame     = table("nation")
  def customer: DataFrame   = table("customer")
  def supplier: DataFrame   = table("supplier")
  def part: DataFrame       = table("part")
  def orders: DataFrame     = table("orders")
  def lineitem: DataFrame   = table("lineitem")
  /** `events.ts` is TIMESTAMP(NANOS) parquet, which Spark's vectorized
    * reader rejects; read nanos as long and truncate to microseconds —
    * exactly what DuckDB's reader does, so oracle parity holds.
    *
    * `spark.sql.legacy.parquet.nanosAsLong=true` should be set ONCE at
    * session build ([[Sessions.local]] and the driver mains). For plain
    * external sessions the accessor self-configures — but only when the
    * key is UNSET, and always to the same constant, so concurrent readers
    * cannot race to different values. An explicit conflicting setting is
    * an error, not silently flipped.
    */
  def events: DataFrame = {
    val key = "spark.sql.legacy.parquet.nanosAsLong"
    spark.conf.getOption(key) match {
      case Some("true") => ()
      case None         => spark.conf.set(key, "true")
      case Some(other)  =>
        throw new IllegalStateException(
          s"$key=$other conflicts with the events reader; set it true at session build " +
            "(see graft.core.Sessions)")
    }
    val raw = table("events")
    if (raw.schema("ts").dataType == LongType)
      raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else raw
  }
  def documents: DataFrame  = table("documents")
  def embeddings: DataFrame = table("embeddings")
}
