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
    * exactly what DuckDB's reader does, so oracle parity holds. Conf
    * contract: [[Sessions.ensureNanosAsLong]].
    */
  def events: DataFrame = {
    Sessions.ensureNanosAsLong(spark)
    val raw = table("events")
    if (raw.schema("ts").dataType == LongType)
      raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else raw
  }
  def documents: DataFrame  = table("documents")
  def embeddings: DataFrame = table("embeddings")
}
