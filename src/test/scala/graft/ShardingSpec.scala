package graft

import graft.operators.Sharding
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Two-pass prefix-sum correctness: identical to the single-task global
  * window for ANY partition count (1, 3, 32, more partitions than rows),
  * which is the property that makes it a safe drop-in at scale.
  */
class ShardingSpec extends SparkSpec {
  import spark.implicits._

  private val rows = (1L to 100L).map(i => (i, (i * 37 % 11) + 1)) // ids 1..100, weights 1..11
  private lazy val df = rows.toDF("id", "w")

  private lazy val expected = {
    val w = Window.orderBy(col("id")).rowsBetween(Window.unboundedPreceding, 0)
    df.withColumn("cum", sum(col("w")).over(w))
      .select("id", "w", "cum")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
  }

  test("runningTotal equals the global window for any partition count") {
    for (parts <- Seq(1, 3, 32, 200)) {
      val got = Sharding.runningTotal(df, "id", "w", "cum", parts)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(got == expected, s"mismatch at parts=$parts")
    }
  }

  test("runningTotal stays correct with exchange reuse disabled") {
    // Bucket boundaries are literal-deterministic, so the fold and the
    // offsets branches agree even when ReuseExchange can't dedupe their
    // shuffles — reuse is a performance optimization, never a
    // correctness dependency.
    spark.conf.set("spark.sql.exchange.reuse", "false")
    try {
      val got = Sharding.runningTotal(df, "id", "w", "cum", 8)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(got == expected)
    } finally spark.conf.set("spark.sql.exchange.reuse", "true")
  }

  test("byBudget assigns a row to the shard its first unit falls into") {
    // weights all 1, budget 10 → ids 1..10 shard 0, 11..20 shard 1, ...
    val ones = (1L to 25L).map(i => (i, 1L)).toDF("id", "w")
    val out = Sharding.byBudget(ones, "id", "w", budget = 10L, parts = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(out(1L) == 0L && out(10L) == 0L && out(11L) == 1L && out(25L) == 2L)
  }
}
