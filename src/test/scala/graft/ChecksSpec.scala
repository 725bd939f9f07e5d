package graft

import java.sql.{Date, Timestamp}

import graft.quality.Checks
import org.apache.spark.sql.functions._

/** Generic test library semantics (violation-rows convention). */
class ChecksSpec extends SparkSpec {
  import spark.implicits._

  private val df = Seq(
    ("a", Some(1.0), "2024-01-01"),
    ("a", Some(150.0), "2024-01-02"),
    ("b", None, "2025-06-01")
  ).toDF("k", "v", "d").withColumn("d", col("d").cast("date"))

  test("unique flags duplicated key groups") {
    assert(Checks.unique(df, Seq("k")).count() == 1)
    assert(Checks.unique(df.dropDuplicates("k"), Seq("k")).count() == 0)
  }

  test("notNull returns the null rows") {
    assert(Checks.notNull(df, "v").count() == 1)
  }

  test("relationships finds orphaned children (left anti)") {
    val parent = Seq("a").toDF("k")
    assert(Checks.relationships(df, "k", parent, "k").count() == 1) // the 'b' row
  }

  test("valueInRange returns out-of-range rows") {
    assert(Checks.valueInRange(df, "v", 0, 100).count() == 1) // 150.0
  }

  test("noFutureDates with injected clock") {
    assert(Checks.noFutureDates(df, "d", Date.valueOf("2024-12-31")).count() == 1)
  }

  test("completenessThreshold fires only under the ratio") {
    assert(Checks.completenessThreshold(df, "v", 0.95).count() == 1) // 2/3 < .95
    assert(Checks.completenessThreshold(df, "v", 0.5).count() == 0)  // 2/3 ≥ .5
  }

  test("freshness maps day lag to pass/warn/error SLA") {
    def status(loaded: String, asOf: String) =
      Checks.freshness(
        Seq(Timestamp.valueOf(loaded)).toDF("t"), "t", Timestamp.valueOf(asOf))
        .select("freshness_status").collect().head.getString(0)
    assert(status("2024-01-10 00:00:00", "2024-01-15 00:00:00") == "pass")
    assert(status("2024-01-01 00:00:00", "2024-01-15 00:00:00") == "warn")
    assert(status("2023-11-01 00:00:00", "2024-01-15 00:00:00") == "error")
  }
}
