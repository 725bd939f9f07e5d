package graft

import java.sql.{Date, Timestamp}

import graft.models.Intermediate
import org.apache.spark.sql.functions._

/** Ports of the reference's four dbt unit tests
  * (`models/intermediate/_intermediate__unit_tests.yml`) — mock staging
  * inputs → model transform → expected rows.
  */
class UnitModelSpec extends SparkSpec {
  import spark.implicits._

  private val ts = Timestamp.valueOf("2024-01-15 10:00:00")

  private def gdpRows(rows: (String, Int, Double)*) =
    rows.toDF("country_code", "reference_year", "gdp_million_eur")
      .withColumn("_extracted_at", lit(ts))
  private def popRows(rows: (String, Int, Double)*) =
    rows.toDF("country_code", "reference_year", "population_count")
  private def unempAnnualRows(rows: (String, Int, Double)*) =
    rows.toDF("country_code", "reference_year", "unemployment_rate_pct")
  private def inflAnnualRows(rows: (String, Int, Double)*) =
    rows.toDF("country_code", "reference_year", "inflation_rate_mom_pct")

  private def unempMonthlyRows(rows: (String, Int, Int, String, Double)*) =
    rows.toDF("country_code", "reference_year", "reference_month", "d", "unemployment_rate_pct")
      .withColumn("reference_date", col("d").cast("date")).drop("d")
      .withColumn("country_name", col("country_code"))
  private def inflMonthlyRows(rows: (String, String, Double)*) =
    rows.toDF("country_code", "d", "inflation_rate_mom_pct")
      .withColumn("reference_date", col("d").cast("date")).drop("d")
  private def annualCtx(rows: (String, Int, Double, Double, Double)*) =
    rows.toDF("country_code", "reference_year", "gdp_million_eur",
              "population_count", "gdp_per_capita_eur")

  test("test_gdp_per_capita_calculation: normal, small, zero-population") {
    val out = Intermediate.annualMetrics(
      gdpRows(("DE", 2023, 4000000.0), ("MT", 2023, 18000.0), ("XX", 2023, 1000.0)),
      popRows(("DE", 2023, 84000000.0), ("MT", 2023, 520000.0), ("XX", 2023, 0.0)),
      unempAnnualRows(), inflAnnualRows())
      .select("country_code", "gdp_per_capita_eur").collect()
      .map(r => r.getString(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    assert(approx(out("DE").get, 47619.047619, 1e-5))
    assert(approx(out("MT").get, 34615.384615, 1e-5))
    assert(out("XX").isEmpty) // zero population → null, not an error
  }

  test("test_unemployment_yoy_change: lag(12) is row-based like the reference model") {
    // NOTE: the reference fixture (yml:58-61) expects prev_year = 3.0 from
    // only TWO mock rows, but its own model computes lag(rate, 12) over
    // monthly ROWS (int_country_monthly_indicators.sql:96-99) — with two
    // rows that is null. We assert the model's actual semantics here and
    // prove the intended calendar behavior with 13 contiguous months below.
    val out = Intermediate.monthlyIndicators(
      unempMonthlyRows(("DE", 2022, 6, "2022-06-01", 3.0), ("DE", 2023, 6, "2023-06-01", 2.9)),
      inflMonthlyRows(), annualCtx())
      .orderBy("reference_date")
      .select("unemployment_rate_pct", "unemployment_rate_prev_year").collect()
    assert(out(0).getDouble(0) == 3.0 && out(0).isNullAt(1))
    assert(out(1).getDouble(0) == 2.9 && out(1).isNullAt(1))
  }

  test("unemployment yoy over 13 contiguous months yields the prior June") {
    val months = (0 until 13).map { i =>
      val y = 2022 + (5 + i) / 12
      val m = (5 + i) % 12 + 1
      ("DE", y, m, f"$y-$m%02d-01", 3.0 + i * 0.1)
    }
    val out = Intermediate.monthlyIndicators(
      unempMonthlyRows(months: _*), inflMonthlyRows(), annualCtx())
      .orderBy("reference_date")
      .select("reference_date", "unemployment_rate_prev_year").collect()
    assert(out.take(12).forall(_.isNullAt(1)))
    assert(approx(out(12).getDouble(1), 3.0)) // 2023-06 sees 2022-06
  }

  test("test_rolling_average_calculation: partial windows 7.0 / 7.1 / 7.1") {
    val out = Intermediate.monthlyIndicators(
      unempMonthlyRows(
        ("FR", 2023, 1, "2023-01-01", 7.0),
        ("FR", 2023, 2, "2023-02-01", 7.2),
        ("FR", 2023, 3, "2023-03-01", 7.1)),
      inflMonthlyRows(), annualCtx())
      .orderBy("reference_date")
      .select("unemployment_rate_12m_avg").collect().map(_.getDouble(0))
    assert(approx(out(0), 7.0) && approx(out(1), 7.1) && approx(out(2), 7.1))
  }

  test("test_data_quality_flags: 12 obs complete, 6 obs incomplete") {
    val u = unempAnnualRows((1 to 12).map(_ => ("NL", 2023, 3.5)): _*)
    val i = inflAnnualRows((1 to 6).map(_ => ("NL", 2023, 0.5)): _*)
    val out = Intermediate.annualMetrics(
      gdpRows(("NL", 2023, 1000000.0)), popRows(("NL", 2023, 17500000.0)), u, i)
      .select("unemployment_observations", "inflation_observations",
              "has_complete_unemployment_data", "has_complete_inflation_data")
      .collect().head
    assert(out.getLong(0) == 12 && out.getLong(1) == 6)
    assert(out.getBoolean(2) && !out.getBoolean(3))
  }
}
