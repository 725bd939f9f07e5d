package graft

import java.sql.{Date, Timestamp}

import graft.analytics.Forecast
import org.apache.spark.sql.functions._

/** Forecast math parity with the reference's pandas implementation
  * (`py_unemployment_forecast.py`) — hand-computed recurrences.
  */
class ForecastSpec extends SparkSpec {
  import spark.implicits._

  test("exponential smoothing folds alpha=0.3 left-to-right") {
    // s = [1, 2, 3]: r0=1; r1=.3*2+.7*1=1.3; r2=.3*3+.7*1.3=1.81
    assert(approx(Forecast.expSmoothing(Array(1.0, 2.0, 3.0)), 1.81))
    assert(Forecast.expSmoothing(Array(5.0)) == 5.0)       // single value
    assert(Forecast.expSmoothing(Array.empty[Double]).isNaN)
  }

  test("holt linear trend recurrence matches hand computation") {
    // s=[1,2,3]: level=1, trend=1
    // i=1: last=1, level=.3*2+.7*(1+1)=2.0, trend=.1*(2-1)+.9*1=1.0
    // i=2: last=2, level=.3*3+.7*(2+1)=3.0, trend=.1*(3-2)+.9*1=1.0
    val (level, trend) = Forecast.holt(Array(1.0, 2.0, 3.0))
    assert(approx(level, 3.0) && approx(trend, 1.0))
    val (l2, t2) = Forecast.holt(Array(4.0, 9.0)) // len<3 → (last, 0)
    assert(l2 == 9.0 && t2 == 0.0)
  }

  test("linear regression extrapolates the exact OLS line") {
    // y = 2x + 1 on x=0..4 → forecasts at x=5,6: 11, 13
    val f = Forecast.linearRegression(Array(1.0, 3.0, 5.0, 7.0, 9.0), 2)
    assert(approx(f(0), 11.0) && approx(f(1), 13.0))
  }

  test("prediction interval uses ddof=1 std of first differences") {
    // diffs of [1,2,4,8,16] = [1,2,4,8]; mean=3.75; var=(7.5625+3.0625+.0625+18.0625)/3
    val s = Array(1.0, 2.0, 4.0, 8.0, 16.0)
    val diffs = Array(1.0, 2.0, 4.0, 8.0)
    val m = diffs.sum / 4
    val std = math.sqrt(diffs.map(d => (d - m) * (d - m)).sum / 3)
    val margin = 1.96 * std * math.sqrt(1 + 1.0 / 5)
    val (lo, hi) = Forecast.interval(s, 10.0)
    assert(approx(lo, 10.0 - margin) && approx(hi, 10.0 + margin))
    assert(Forecast.interval(Array(1.0, 2.0), 10.0) == ((9.0, 11.0))) // <5 obs fallback
  }

  test("constant-difference series: margin is 0, not NaN (variance clamp)") {
    // exactly linear series → all first differences equal → true variance
    // 0, but the power-sum closed form rounds to ~-1e-15; unclamped that
    // is sqrt(negative) = NaN (and a sqrt-domain ERROR in the oracle)
    // this shape rounds NEGATIVE (m·Σd² − (Σd)² = −7.1e-15) → clamped to 0
    val neg = Array.tabulate(24)(i => 0.3 * i)
    assert(Forecast.margin(neg) == 0.0)
    // this shape rounds tiny-positive → near-zero margin, never NaN
    val pos = Array.tabulate(30)(i => 1.0 + 0.3 * i)
    assert(!Forecast.margin(pos).isNaN && Forecast.margin(pos) < 1e-6)
    val (lo, hi) = Forecast.interval(pos, 5.0)
    assert(approx(lo, 5.0) && approx(hi, 5.0))
  }

  test("forecast emits 6 rows per qualifying country; <24 months skipped") {
    val asOf = Timestamp.valueOf("2024-06-01 00:00:00")
    val rows =
      (1 to 30).map(i => ("DE", Date.valueOf(java.time.LocalDate.of(2020, 1, 1).plusMonths(i)), 5.0 + (i % 3) * 0.1)) ++
      (1 to 10).map(i => ("XX", Date.valueOf(java.time.LocalDate.of(2020, 1, 1).plusMonths(i)), 7.0))
    val fct = rows.toDF("country_code", "reference_date", "unemployment_rate_pct")
    val out = Forecast.forecast(fct, asOf)
    val byCountry = out.groupBy("country_code").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byCountry == Map("DE" -> 6L))
    val horizons = out.orderBy("forecast_horizon_months")
      .select("forecast_horizon_months").collect().map(_.getInt(0)).toSeq
    assert(horizons == (1 to 6))
    // forecast dates are first-of-month, consecutive
    val dates = out.orderBy("forecast_horizon_months")
      .select("forecast_date").collect().map(_.getDate(0).toString).toSeq
    assert(dates.head == "2022-08-01" && dates.last == "2023-01-01")
  }
}
