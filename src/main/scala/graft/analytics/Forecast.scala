package graft.analytics

import java.sql.{Date, Timestamp}
import java.time.LocalDate

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** Port of `models/marts/py_unemployment_forecast.py` — per-country
  * 6-month unemployment forecasts from an ensemble of exponential
  * smoothing, Holt's linear trend, and OLS extrapolation, with
  * volatility-based prediction intervals.
  *
  * The smoothing recurrences are order-dependent sequential folds — not
  * expressible as built-in aggregates (SURVEY §2.9b) — so this is the one
  * operator implemented with `groupByKey(country).flatMapGroups`: each
  * country's series is sorted in-memory (bounded: one country's months)
  * and folded exactly like the reference's pandas loop. Scale-out is by
  * country — the natural partitioning at 100 TB too.
  */
object Forecast {

  private val Horizon    = 6
  private val MinHistory = 24
  private val Alpha      = 0.3
  private val Beta       = 0.1

  final case class Obs(country_code: String, reference_date: Date, value: Double)

  final case class ForecastRow(
      country_code: String,
      forecast_date: Date,
      forecast_horizon_months: Int,
      last_actual_date: Date,
      last_actual_value: Double,
      forecast_exp_smoothing: Double,
      forecast_holt: Double,
      forecast_linear_reg: Double,
      forecast_ensemble: Double,
      prediction_interval_lower: Double,
      prediction_interval_upper: Double,
      prediction_interval_width: Double,
      forecast_confidence: String,
      forecast_generated_at: Timestamp,
      model_version: String,
      min_training_samples: Int)

  /** fct_economic_indicators → forecast rows. */
  def forecast(fct: DataFrame, asOf: Timestamp): DataFrame = {
    val spark: SparkSession = fct.sparkSession
    import spark.implicits._
    val obs: Dataset[Obs] = fct
      .filter($"unemployment_rate_pct".isNotNull)
      .select($"country_code", $"reference_date", $"unemployment_rate_pct".as("value"))
      .as[Obs]
    obs
      .groupByKey(_.country_code)
      .flatMapGroups { (country, it) =>
        val series = it.toArray.sortBy(_.reference_date.getTime)
        if (series.length < MinHistory) Iterator.empty
        else forecastCountry(country, series.map(_.value),
          series.last.reference_date, asOf)
      }
      .toDF()
  }

  private def forecastCountry(country: String, s: Array[Double],
                              lastDate: Date, asOf: Timestamp): Iterator[ForecastRow] = {
    val es             = expSmoothing(s)
    val (level, trend) = holt(s)
    val lr             = linearRegression(s, Horizon)
    val lastValue      = s.last
    (0 until Horizon).iterator.map { i =>
      val fDate = Date.valueOf(
        lastDate.toLocalDate.plusMonths(i + 1).withDayOfMonth(1))
      val holtF     = level + (i + 1) * trend
      val esF       = es + i * trend // ES with (Holt's) trend adjustment, as in the reference
      val methods   = Array(esF, holtF, lr(i))
      val present   = methods.filterNot(_.isNaN)
      val ensemble  = if (present.isEmpty) Double.NaN else present.sum / present.length
      val (lo, hi)  = interval(s, ensemble)
      val width     = hi - lo
      ForecastRow(
        country_code = country,
        forecast_date = fDate,
        forecast_horizon_months = i + 1,
        last_actual_date = lastDate,
        last_actual_value = lastValue,
        forecast_exp_smoothing = esF,
        forecast_holt = holtF,
        forecast_linear_reg = lr(i),
        forecast_ensemble = ensemble,
        prediction_interval_lower = lo,
        prediction_interval_upper = hi,
        prediction_interval_width = width,
        forecast_confidence =
          if (width < 1.0) "high" else if (width < 2.0) "medium" else "low",
        forecast_generated_at = asOf,
        model_version = "1.0.0",
        min_training_samples = s.length)
    }
  }

  /** Simple exponential smoothing (`py_unemployment_forecast.py:41-52`). */
  def expSmoothing(s: Array[Double], alpha: Double = Alpha): Double = {
    if (s.length < 2) return if (s.nonEmpty) s.last else Double.NaN
    var result = s(0)
    var i = 1
    while (i < s.length) { result = alpha * s(i) + (1 - alpha) * result; i += 1 }
    result
  }

  /** Holt's linear trend → (level, trend) (`:54-72`). */
  def holt(s: Array[Double], alpha: Double = Alpha, beta: Double = Beta): (Double, Double) = {
    if (s.length < 3) return (if (s.nonEmpty) s.last else Double.NaN, 0.0)
    var level = s(0)
    var trend = s(1) - s(0)
    var i = 1
    while (i < s.length) {
      val lastLevel = level
      level = alpha * s(i) + (1 - alpha) * (level + trend)
      trend = beta * (level - lastLevel) + (1 - beta) * trend
      i += 1
    }
    (level, trend)
  }

  /** OLS extrapolation over index positions (`:74-104`). */
  def linearRegression(s: Array[Double], periods: Int): Array[Double] = {
    if (s.length < 3) return Array.fill(periods)(if (s.nonEmpty) s.last else Double.NaN)
    val n     = s.length
    val xMean = (n - 1) / 2.0
    val yMean = s.sum / n
    var num = 0.0; var den = 0.0
    var i = 0
    while (i < n) {
      num += (i - xMean) * (s(i) - yMean)
      den += (i - xMean) * (i - xMean)
      i += 1
    }
    val slope     = num / den
    val intercept = yMean - slope * xMean
    Array.tabulate(periods)(k => intercept + slope * (n + k))
  }

  /** Volatility-based 95% prediction interval (`:106-122`). */
  def interval(s: Array[Double], forecast: Double): (Double, Double) = {
    if (s.length < 5) return (forecast - 1, forecast + 1)
    val diffs = s.sliding(2).map(p => p(1) - p(0)).toArray
    val m     = diffs.sum / diffs.length
    val varS  = diffs.map(d => (d - m) * (d - m)).sum / (diffs.length - 1)
    val std   = math.sqrt(varS)
    val margin = 1.96 * std * math.sqrt(1 + 1.0 / s.length)
    (forecast - margin, forecast + margin)
  }
}
