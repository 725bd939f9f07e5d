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
      prediction_interval_margin: Double,
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
    val m              = margin(s) // horizon-independent: hoisted out of the loop
    (0 until Horizon).iterator.map { i =>
      val fDate = Date.valueOf(
        lastDate.toLocalDate.plusMonths(i + 1).withDayOfMonth(1))
      val holtF     = level + (i + 1) * trend
      val esF       = es + i * trend // ES with (Holt's) trend adjustment, as in the reference
      val methods   = Array(esF, holtF, lr(i))
      val present   = methods.filterNot(_.isNaN)
      val ensemble  = if (present.isEmpty) Double.NaN else present.sum / present.length
      val (lo, hi)  = (ensemble - m, ensemble + m)
      val width     = hi - lo // reference computes upper-lower, not 2*margin
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
        prediction_interval_margin = m,
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

  /** Mirror of Spark's `CAST(double AS DECIMAL(18,6))`: shortest-repr
    * BigDecimal, HALF_UP to scale 6 — identical to the DuckDB oracle's
    * decimal cast on this data, so exact-decimal sums below are
    * bit-matchable across engines AND order-independent.
    */
  private def q6(d: Double): BigDecimal =
    BigDecimal(d).setScale(6, scala.math.BigDecimal.RoundingMode.HALF_UP)

  /** OLS extrapolation over index positions (`:74-104`). Computed from
    * exact decimal power sums (Σy, Σxy exact; Σx, Σx² closed-form
    * integers) with the final double arithmetic in a fixed order —
    * the same closed form `graft.functions.Exact.olsSlopeExact` uses, so
    * the q59 oracle hash-matches. Mathematically identical to the
    * reference's centered numpy formula (`:95-98`).
    */
  def linearRegression(s: Array[Double], periods: Int): Array[Double] = {
    if (s.length < 3) return Array.fill(periods)(if (s.nonEmpty) s.last else Double.NaN)
    val n   = s.length
    var sy  = BigDecimal(0)
    var sxy = BigDecimal(0)
    var i   = 0
    while (i < n) { val qy = q6(s(i)); sy += qy; sxy += BigDecimal(i) * qy; i += 1 }
    val nD   = n.toDouble
    val sx   = (n.toLong * (n - 1) / 2).toDouble          // Σ i, i = 0..n-1
    val sxx  = (n.toLong * (n - 1) * (2L * n - 1) / 6).toDouble // Σ i²
    val syD  = sy.toDouble
    val sxyD = sxy.toDouble
    val slope     = (nD * sxyD - sx * syD) / (nD * sxx - sx * sx)
    val intercept = (syD - slope * sx) / nD
    Array.tabulate(periods)(k => intercept + slope * (n + k))
  }

  /** Half-width of the volatility-based 95% prediction interval
    * (`:106-122`): 1.96 · std(first differences, ddof=1) · √(1 + 1/n),
    * from exact decimal difference power sums (order-independent, oracle
    * bit-matchable). Ensemble-independent — this is the column the q59
    * hash gate checks; lower/upper/width center on the (spec-gated)
    * ensemble.
    */
  def margin(s: Array[Double]): Double = {
    if (s.length < 5) return 1.0
    var sd  = BigDecimal(0)
    var sdd = BigDecimal(0)
    var i   = 1
    while (i < s.length) { val d = q6(s(i)) - q6(s(i - 1)); sd += d; sdd += d * d; i += 1 }
    val m    = (s.length - 1).toDouble
    val sdD  = sd.toDouble
    val sddD = sdd.toDouble
    // clamp: the closed form rounds to a tiny NEGATIVE for
    // constant-difference series (m·Σd² − (Σd)² ≈ −1e-15) — unclamped
    // that is NaN here and a sqrt-domain ERROR in the DuckDB oracle
    val varS = math.max(0.0, (m * sddD - sdD * sdD) / (m * (m - 1.0)))
    1.96 * math.sqrt(varS) * math.sqrt(1 + 1.0 / s.length)
  }

  /** Volatility-based 95% prediction interval (`:106-122`). */
  def interval(s: Array[Double], forecast: Double): (Double, Double) = {
    val m = margin(s)
    (forecast - m, forecast + m)
  }
}
