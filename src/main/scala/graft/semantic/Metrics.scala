package graft.semantic

import graft.functions.Exact
import graft.functions.Macros
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Semantic layer: the metric registry documented in the reference README
  * (`README.md:224-258`; the repo documents MetricFlow metrics but ships
  * no `_semantic_models.yml` — SURVEY §1.1). Metrics are named aggregate /
  * window `Column` definitions over the marts, so every consumer
  * aggregates the same way.
  *
  * Usage: `fct.groupBy($"country_code").agg(Metrics.simple("total_gdp"))`
  * for simple metrics; `Metrics.windowed(name)` for time-series metrics
  * that need a (partition, order) context.
  */
object Metrics {

  /** Simple aggregate metrics (measure → aggregation). */
  val simple: Map[String, Column] = Map(
    "total_gdp" ->
      Exact.sumExact(col("annual_gdp_million_eur"), 6).as("total_gdp"),
    "population" ->
      Exact.sumExact(col("annual_population_count"), 6).as("population"),
    "average_gdp_per_capita" ->
      Exact.avgExact(col("annual_gdp_per_capita_eur"), 6).as("average_gdp_per_capita"),
    "unemployment_rate" ->
      Exact.avgExact(col("unemployment_rate_pct"), 6).as("unemployment_rate"),
    "monthly_inflation" ->
      Exact.avgExact(col("inflation_rate_mom_pct"), 6).as("monthly_inflation"),
    "annual_inflation" ->
      Exact.sumExact(col("inflation_rate_mom_pct"), 6).as("annual_inflation"))

  /** Derived metric: (total_gdp * 1,000,000) / population (README's
    * `gdp_per_capita_derived` expr).
    */
  def gdpPerCapitaDerived(totalGdp: Column, population: Column): Column =
    Macros.nullSafeDivide(totalGdp * 1000000.0, population).as("gdp_per_capita_derived")

  /** Time-series metrics requiring a window context. */
  def gdpGrowth(partition: Column, order: Column): Column =
    Macros.yoyChange(col("annual_gdp_million_eur"), partition, order).as("gdp_growth")

  /** Trailing 12-period mean, computed like every multi-row reduction in
    * this engine: exact decimal window sum / non-null count (plain double
    * `avg` over a frame is engine- and order-dependent — the q06/q52
    * discipline), so the metric itself hash-gates (q70).
    */
  def unemploymentTrend(partition: Column, order: Column): Column = {
    val w = Window.partitionBy(partition).orderBy(order)
      .rowsBetween(-11, Window.currentRow)
    (sum(Exact.dec(col("unemployment_rate_pct"), 6)).over(w)
        .cast(org.apache.spark.sql.types.DoubleType) /
      count(col("unemployment_rate_pct")).over(w)
        .cast(org.apache.spark.sql.types.DoubleType))
      .as("unemployment_trend")
  }

  /** Cumulative metric: running growth vs the first value in the window. */
  def cumulativeGdpGrowth(partition: Column, order: Column): Column = {
    val w     = Window.partitionBy(partition).orderBy(order)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val base = first(col("annual_gdp_million_eur"), ignoreNulls = true).over(w)
    when(base.isNotNull && base =!= 0,
      (col("annual_gdp_million_eur") - base) / base * 100)
      .as("cumulative_gdp_growth")
  }

  /** Convenience: the annual metric rollup per country over fct. */
  def annualRollup(fct: DataFrame): DataFrame =
    fct.groupBy(col("country_code"), col("reference_year"))
      .agg(simple("unemployment_rate"), simple("monthly_inflation"),
           simple("annual_inflation"))
}
