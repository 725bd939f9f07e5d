package graft.models

import graft.functions.Exact
import graft.functions.Macros.surrogateKey
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.DataFrame

/** Intermediate layer: the two time-series models
  * (`models/intermediate/int_country_{annual_metrics,monthly_indicators}.sql`).
  *
  * Averages/sums over many rows use exact decimal power sums
  * ([[graft.functions.Exact]]) — semantics identical to plain avg/sum, but
  * independent of partial-aggregate merge order, which both the DuckDB
  * oracle gate and reproducible cluster runs require.
  */
object Intermediate {

  private val S = 6 // decimal scale for rate columns (2-decimal source data)

  /** `int_country_annual_metrics.sql`: GDP ⟕ population ⟕ annualized
    * unemployment/inflation, per-capita with null-on-zero, completeness
    * flags at exactly 12 monthly observations.
    */
  def annualMetrics(gdp: DataFrame, population: DataFrame,
                    unemployment: DataFrame, inflation: DataFrame): DataFrame = {
    val g = gdp.select(col("country_code"), col("reference_year"),
                       col("gdp_million_eur"), col("_extracted_at"))
    val p = population.select(col("country_code"), col("reference_year"),
                              col("population_count"))
    val u = unemployment
      .groupBy(col("country_code"), col("reference_year"))
      .agg(
        Exact.avgExact(col("unemployment_rate_pct"), S).as("avg_unemployment_rate_pct"),
        min(col("unemployment_rate_pct")).as("min_unemployment_rate_pct"),
        max(col("unemployment_rate_pct")).as("max_unemployment_rate_pct"),
        count(lit(1)).as("unemployment_observations"))
    val i = inflation
      .groupBy(col("country_code"), col("reference_year"))
      .agg(
        // Σ monthly MoM rates — an approximation by design, reproduced
        // as-is (SURVEY §7.4.7)
        Exact.sumExact(col("inflation_rate_mom_pct"), S).as("annual_inflation_rate_pct"),
        Exact.avgExact(col("inflation_rate_mom_pct"), S).as("avg_monthly_inflation_pct"),
        count(lit(1)).as("inflation_observations"))
    g.join(p, Seq("country_code", "reference_year"), "left")
      .join(u, Seq("country_code", "reference_year"), "left")
      .join(i, Seq("country_code", "reference_year"), "left")
      .select(
        surrogateKey(col("country_code"), col("reference_year")).as("annual_metrics_key"),
        col("country_code"),
        col("reference_year"),
        col("gdp_million_eur"),
        col("population_count"),
        when(col("population_count") > 0,
          (col("gdp_million_eur") * 1000000.0) / col("population_count"))
          .otherwise(lit(null)).as("gdp_per_capita_eur"),
        col("avg_unemployment_rate_pct"),
        col("min_unemployment_rate_pct"),
        col("max_unemployment_rate_pct"),
        col("unemployment_observations"),
        col("annual_inflation_rate_pct"),
        col("avg_monthly_inflation_pct"),
        col("inflation_observations"),
        when(col("unemployment_observations") === 12, true).otherwise(false)
          .as("has_complete_unemployment_data"),
        when(col("inflation_observations") === 12, true).otherwise(false)
          .as("has_complete_inflation_data"),
        col("_extracted_at"))
  }

  /** `int_country_monthly_indicators.sql`: distinct monthly spine from
    * unemployment, left-joined indicators + annual context, lag-1/lag-12,
    * and trailing-12 rolling averages (partial windows included).
    */
  def monthlyIndicators(unemployment: DataFrame, inflation: DataFrame,
                        annual: DataFrame): DataFrame = {
    val u = unemployment.select(
      col("country_code"), col("country_name"), col("reference_year"),
      col("reference_month"), col("reference_date"), col("unemployment_rate_pct"))
    val i = inflation.select(
      col("country_code").as("i_cc"), col("reference_date").as("i_reference_date"),
      col("inflation_rate_mom_pct"))
    val ac = annual.select(
      col("country_code").as("ac_cc"), col("reference_year").as("ac_reference_year"),
      col("gdp_million_eur"), col("population_count"), col("gdp_per_capita_eur"))
    val spine = u
      .select(col("country_code"), col("country_name"), col("reference_year"),
              col("reference_month"), col("reference_date"))
      .distinct()
    val w  = Window.partitionBy(col("country_code")).orderBy(col("reference_date"))
    val wR = w.rowsBetween(-11, Window.currentRow)
    def rollingExact(c: org.apache.spark.sql.Column) =
      sum(Exact.dec(c, S)).over(wR).cast(DoubleType) /
        count(c).over(wR).cast(DoubleType)
    spine
      .join(u.select(col("country_code"), col("reference_date"), col("unemployment_rate_pct")),
            Seq("country_code", "reference_date"), "left")
      .join(i, col("country_code") === col("i_cc") &&
              col("reference_date") === col("i_reference_date"), "left")
      .drop("i_cc", "i_reference_date")
      .join(ac, col("country_code") === col("ac_cc") &&
              col("reference_year") === col("ac_reference_year"), "left")
      .drop("ac_cc", "ac_reference_year")
      .select(
        surrogateKey(col("country_code"), col("reference_date")).as("monthly_metrics_key"),
        col("country_code"),
        col("country_name"),
        col("reference_year"),
        col("reference_month"),
        col("reference_date"),
        col("unemployment_rate_pct"),
        col("inflation_rate_mom_pct"),
        col("gdp_million_eur").as("annual_gdp_million_eur"),
        col("population_count").as("annual_population_count"),
        col("gdp_per_capita_eur").as("annual_gdp_per_capita_eur"),
        lag(col("unemployment_rate_pct"), 1).over(w).as("unemployment_rate_prev_month"),
        lag(col("inflation_rate_mom_pct"), 1).over(w).as("inflation_rate_prev_month"),
        lag(col("unemployment_rate_pct"), 12).over(w).as("unemployment_rate_prev_year"),
        rollingExact(col("unemployment_rate_pct")).as("unemployment_rate_12m_avg"),
        rollingExact(col("inflation_rate_mom_pct")).as("inflation_rate_12m_avg"))
  }
}
