package graft.models

import java.sql.Timestamp

import graft.functions.Exact
import graft.functions.Macros.surrogateKey
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.DataFrame

/** Marts layer: `dim_country`, `fct_economic_indicators`,
  * `rpt_annual_economic_summary` (reference models/marts). Wall-clock columns
  * take the injected `asOf`/`runId` (SURVEY §7.4.4).
  */
object Marts {

  private val S = 6

  /** `dim_country.sql`: seed ⟕ latest Eurostat name ⟕ data availability.
    * The latest-name `first_value` over desc order is replaced by the
    * deterministic `max_by(country_name, reference_year)` (SURVEY §7.4.5).
    */
  def dimCountry(seed: DataFrame, stgGdp: DataFrame, asOf: Timestamp): DataFrame = {
    val names = stgGdp
      .groupBy(col("country_code"))
      .agg(max_by(col("country_name"), col("reference_year")).as("country_name_eurostat"))
    val avail = stgGdp
      .groupBy(col("country_code"))
      .agg(
        min(col("reference_year")).cast(LongType).as("earliest_gdp_year"),
        max(col("reference_year")).cast(LongType).as("latest_gdp_year"),
        countDistinct(col("reference_year")).as("years_of_gdp_data"))
    seed.alias("cs")
      .join(names.alias("cn"), Seq("country_code"), "left")
      .join(avail.alias("da"), Seq("country_code"), "left")
      .select(
        surrogateKey(col("country_code")).as("country_key"),
        col("country_code"),
        coalesce(col("cs.country_name"), col("country_name_eurostat")).as("country_name"),
        col("eu_member_since"),
        col("eurozone_member"),
        col("region"),
        col("subregion"),
        when(col("eurozone_member"), "Eurozone")
          .when(col("eu_member_since").isNotNull, "EU (non-Euro)")
          .otherwise("Non-EU").as("eu_status"),
        col("earliest_gdp_year"),
        col("latest_gdp_year"),
        col("years_of_gdp_data"),
        lit(asOf).as("_loaded_at"))
  }

  /** `fct_economic_indicators.sql` final select (the incremental
    * watermark/upsert lives in the materializer, Materialization.Incremental).
    */
  def fctEconomicIndicators(monthly: DataFrame, dim: DataFrame,
                            asOf: Timestamp, runId: String): DataFrame =
    monthly.alias("mi")
      .join(broadcast(dim.select(col("country_code"), col("country_key")).alias("cd")),
            Seq("country_code"), "left")
      .select(
        col("monthly_metrics_key").as("indicator_key"),
        col("country_code"),
        col("country_key"),
        col("reference_year"),
        col("reference_month"),
        col("reference_date"),
        col("unemployment_rate_pct"),
        col("inflation_rate_mom_pct"),
        col("unemployment_rate_prev_month"),
        col("unemployment_rate_prev_year"),
        col("unemployment_rate_12m_avg"),
        col("inflation_rate_12m_avg"),
        (col("unemployment_rate_pct") - col("unemployment_rate_prev_month"))
          .as("unemployment_mom_change"),
        (col("unemployment_rate_pct") - col("unemployment_rate_prev_year"))
          .as("unemployment_yoy_change"),
        col("annual_gdp_million_eur"),
        col("annual_population_count"),
        col("annual_gdp_per_capita_eur"),
        lit(asOf).as("_loaded_at"),
        lit(runId).as("_dbt_invocation_id"))

  /** `rpt_annual_economic_summary.sql`: EU-wide aggregates (aggregate row
    * excluded), rankings with DuckDB nulls-last semantics, YoY deltas,
    * shares and vs-EU-average comparisons, denormalized dim attributes.
    * `aggregateCode` = the synthetic EU27_2020 analog to exclude.
    */
  def rptAnnualSummary(annual: DataFrame, dim: DataFrame, asOf: Timestamp,
                       aggregateCode: String = "ALLNATIONS"): DataFrame = {
    val am = annual.filter(col("country_code") =!= aggregateCode)
    val eu = am
      .groupBy(col("reference_year"))
      .agg(
        Exact.sumExact(col("gdp_million_eur"), S).as("eu_total_gdp_million_eur"),
        Exact.sumExact(col("population_count"), S).as("eu_total_population"),
        Exact.avgExact(col("avg_unemployment_rate_pct"), S).as("eu_avg_unemployment_rate"),
        Exact.avgExact(col("annual_inflation_rate_pct"), S).as("eu_avg_inflation_rate"))
    val wYear    = Window.partitionBy(col("reference_year"))
    val wCountry = Window.partitionBy(col("country_code")).orderBy(col("reference_year"))
    val ranked = am
      .withColumn("gdp_rank",
        rank().over(wYear.orderBy(col("gdp_million_eur").desc_nulls_last)).cast(LongType))
      .withColumn("gdp_per_capita_rank",
        rank().over(wYear.orderBy(col("gdp_per_capita_eur").desc_nulls_last)).cast(LongType))
      .withColumn("unemployment_rank",
        rank().over(wYear.orderBy(col("avg_unemployment_rate_pct").asc_nulls_last)).cast(LongType))
      .withColumn("inflation_rank",
        rank().over(wYear.orderBy(col("annual_inflation_rate_pct").asc_nulls_last)).cast(LongType))
      .withColumn("prev_year_gdp", lag(col("gdp_million_eur"), 1).over(wCountry))
      .withColumn("prev_year_unemployment",
        lag(col("avg_unemployment_rate_pct"), 1).over(wCountry))
      .withColumn("prev_year_inflation",
        lag(col("annual_inflation_rate_pct"), 1).over(wCountry))
    ranked.alias("r")
      .join(broadcast(dim.alias("cd")), Seq("country_code"), "left")
      .join(broadcast(eu.alias("eu")), Seq("reference_year"), "left")
      .select(
        surrogateKey(col("country_code"), col("reference_year")).as("summary_key"),
        col("country_code"),
        col("country_key"),
        col("reference_year"),
        col("gdp_million_eur"),
        col("population_count"),
        col("gdp_per_capita_eur"),
        col("avg_unemployment_rate_pct"),
        col("annual_inflation_rate_pct"),
        col("gdp_rank"),
        col("gdp_per_capita_rank"),
        col("unemployment_rank"),
        col("inflation_rank"),
        when(col("prev_year_gdp") > 0,
          (col("gdp_million_eur") - col("prev_year_gdp")) / col("prev_year_gdp") * 100)
          .otherwise(lit(null)).as("gdp_yoy_growth_pct"),
        (col("avg_unemployment_rate_pct") - col("prev_year_unemployment"))
          .as("unemployment_yoy_change_pp"),
        (col("annual_inflation_rate_pct") - col("prev_year_inflation"))
          .as("inflation_yoy_change_pp"),
        when(col("eu_total_gdp_million_eur") > 0,
          col("gdp_million_eur") / col("eu_total_gdp_million_eur") * 100)
          .otherwise(lit(null)).as("share_of_eu_gdp_pct"),
        when(col("eu_total_population") > 0,
          col("population_count").cast(DoubleType) / col("eu_total_population") * 100)
          .otherwise(lit(null)).as("share_of_eu_population_pct"),
        (col("gdp_per_capita_eur") -
          (col("eu_total_gdp_million_eur") * 1000000.0 / col("eu_total_population")))
          .as("gdp_per_capita_vs_eu_avg"),
        (col("avg_unemployment_rate_pct") - col("eu_avg_unemployment_rate"))
          .as("unemployment_vs_eu_avg_pp"),
        (col("annual_inflation_rate_pct") - col("eu_avg_inflation_rate"))
          .as("inflation_vs_eu_avg_pp"),
        col("has_complete_unemployment_data"),
        col("has_complete_inflation_data"),
        col("country_name"),
        col("eu_status"),
        col("eurozone_member"),
        col("region"),
        lit(asOf).as("_loaded_at"))
  }
}
