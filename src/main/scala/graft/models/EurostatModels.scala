package graft.models

import java.sql.Timestamp

import graft.analytics.{Anomaly, Forecast, QualityScores}
import graft.model.{Materialization, Model}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.DataFrame

/** The reference's full model DAG registered for the Runner: 4 staging
  * views → 2 intermediate views → 3 marts (table/incremental) → 3
  * analytics tables (Python-model ports) → 1 SCD2 snapshot.
  * Source names: raw_* + country_metadata (seed).
  */
object EurostatModels {

  val AggregateCode = "ALLNATIONS"

  def models(asOf: Timestamp, runId: String): Seq[Model] = Seq(
    Model("stg_eurostat__gdp", Seq("raw_gdp"))(d => Staging.gdp(d("raw_gdp"))),
    Model("stg_eurostat__unemployment", Seq("raw_unemployment"))(d =>
      Staging.unemployment(d("raw_unemployment"))),
    Model("stg_eurostat__inflation", Seq("raw_inflation"))(d =>
      Staging.inflation(d("raw_inflation"))),
    Model("stg_eurostat__population", Seq("raw_population"))(d =>
      Staging.population(d("raw_population"))),

    Model("int_country_annual_metrics",
      Seq("stg_eurostat__gdp", "stg_eurostat__population",
          "stg_eurostat__unemployment", "stg_eurostat__inflation"))(d =>
      Intermediate.annualMetrics(
        d("stg_eurostat__gdp"), d("stg_eurostat__population"),
        d("stg_eurostat__unemployment"), d("stg_eurostat__inflation"))),
    Model("int_country_monthly_indicators",
      Seq("stg_eurostat__unemployment", "stg_eurostat__inflation",
          "int_country_annual_metrics"))(d =>
      Intermediate.monthlyIndicators(
        d("stg_eurostat__unemployment"), d("stg_eurostat__inflation"),
        d("int_country_annual_metrics"))),

    Model("dim_country", Seq("country_metadata", "stg_eurostat__gdp"),
      Materialization.Table)(d =>
      Marts.dimCountry(d("country_metadata"), d("stg_eurostat__gdp"), asOf)),
    Model("fct_economic_indicators",
      Seq("int_country_monthly_indicators", "dim_country"),
      Materialization.Incremental("indicator_key", "reference_date",
        Materialization.OnSchemaChange.AppendNewColumns))(d => // fct_economic_indicators.sql:5
      Marts.fctEconomicIndicators(
        d("int_country_monthly_indicators"), d("dim_country"), asOf, runId)),
    Model("rpt_annual_economic_summary",
      Seq("int_country_annual_metrics", "dim_country"),
      Materialization.Table)(d =>
      Marts.rptAnnualSummary(
        d("int_country_annual_metrics"), d("dim_country"), asOf, AggregateCode)),

    Model("py_anomaly_detection", Seq("fct_economic_indicators"),
      Materialization.Table)(d => Anomaly.detect(d("fct_economic_indicators"))),
    Model("py_data_quality_scores", Seq("fct_economic_indicators"),
      Materialization.Table)(d =>
      QualityScores.score(d("fct_economic_indicators"), asOf)),
    Model("py_unemployment_forecast", Seq("fct_economic_indicators"),
      Materialization.Table)(d =>
      Forecast.forecast(d("fct_economic_indicators"), asOf)),

    Model("snap_gdp_history", Seq("stg_eurostat__gdp"),
      Materialization.Snapshot("gdp_key", Seq("gdp_million_eur")))(d =>
      d("stg_eurostat__gdp").select(
        col("gdp_key"), col("country_code"), col("country_name"),
        col("reference_year"), col("gdp_million_eur"), col("unit_code"),
        col("source_dataset"), col("_extracted_at"))))

  /** Singular test `tests/assert_eu_aggregate_consistency.sql`: violation
    * rows where |Σ members − reported aggregate| > 5%.
    */
  def euAggregateConsistencyViolations(stgGdp: DataFrame): DataFrame = {
    import graft.functions.Exact
    import org.apache.spark.sql.functions._
    val totals = stgGdp.filter(col("country_code") =!= AggregateCode)
      .groupBy(col("reference_year"))
      .agg(Exact.sumExact(col("gdp_million_eur"), 6).as("summed_gdp"))
    val reported = stgGdp.filter(col("country_code") === AggregateCode)
      .select(col("reference_year"), col("gdp_million_eur").as("eu_reported_gdp"))
    totals.join(reported, Seq("reference_year"), "inner")
      .withColumn("absolute_difference", abs(col("summed_gdp") - col("eu_reported_gdp")))
      .withColumn("percentage_difference",
        abs(col("summed_gdp") - col("eu_reported_gdp")) / col("eu_reported_gdp") * 100)
      .filter(col("percentage_difference") > 5)
  }
}
