package graft.models

import graft.functions.Macros.surrogateKey
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Staging layer: rename-projection + validity filters + period parsing +
  * surrogate keys — ports of the four staging models
  * (`models/staging/stg_eurostat__{gdp,unemployment,inflation,population}.sql`).
  */
object Staging {

  /** `stg_eurostat__gdp.sql:18-53`: annual grain, YYYY time codes. */
  def gdp(raw: DataFrame): DataFrame =
    raw
      .filter(col("value").isNotNull && col("time_code").isNotNull && col("geo_code").isNotNull)
      .select(
        surrogateKey(col("geo_code"), col("time_code")).as("gdp_key"),
        col("geo_code").as("country_code"),
        col("geo_label").as("country_name"),
        col("time_code").as("year_code"),
        col("time_code").cast(IntegerType).as("reference_year"),
        make_date(col("time_code").cast(IntegerType), lit(1), lit(1)).as("reference_date"),
        col("value").as("gdp_million_eur"),
        col("unit_code"),
        col("unit_label").as("unit_description"),
        col("na_item_code").as("national_accounts_item_code"),
        col("na_item_label").as("national_accounts_item"),
        col("dataset_code").as("source_dataset"),
        col("extracted_at").as("_extracted_at"))

  /** `stg_eurostat__unemployment.sql:18-62`: monthly grain; the
    * `length(time_code) >= 7` guard drops annual rows.
    */
  def unemployment(raw: DataFrame): DataFrame =
    raw
      .filter(col("value").isNotNull && col("time_code").isNotNull && col("geo_code").isNotNull)
      .filter(length(col("time_code")) >= 7)
      .select(
        surrogateKey(col("geo_code"), col("time_code")).as("unemployment_key"),
        col("geo_code").as("country_code"),
        col("geo_label").as("country_name"),
        col("time_code").as("period_code"),
        substring(col("time_code"), 1, 4).cast(IntegerType).as("reference_year"),
        substring(col("time_code"), 6, 2).cast(IntegerType).as("reference_month"),
        make_date(
          substring(col("time_code"), 1, 4).cast(IntegerType),
          substring(col("time_code"), 6, 2).cast(IntegerType),
          lit(1)).as("reference_date"),
        col("value").as("unemployment_rate_pct"),
        col("s_adj_code").as("seasonal_adjustment_code"),
        col("s_adj_label").as("seasonal_adjustment"),
        col("age_code"),
        col("age_label").as("age_group"),
        col("sex_code"),
        col("sex_label").as("sex"),
        col("unit_code"),
        col("unit_label").as("unit_description"),
        col("dataset_code").as("source_dataset"),
        col("extracted_at").as("_extracted_at"))

  /** `stg_eurostat__inflation.sql:18-55`: monthly grain, coicop metadata. */
  def inflation(raw: DataFrame): DataFrame =
    raw
      .filter(col("value").isNotNull && col("time_code").isNotNull && col("geo_code").isNotNull)
      .filter(length(col("time_code")) >= 7)
      .select(
        surrogateKey(col("geo_code"), col("time_code")).as("inflation_key"),
        col("geo_code").as("country_code"),
        col("geo_label").as("country_name"),
        col("time_code").as("period_code"),
        substring(col("time_code"), 1, 4).cast(IntegerType).as("reference_year"),
        substring(col("time_code"), 6, 2).cast(IntegerType).as("reference_month"),
        make_date(
          substring(col("time_code"), 1, 4).cast(IntegerType),
          substring(col("time_code"), 6, 2).cast(IntegerType),
          lit(1)).as("reference_date"),
        col("value").as("inflation_rate_mom_pct"),
        col("coicop_code"),
        col("coicop_label").as("coicop_category"),
        col("dataset_code").as("source_dataset"),
        col("extracted_at").as("_extracted_at"))

  /** `stg_eurostat__population.sql:18-50`: annual grain. */
  def population(raw: DataFrame): DataFrame =
    raw
      .filter(col("value").isNotNull && col("time_code").isNotNull && col("geo_code").isNotNull)
      .select(
        surrogateKey(col("geo_code"), col("time_code")).as("population_key"),
        col("geo_code").as("country_code"),
        col("geo_label").as("country_name"),
        col("time_code").as("year_code"),
        col("time_code").cast(IntegerType).as("reference_year"),
        make_date(col("time_code").cast(IntegerType), lit(1), lit(1)).as("reference_date"),
        col("value").as("population_count"),
        col("age_code"),
        col("age_label").as("age_group"),
        col("sex_code"),
        col("sex_label").as("sex"),
        col("dataset_code").as("source_dataset"),
        col("extracted_at").as("_extracted_at"))
}
