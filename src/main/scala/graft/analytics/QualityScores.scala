package graft.analytics

import java.sql.Timestamp

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.{Column, DataFrame}

/** Port of `models/marts/py_data_quality_scores.py` — per-country
  * completeness / timeliness / validity / consistency scores, weighted
  * overall grade, primary-issue diagnosis.
  *
  * The per-country pandas loop becomes one groupBy; `datetime.now()` is
  * replaced by the injected `asOf` clock so scores are reproducible
  * (SURVEY §7.4.4).
  */
object QualityScores {

  private val UMin = 0.0;  private val UMax = 30.0
  private val IMin = -5.0; private val IMax = 20.0
  private val TimelinessDays = 90

  def score(fct: DataFrame, asOf: Timestamp): DataFrame = {
    val word = Window.partitionBy(col("country_code"))
      .orderBy(col("reference_date"), col("indicator_key"))
    def pct(numer: Column, denom: Column): Column =
      numer.cast(DoubleType) / denom.cast(DoubleType) * 100

    // pandas diff()==0 on the dropna series: consecutive non-null equal
    val uPrev = last(col("unemployment_rate_pct"), ignoreNulls = true)
      .over(word.rowsBetween(Window.unboundedPreceding, -1))
    val iPrev = last(col("inflation_rate_mom_pct"), ignoreNulls = true)
      .over(word.rowsBetween(Window.unboundedPreceding, -1))

    val agg = fct
      .withColumn("u_rep", (col("unemployment_rate_pct") === uPrev).cast(LongType))
      .withColumn("i_rep", (col("inflation_rate_mom_pct") === iPrev).cast(LongType))
      .groupBy(col("country_code"))
      .agg(
        count(lit(1)).as("total_records"),
        count(col("unemployment_rate_pct")).as("u_nonnull"),
        count(col("inflation_rate_mom_pct")).as("i_nonnull"),
        count(when(col("unemployment_rate_pct").between(UMin, UMax), 1)).as("u_valid"),
        count(when(col("inflation_rate_mom_pct").between(IMin, IMax), 1)).as("i_valid"),
        sum(coalesce(col("u_rep"), lit(0L))).as("u_repeats"),
        sum(coalesce(col("i_rep"), lit(0L))).as("i_repeats"),
        max(col("reference_date")).as("latest_data_date"))

    val uComp = pct(col("u_nonnull"), col("total_records"))
    val iComp = pct(col("i_nonnull"), col("total_records"))
    val days  = datediff(lit(asOf).cast(DateType), col("latest_data_date")).cast(LongType)
    val timeliness = when(days <= TimelinessDays, lit(100.0))
      .otherwise(greatest(lit(0.0),
        lit(100.0) - (days - TimelinessDays).cast(DoubleType) / 30.0 * 10.0))
    val uValid = when(col("u_nonnull") > 0, pct(col("u_valid"), col("u_nonnull")))
    val iValid = when(col("i_nonnull") > 0, pct(col("i_valid"), col("i_nonnull")))
    val validity = when(uValid.isNotNull || iValid.isNotNull,
      meanOfPresent(uValid, iValid)).otherwise(lit(100.0))
    val uCons = when(col("u_nonnull") > 10,
      greatest(lit(0.0), lit(100.0) - pct(col("u_repeats"), col("u_nonnull")) * 2))
    val iCons = when(col("i_nonnull") > 10,
      greatest(lit(0.0), lit(100.0) - pct(col("i_repeats"), col("i_nonnull")) * 2))
    val consistency = when(uCons.isNotNull || iCons.isNotNull,
      meanOfPresent(uCons, iCons)).otherwise(lit(100.0))
    val completeness = (uComp + iComp) / 2

    val overall = lit(0.30) * completeness + lit(0.25) * timeliness +
      lit(0.25) * validity + lit(0.20) * consistency

    agg.select(
      col("country_code"),
      col("total_records"),
      completeness.as("completeness_score"),
      uComp.as("unemployment_completeness"),
      iComp.as("inflation_completeness"),
      timeliness.as("timeliness_score"),
      days.as("days_since_latest_data"),
      col("latest_data_date").cast(StringType).as("latest_data_date"),
      validity.as("validity_score"),
      coalesce(uValid, lit(0.0)).as("unemployment_validity"),
      coalesce(iValid, lit(0.0)).as("inflation_validity"),
      consistency.as("consistency_score"),
      overall.as("overall_quality_score"),
      when(overall >= 90, "A").when(overall >= 80, "B").when(overall >= 70, "C")
        .when(overall >= 60, "D").otherwise("F").as("quality_grade"),
      lit("1.0.0").as("scoring_model_version"),
      when(completeness < 80, "completeness")
        .when(timeliness < 80, "timeliness")
        .when(validity < 80, "validity")
        .when(consistency < 80, "consistency")
        .otherwise("none").as("primary_issue"),
      (overall < 70).as("requires_attention"))
  }

  /** np.mean over the subset of scores that were computed (present keys in
    * the reference's dict — not null-skipping over a fixed set).
    */
  private def meanOfPresent(a: Column, b: Column): Column =
    when(a.isNotNull && b.isNotNull, (a + b) / 2)
      .when(a.isNotNull, a)
      .otherwise(b)
}
