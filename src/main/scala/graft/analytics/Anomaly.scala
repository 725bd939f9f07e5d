package graft.analytics

import graft.functions.Exact
import org.apache.spark.sql.expressions.{Window, WindowSpec}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType
import org.apache.spark.sql.{Column, DataFrame}

/** Port of `models/marts/py_anomaly_detection.py` — z-score, IQR, and
  * rate-of-change anomalies per country over the monthly fact table.
  *
  * The reference loops over countries in pandas (scalability cliff,
  * SURVEY §3.2); every computation is country-local, so here each becomes
  * a window/group operation over `partition by country_code` — identical
  * results, no driver-side collect, linear scale-out.
  *
  * Pandas parity notes: std is ddof=1 over non-null values; quantile is
  * linear interpolation (Spark exact `percentile`); `pct_change` pads the
  * previous non-null value; NaN comparisons are false (→ coalesce false);
  * the ≥-guard is strictly `len(series) > 10`.
  */
object Anomaly {

  private val ZThreshold   = 3.0
  private val IqrMult      = 1.5
  private val RocThreshold = 0.5
  private val MinObs       = 10

  def detect(fct: DataFrame): DataFrame = {
    val wc    = Window.partitionBy(col("country_code"))
    val word  = Window.partitionBy(col("country_code"))
      .orderBy(col("reference_date"), col("indicator_key"))

    val (zU, iqrU, rocU) = anomalyCols(col("unemployment_rate_pct"), wc, word)
    val (zI, iqrI, rocI) = anomalyCols(col("inflation_rate_mom_pct"), wc, word)

    val isUAnom = coalesce(abs(zU) > ZThreshold, lit(false)) || iqrU || rocU
    val isIAnom = coalesce(abs(zI) > ZThreshold, lit(false)) || iqrI || rocI
    val severity = least(
      least(coalesce(abs(zU), lit(0.0)), lit(5.0)) * 10 +
        least(coalesce(abs(zI), lit(0.0)), lit(5.0)) * 10,
      lit(100.0))

    fct.select(
      col("indicator_key"), col("country_code"), col("reference_date"),
      col("reference_year"), col("reference_month"),
      col("unemployment_rate_pct"), col("inflation_rate_mom_pct"),
      zU.as("unemployment_z_score"), zI.as("inflation_z_score"),
      isUAnom.as("is_unemployment_anomaly"), isIAnom.as("is_inflation_anomaly"),
      (isUAnom || isIAnom).as("is_any_anomaly"),
      severity.as("anomaly_severity_score"))
  }

  /** (z, iqrOutlier, rocAnomaly) for one metric with the >10-obs guard. */
  private def anomalyCols(c: Column, wc: WindowSpec, word: WindowSpec)
      : (Column, Column, Column) = {
    val n      = count(c).over(wc)
    val mean   = sum(Exact.dec(c, 6)).over(wc).cast(DoubleType) / n.cast(DoubleType)
    val sx     = sum(Exact.dec(c, 6)).over(wc).cast(DoubleType)
    val sxx    = sum(Exact.dec(c, 6) * Exact.dec(c, 6)).over(wc).cast(DoubleType)
    val nd     = n.cast(DoubleType)
    val sd     = when(n > 1, sqrt(greatest(lit(0.0), (nd * sxx - sx * sx) / (nd * (nd - 1.0)))))
    // pandas: std==0 or NaN → z column of zeros; guard len(series) > 10
    val z = when(n > MinObs,
      when(sd.isNull || sd === 0, lit(0.0)).otherwise((c - mean) / sd))
    val q1  = expr(s"percentile(${colName(c)}, 0.25)").over(wc)
    val q3  = expr(s"percentile(${colName(c)}, 0.75)").over(wc)
    val iqr = q3 - q1
    val iqrOutlier = when(n > MinObs,
      coalesce(c < q1 - iqr * IqrMult || c > q3 + iqr * IqrMult, lit(false)))
      .otherwise(lit(false))
    // pct_change with pad: previous non-null value in date order.
    // prev == 0 → pandas produces ±inf (flag true unless current is 0 →
    // NaN → false); spelled out because ANSI mode would throw on x/0.
    val prev = last(c, ignoreNulls = true)
      .over(word.rowsBetween(Window.unboundedPreceding, -1))
    val roc = when(n > MinObs,
      when(prev.isNull, lit(false))
        .when(prev === 0 && c =!= 0, lit(true))
        .when(prev === 0, lit(false))
        .otherwise(coalesce(abs(c / prev - 1) > RocThreshold, lit(false))))
      .otherwise(lit(false))
    (z, iqrOutlier, roc)
  }

  private def colName(c: Column): String = c.toString
}
