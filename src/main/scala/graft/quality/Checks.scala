package graft.quality

import java.sql.{Date, Timestamp}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType
import org.apache.spark.sql.DataFrame

/** Generic data-quality checks: each returns a DataFrame of violation
  * rows — the dbt test convention (nonzero count = fail, SURVEY §5).
  * Covers the reference's generic column tests (`unique`, `not_null`,
  * `relationships`) and macro-defined tests
  * (`macros/data_quality.sql:1-63`), plus source freshness
  * (`_sources.yml:27-30`).
  */
object Checks {

  /** `unique`: key groups appearing more than once. */
  def unique(df: DataFrame, cols: Seq[String]): DataFrame =
    df.groupBy(cols.map(col): _*).count().filter(col("count") > 1)

  /** `not_null`: rows with a null in the column. */
  def notNull(df: DataFrame, column: String): DataFrame =
    df.filter(col(column).isNull)

  /** `relationships`: child keys with no matching parent (left anti),
    * the fct→dim referential test (`_marts__models.yml:90-93`).
    */
  def relationships(child: DataFrame, childCol: String,
                    parent: DataFrame, parentCol: String): DataFrame =
    child.filter(col(childCol).isNotNull)
      .join(parent.select(col(parentCol).as(childCol)), Seq(childCol), "left_anti")

  /** `test_value_in_range` (`macros/data_quality.sql:1-15`). */
  def valueInRange(df: DataFrame, column: String, min: Double, max: Double): DataFrame =
    df.filter(col(column) < min || col(column) > max)

  /** `test_no_future_dates` (`:18-27`) with injected clock. */
  def noFutureDates(df: DataFrame, column: String, asOf: Date): DataFrame =
    df.filter(col(column) > lit(asOf))

  /** `test_completeness_threshold` (`:30-46`): single violation row when
    * the non-null ratio is under threshold.
    */
  def completenessThreshold(df: DataFrame, column: String, threshold: Double = 0.95): DataFrame =
    df.agg(count(lit(1)).as("total_rows"), count(col(column)).as("non_null_rows"))
      .filter(col("non_null_rows").cast(DoubleType) / col("total_rows").cast(DoubleType) < threshold)

  /** Source freshness (`_sources.yml`): status per the warn/error SLA on
    * `max(loadedAtCol)` vs the injected clock.
    */
  def freshness(df: DataFrame, loadedAtCol: String, asOf: Timestamp,
                warnAfterDays: Int = 7, errorAfterDays: Int = 30): DataFrame =
    df.agg(max(col(loadedAtCol)).as("max_loaded_at"))
      .select(
        col("max_loaded_at"),
        datediff(lit(asOf).cast("date"), col("max_loaded_at").cast("date"))
          .as("days_since_load"))
      .withColumn("freshness_status",
        when(col("days_since_load") <= warnAfterDays, "pass")
          .when(col("days_since_load") <= errorAfterDays, "warn")
          .otherwise("error"))
}
