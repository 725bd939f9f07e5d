package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.{Window, WindowSpec}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType

/** Scala ports of the reference's Jinja macros
  * (`/root/reference/macros/calculations.sql`). Each macro expands to SQL
  * text at dbt compile time; here each is a plain function returning a
  * `Column`, so Catalyst sees the same declarative expression and keeps
  * whole-stage codegen (no UDFs anywhere).
  */
object Macros {

  /** Surrogate key: md5 over '||'-joined, null-coalesced string casts.
    * Byte-identical to the reference macro (`macros/calculations.sql:1-13`)
    * — required for key parity with a DuckDB oracle.
    */
  def surrogateKey(cols: Column*): Column =
    md5(concat_ws("||", cols.map(c => coalesce(c.cast(StringType), lit(""))): _*))

  /** Constant-but-NON-FOLDABLE window partition key: `pmod(c, 1)` is 0
    * for every row, so execution is identical to an unpartitioned window
    * (all rows through one task — callers use this ONLY over frames that
    * are constant-sized by construction: bucket aggregates, per-partition
    * offset rows), but the partition spec stays non-empty so Spark's
    * "WindowExec: No Partition Defined" warning can't bury a REAL
    * unpartitioned-window scale-killer in the logs. A foldable `lit(0)`
    * key does NOT work — the optimizer folds it away and the warning
    * returns. One definition so a Spark upgrade that changes the folding
    * behavior is fixed in one place.
    */
  def constPartition(c: Column): Column = pmod(c, lit(1))

  /** Year-over-year change: (current - previous) / previous * 100, null
    * when the previous value is null or zero
    * (`macros/calculations.sql:16-48`).
    */
  def yoyChange(value: Column, partition: Column, order: Column): Column = {
    val prev = lag(value, 1).over(Window.partitionBy(partition).orderBy(order))
    yoyFromLag(value, prev)
  }

  /** YoY arithmetic given an already-computed lagged column (lets callers
    * reuse one window for several derived metrics).
    */
  def yoyFromLag(value: Column, prev: Column): Column =
    when(prev.isNotNull && prev =!= 0, (value - prev) / prev * 100)
      .otherwise(lit(null))

  /** Rolling average over the trailing `periods` rows (inclusive), partial
    * windows included (`macros/calculations.sql:51-69`):
    * `rows between periods-1 preceding and current row`.
    */
  def rollingAvg(value: Column, partition: Column, order: Column, periods: Int = 12): Column =
    avg(value).over(
      Window
        .partitionBy(partition)
        .orderBy(order)
        .rowsBetween(-(periods - 1).toLong, Window.currentRow))

  /** Rank within a partition (`macros/calculations.sql:72-88`).
    * DuckDB orders NULLS LAST in both directions by default; Spark's `asc`
    * is nulls-first — explicit `_nulls_last` keeps oracle parity
    * (SURVEY §7.4.1).
    */
  def rankWithinGroup(value: Column, partition: Column, ascending: Boolean = true): Column = {
    val ord = if (ascending) value.asc_nulls_last else value.desc_nulls_last
    rank().over(Window.partitionBy(partition).orderBy(ord))
  }

  /** Safe division defaulting on zero/null denominator
    * (`macros/calculations.sql:91-108`; default = 0 like the reference).
    */
  def safeDivide(num: Column, den: Column, default: Column = lit(0)): Column =
    when(den.isNull || den === 0, default).otherwise(num / den)

  /** The models' inline variant: NULL (not 0) on zero/null denominator —
    * e.g. gdp_per_capita (`int_country_annual_metrics.sql:75-79`). The
    * reference keeps both behaviors distinct (SURVEY §7.4.6).
    */
  def nullSafeDivide(num: Column, den: Column): Column =
    when(den.isNull || den === 0, lit(null)).otherwise(num / den)
}
