package graft.quality

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.{Column, DataFrame}

/** One-pass table profiler — the data-docs primitive (per-column null
  * rates, exact distinct counts, ranges) a pipeline publishes next to its
  * dataset card (q100).
  *
  * Shape: ONE scan. All per-column aggregates ride a single `agg` (the
  * multi-column `countDistinct` plans an Expand — rows × profiled
  * columns before the partial aggregate — which is the documented price
  * of exact distincts in one pass; at 100 TB swap in the KMV sketch
  * (`graftx.KmvDistinct`, q66) per column for constant-size state). The
  * single result row is then unpivoted driver-free via an
  * explode(array(structs)) projection.
  *
  * Determinism: counts are exact integers; ranges are emitted as DOUBLE
  * for numeric columns and VARCHAR for string columns in SEPARATE
  * columns — never a numeric→string cast, whose formatting is
  * engine-specific and would break oracle parity.
  */
object Profiler {

  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    val types = df.schema.fields.map(f => f.name -> f.dataType).toMap
    cols.foreach(c => require(types.contains(c), s"no such column: $c"))
    def numeric(c: String) = types(c) match {
      case _: NumericType => true
      case _              => false
    }
    // the typed-range contract only covers numeric and string columns —
    // anything else (timestamp, boolean, array, ...) would fall into the
    // string path via a cast whose FORMATTING is engine-specific (the
    // exact parity hazard the header forbids); fail loudly instead
    cols.foreach { c =>
      require(numeric(c) || types(c) == StringType,
        s"profile covers numeric and string columns; '$c' is ${types(c).simpleString} " +
          "— cast it explicitly (e.g. timestamp → epoch micros) before profiling")
    }
    // count-difference, not sum(when(...)): over an EMPTY table sum is
    // NULL while the null count must be 0 (the oracle's count(*)−count(c))
    def pre(c: String) = Seq(
      (count(lit(1)) - count(col(c))).as(s"__nn_$c"),
      countDistinct(col(c)).as(s"__nd_$c")) ++
      (if (numeric(c))
        Seq(min(col(c)).cast(DoubleType).as(s"__mn_$c"),
            max(col(c)).cast(DoubleType).as(s"__mx_$c"))
      else
        Seq(min(col(c)).cast(StringType).as(s"__sn_$c"),
            max(col(c)).cast(StringType).as(s"__sx_$c")))
    val aggs = count(lit(1)).as("__rows") +: cols.flatMap(pre)
    val row  = df.agg(aggs.head, aggs.tail: _*)
    val entries: Seq[Column] = cols.map { c =>
      struct(
        lit(c).as("column"),
        col("__rows").as("n_rows"),
        col(s"__nn_$c").as("n_nulls"),
        col(s"__nd_$c").as("n_distinct"),
        (if (numeric(c)) col(s"__mn_$c") else lit(null).cast(DoubleType)).as("min_num"),
        (if (numeric(c)) col(s"__mx_$c") else lit(null).cast(DoubleType)).as("max_num"),
        (if (numeric(c)) lit(null).cast(StringType) else col(s"__sn_$c")).as("min_str"),
        (if (numeric(c)) lit(null).cast(StringType) else col(s"__sx_$c")).as("max_str"))
    }
    row.select(explode(array(entries: _*)).as("p")).select(col("p.*"))
  }
}
