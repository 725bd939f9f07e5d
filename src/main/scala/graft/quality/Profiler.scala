package graft.quality

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.{Column, DataFrame}

/** One-pass table profiler — the data-docs primitive (per-column null
  * rates, distinct counts, ranges) a pipeline publishes next to its
  * dataset card (q100).
  *
  * Shape: ONE scan, with two distinct-count modes:
  *  - exact (default): multi-column `countDistinct` in one `agg` — which
  *    plans an Expand (rows × profiled columns before the partial
  *    aggregate), the documented price of exact distincts in one pass;
  *  - `approxDistinct = true`: the KMV sketch (`graftx.KmvDistinct`,
  *    q66) per column — O(k) mergeable state per column, NO Expand (the
  *    scan is read once at its natural width), the 100 TB mode. The
  *    estimate hashes each value's CANONICAL STRING (`cast(c as string)`),
  *    so callers must ensure that form is engine-portable: integers,
  *    strings and decimals are; raw doubles are NOT (formatting is
  *    engine-specific) — cast them to a decimal first (q136 does).
  *
  * Determinism: counts are exact integers; the KMV estimate is
  * deterministic arithmetic over md5 (hash-gates cross-engine — q66's
  * point); ranges are emitted as DOUBLE for numeric columns and VARCHAR
  * for string columns in SEPARATE columns — never a numeric→string cast,
  * whose formatting is engine-specific and would break oracle parity.
  */
object Profiler {

  def profile(df: DataFrame, cols: Seq[String],
              approxDistinct: Boolean = false, kmvK: Int = 64): DataFrame = {
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
    // the header's engine-portability contract, ENFORCED not just
    // documented: the KMV estimate hashes cast(c as string), and raw
    // double/float formatting is engine-specific — a caller profiling
    // such a column would get silently non-reproducible estimates
    if (approxDistinct) cols.foreach { c =>
      require(types(c) != DoubleType && types(c) != FloatType,
        s"approxDistinct hashes canonical strings and '$c' is " +
          s"${types(c).simpleString}, whose formatting is engine-specific " +
          "— cast it to a decimal first (q136 does)")
    }
    val distinctAgg: String => Column =
      if (approxDistinct)
        c => org.apache.spark.sql.graftx.KmvDistinct
          .kmvDistinct(col(c).cast(StringType), kmvK)
      else c => countDistinct(col(c))
    // count-difference, not sum(when(...)): over an EMPTY table sum is
    // NULL while the null count must be 0 (the oracle's count(*)−count(c))
    def pre(c: String) = Seq(
      (count(lit(1)) - count(col(c))).as(s"__nn_$c"),
      distinctAgg(c).as(s"__nd_$c")) ++
      (if (numeric(c))
        Seq(min(col(c)).cast(DoubleType).as(s"__mn_$c"),
            max(col(c)).cast(DoubleType).as(s"__mx_$c"))
      else
        Seq(min(col(c)).cast(StringType).as(s"__sn_$c"),
            max(col(c)).cast(StringType).as(s"__sx_$c")))
    val aggs = count(lit(1)).as("__rows") +: cols.flatMap(pre)
    val row  = df.agg(aggs.head, aggs.tail: _*)
    // the estimate is a DOUBLE under a distinct name, so the two modes
    // can never be confused by a schema-matching consumer
    val distinctField: String => Seq[Column] =
      if (approxDistinct) c => Seq(col(s"__nd_$c").as("n_distinct_est"))
      else c => Seq(col(s"__nd_$c").as("n_distinct"))
    val entries: Seq[Column] = cols.map { c =>
      struct(
        Seq(lit(c).as("column"),
            col("__rows").as("n_rows"),
            col(s"__nn_$c").as("n_nulls")) ++
        distinctField(c) ++
        Seq(
          (if (numeric(c)) col(s"__mn_$c") else lit(null).cast(DoubleType)).as("min_num"),
          (if (numeric(c)) col(s"__mx_$c") else lit(null).cast(DoubleType)).as("max_num"),
          (if (numeric(c)) lit(null).cast(StringType) else col(s"__sn_$c")).as("min_str"),
          (if (numeric(c)) lit(null).cast(StringType) else col(s"__sx_$c")).as("max_str")): _*)
    }
    row.select(explode(array(entries: _*)).as("p")).select(col("p.*"))
  }
}
