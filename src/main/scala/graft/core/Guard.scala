package graft.core

import org.apache.spark.sql.{DataFrame, Row}

/** Fail-fast bounds for every driver-side collect boundary.
  *
  * Each operator that pulls state to the driver is driver-sized BY
  * CONSTRUCTION — k centroids, k·m PQ codebooks, d² covariance moments,
  * a bounded query batch, ≤k² probe pairs. These helpers turn that
  * construction argument into a RUNTIME contract: a misconfigured
  * 100×-scale run refuses fast, with the documented bound and the fix in
  * the message, instead of OOMing the driver minutes later.
  */
object Guard {

  /** Collect at most `max` rows from `df`; abort with the documented
    * bound if the frame exceeds it. The probe rides the plan as
    * `limit(max+1)`, so even the VIOLATING job stays cheap — it never
    * gathers more than one row past the bound.
    */
  def boundedCollect(df: DataFrame, max: Long, what: String,
                     fix: String): Array[Row] = {
    val probe = math.min(max, (Int.MaxValue - 1).toLong).toInt + 1
    val rows = df.limit(probe).collect()
    require(rows.length <= max,
      s"$what: driver-side collect exceeds its documented bound of $max " +
        s"rows — this boundary is driver-sized by construction, so a " +
        s"larger frame means an upstream misconfiguration; $fix")
    rows
  }

  /** Assert a driver-state-determining ARGUMENT against its documented
    * cap before any job runs (the cheapest possible failure point).
    */
  def boundedArg(value: Long, max: Long, what: String, why: String): Unit =
    require(value <= max,
      s"$what = $value exceeds the documented driver-state cap of $max; $why")
}
