package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampType}
import org.apache.spark.sql.{Column, DataFrame}

/** Temporal join operators Spark lacks as built-ins: as-of join and
  * bounded range join — composed from existing operators (preference (a)
  * of the custom-operator ladder) so Catalyst keeps planning them.
  */
object TemporalJoins {

  /** Epoch-micros of a time column. `unix_micros` requires TIMESTAMP, so
    * a TIMESTAMP_NTZ input (Spark ≥4.1's reading of TIMESTAMP(NANOS)
    * parquet — see [[graft.core.Tables.canonicalEventsTs]]) goes through
    * a cast first; for an already-canonical TIMESTAMP the cast is a
    * Catalyst no-op. The cast interprets ntz wall-clock in the session
    * zone — the engine runs UTC sessions (oracle-parity contract), under
    * which the instant is preserved.
    */
  private def epochMicros(c: Column): Column = unix_micros(c.cast(TimestampType))

  /** Entry guard: [[epochMicros]] casts a TIMESTAMP_NTZ column to
    * TIMESTAMP in the SESSION zone — the instant survives only under
    * UTC, the same contract [[graft.core.Tables.canonicalEventsTs]]
    * enforces at the events reader. A caller handing a raw NTZ frame to
    * these operators in a non-UTC session fails loudly here instead of
    * getting silently shifted instants.
    */
  private def requireCanonicalTime(df: DataFrame, colName: String): Unit =
    df.schema(colName).dataType match {
      case org.apache.spark.sql.types.TimestampNTZType =>
        graft.core.Tables.requireUtc(df.sparkSession, colName)
      case _ => ()
    }

  /** Backward as-of join: for each left row, attach the latest right row
    * with `rightTime <= leftTime` on the same key (ties: the right row at
    * the exact timestamp applies).
    *
    * Shape: tag + union + one per-key window carrying the last non-null
    * right payload — a single shuffle on the key, NO range-condition join
    * (a naive `l.t >= r.t` theta join is a per-key cross product; this is
    * the sort-merge rendering, which is also the 100 TB shape: both sides
    * shuffle once by key and stream in time order).
    *
    * Right payload columns come back `asof_`-prefixed, null when no right
    * row precedes the left row.
    */
  def asofBackward(left: DataFrame, right: DataFrame, keys: Seq[String],
                   leftTime: String, rightTime: String,
                   payloadCols: Seq[String]): DataFrame = {
    requireCanonicalTime(left, leftTime); requireCanonicalTime(right, rightTime)
    val payload = struct(payloadCols.map(col): _*)
    val r = right.select(
      keys.map(col) ++ Seq(col(rightTime).as("__t"), lit(0).as("__tag"),
        payload.as("__rpay")): _*)
    val payloadType = r.schema("__rpay").dataType
    val l = left.select(
      keys.map(col) ++ Seq(col(leftTime).as("__t"), lit(1).as("__tag"),
        lit(null).cast(payloadType).as("__rpay"),
        struct(left.columns.map(col): _*).as("__lrow")): _*)
    val unioned = r.withColumn("__lrow", lit(null).cast(l.schema("__lrow").dataType))
      .unionByName(l)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__t"), col("__tag"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = unioned.withColumn("__asof", last(col("__rpay"), ignoreNulls = true).over(w))
    val outCols = left.columns.map(c => col(s"__lrow.$c").as(c)) ++
      payloadCols.map(c => col(s"__asof.$c").as(s"asof_$c"))
    carried.filter(col("__tag") === 1).select(outCols: _*)
  }

  /** Bounded range join: pairs (l, r) on the same key with
    * `r.time ∈ (l.time, l.time + window]`. Implemented by time-binning:
    * each left row probes its own bin and the next (`explode` of two bin
    * ids), turning the inequality join into an equi-join + residual
    * filter — candidates per row are bounded by bin occupancy instead of
    * the per-key cross product. `windowMicros` is the bound and the bin
    * width.
    */
  def boundedRangeJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
                       leftTime: String, rightTime: String,
                       windowMicros: Long): DataFrame = {
    requireCanonicalTime(left, leftTime); requireCanonicalTime(right, rightTime)
    val lBinned = left
      .withColumn("__lt", epochMicros(col(leftTime)))
      .withColumn("__bin",
        explode(array(
          (col("__lt") / windowMicros).cast(LongType),
          (col("__lt") / windowMicros).cast(LongType) + 1)))
    val rBinned = right
      .withColumn("__rt", epochMicros(col(rightTime)))
      .withColumn("__bin", (col("__rt") / windowMicros).cast(LongType))
      .select((keys.map(col) :+ col("__bin") :+ col("__rt")) ++
        right.columns.filterNot(keys.contains).map(c => col(c).as(s"r_$c")): _*)
    lBinned
      .join(rBinned, keys :+ "__bin")
      .filter(col("__rt") > col("__lt") && col("__rt") <= col("__lt") + windowMicros)
      .drop("__bin", "__lt", "__rt")
  }

  /** Sessionization: gap-based session ids per key (new session when the
    * gap to the previous event exceeds `gapMicros`), then per-session
    * rollup — lag + running sum, the standard composable form.
    */
  def sessionize(events: DataFrame, keys: Seq[String], timeCol: String,
                 gapMicros: Long): DataFrame = {
    requireCanonicalTime(events, timeCol)
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col(timeCol))
    events
      .withColumn("__prev", lag(col(timeCol), 1).over(w))
      .withColumn("__new_session",
        when(col("__prev").isNull, 1L)
          .when(epochMicros(col(timeCol)) - epochMicros(col("__prev")) > gapMicros, 1L)
          .otherwise(0L))
      .withColumn("session_seq",
        sum(col("__new_session")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .drop("__prev", "__new_session")
  }
}
