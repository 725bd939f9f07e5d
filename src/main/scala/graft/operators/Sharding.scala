package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType
import org.apache.spark.sql.{DataFrame, Encoders, Row}

/** Distributed running totals and token-budget sharding — the
  * shard-assignment step of a training-dataset build.
  *
  * A naive `Window.orderBy(id)` running sum moves EVERY row through one
  * task (Spark warns "No Partition Defined for Window operation"); at
  * 100 TB that is the classic scale-killer. Instead we use the textbook
  * two-pass parallel prefix sum:
  *
  *  1. range-partition by the (unique) id column, so partition `i` holds a
  *     contiguous id range and all ids in partition `i` sort before those
  *     in partition `i+1`;
  *  2. a per-partition sequential fold produces the LOCAL running sum
  *     (no shuffle — the sort is within partitions);
  *  3. per-partition totals (ONE row per partition) get an exclusive
  *     prefix sum — a global window over #partitions rows, constant-sized
  *     regardless of data volume — and are broadcast-joined back as
  *     offsets.
  *
  * The folded output is CACHED and the offsets derive from it
  * (`max_by(local_cum, id)` per partition), so both consumers observe the
  * SAME materialization of the sampled range boundaries — correctness
  * does not depend on Catalyst's ReuseExchange deduplicating two
  * evaluations of a sampled (seed-per-RDD) exchange. Total cost: one
  * range shuffle of the projected columns, one cached pass, a
  * #partitions-row aggregate, and a broadcast join. The result is
  * identical to the single-task global window for any partition count
  * because the id column is unique and the per-partition fold order
  * matches the global id order.
  */
object Sharding {

  /** `cumCol` = running total of `valCol` in ascending `idCol` order
    * (inclusive of the current row), computed with the two-pass parallel
    * prefix sum above. `idCol` must be unique; `valCol` must be castable
    * to long. Output columns: idCol, valCol (as long), cumCol.
    */
  def runningTotal(
      df: DataFrame,
      idCol: String,
      valCol: String,
      cumCol: String,
      parts: Int = 32): DataFrame = {
    val base = df
      .select(col(idCol), col(valCol).cast(LongType).as(valCol))
      .repartitionByRange(parts, col(idCol))
      .withColumn("__pid", spark_partition_id())

    // Pass 1: per-partition sequential fold in id order — the one place a
    // row-at-a-time fold is the right tool (running state, zero shuffle).
    val sorted    = base.sortWithinPartitions(col(idCol))
    val outSchema = sorted.schema.add("__local_cum", LongType, nullable = false)
    val local = sorted.mapPartitions { it =>
      var acc = 0L
      it.map { r =>
        acc += r.getLong(1)
        Row.fromSeq(r.toSeq :+ acc)
      }
    }(Encoders.row(outSchema)).cache()

    // Pass 2: exclusive prefix of the per-partition totals, derived from
    // the CACHED fold (partition total = running sum at the partition's
    // max id — max_by, so negative values are fine). The global window
    // here sees exactly `parts` rows (one per partition) — bounded by the
    // partition count, not the data size.
    val offsets = local
      .groupBy(col("__pid"))
      .agg(max_by(col("__local_cum"), col(idCol)).as("__psum"))
      .withColumn(
        "__offset",
        coalesce(
          sum(col("__psum")).over(
            Window.orderBy(col("__pid")).rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
      .select(col("__pid"), col("__offset"))

    local
      .join(broadcast(offsets), "__pid")
      .select(col(idCol), col(valCol), (col("__local_cum") + col("__offset")).as(cumCol))
  }

  /** Pack rows into shards of ~`budget` units by cumulative `valCol` in
    * `idCol` order: shard_id = floor(exclusive_running_total / budget) —
    * a document lands in the shard its FIRST token falls into.
    */
  def byBudget(
      df: DataFrame,
      idCol: String,
      valCol: String,
      budget: Long,
      parts: Int = 32): DataFrame =
    runningTotal(df, idCol, valCol, "cum_tokens", parts)
      .withColumn(
        "shard_id",
        floor((col("cum_tokens") - col(valCol)) / budget.toDouble).cast(LongType))
}
