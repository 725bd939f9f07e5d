package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType
import org.apache.spark.sql.{Column, DataFrame, Encoders, Row}

/** Distributed running totals and token-budget sharding — the
  * shard-assignment step of a training-dataset build.
  *
  * A naive `Window.orderBy(id)` running sum moves EVERY row through one
  * task (Spark warns "No Partition Defined for Window operation"); at
  * 100 TB that is the classic scale-killer. Instead: the textbook
  * two-pass parallel prefix sum over an EXPLICIT range bucketing:
  *
  *  1. bucket boundaries are computed ONCE on the driver (approximate
  *     quantiles of the id column) and embedded as literals, so the
  *     bucket of a row is a pure deterministic function of its id —
  *     every re-evaluation, task retry, or plan branch agrees without
  *     caching anything (unlike `repartitionByRange`, whose sampled
  *     boundaries are seeded per RDD instantiation);
  *  2. a per-bucket sequential fold (sort within partitions, reset at
  *     bucket changes) produces the LOCAL running sum — no extra shuffle;
  *  3. per-bucket totals (ONE row per bucket) get an exclusive prefix
  *     sum — a global window over #buckets rows, constant-sized
  *     regardless of data volume — and are broadcast-joined back as
  *     offsets.
  *
  * Total cost: one driver-side quantile pass, one hash shuffle on the
  * bucket id, a #buckets-row aggregate, and a broadcast join. The result
  * is identical to the single-task global window for any bucket count
  * because the id column is unique and the per-bucket fold order matches
  * the global id order.
  */
object Sharding {

  /** EXPLICIT boundary pass: approximate quantiles of `idCol`, collected
    * on the driver and meant to be embedded as literals by
    * [[runningTotal]]. This RUNS A SCAN of (idCol) when called — it is
    * the eager step of the two-pass prefix sum, surfaced as its own API
    * so callers building plans they may never execute don't pay it
    * implicitly, and so one boundary set can be reused across several
    * derived plans.
    */
  def boundaries(df: DataFrame, idCol: String, parts: Int = 32): Array[Double] =
    if (parts <= 1) Array.empty[Double]
    else df.stat
      .approxQuantile(idCol, (1 until parts).map(_.toDouble / parts).toArray, 0.001)
      .distinct.sorted

  /** Convenience overload: computes [[boundaries]] (ONE EAGER SCAN of
    * `idCol` at call time) and delegates.
    */
  def runningTotal(
      df: DataFrame,
      idCol: String,
      valCol: String,
      cumCol: String,
      parts: Int): DataFrame =
    runningTotal(df, idCol, valCol, cumCol, boundaries(df, idCol, parts))

  def runningTotal(df: DataFrame, idCol: String, valCol: String, cumCol: String): DataFrame =
    runningTotal(df, idCol, valCol, cumCol, 32)

  /** `cumCol` = running total of `valCol` in ascending `idCol` order
    * (inclusive of the current row), computed with the two-pass parallel
    * prefix sum above over literal `bounds` (from [[boundaries]], or any
    * sorted split points). Pure plan construction — no job runs here.
    * `idCol` must be unique and numeric; `valCol` must be castable to
    * long. Output columns: idCol, valCol (as long), cumCol.
    */
  def runningTotal(
      df: DataFrame,
      idCol: String,
      valCol: String,
      cumCol: String,
      bounds: Array[Double]): DataFrame = {
    val parts = bounds.length + 1
    val bucket: Column = bounds.zipWithIndex
      .foldRight(lit(bounds.length): Column) { case ((b, i), rest) =>
        when(col(idCol) <= b, i).otherwise(rest)
      }
    val base = df
      .select(col(idCol), col(valCol).cast(LongType).as(valCol))
      .withColumn("__pid", bucket.cast(LongType))

    // Pass 1: per-bucket sequential fold in id order — the accumulator
    // resets when the bucket changes within a physical partition.
    val sorted    = base.repartition(parts, col("__pid"))
      .sortWithinPartitions(col("__pid"), col(idCol))
    val outSchema = sorted.schema.add("__local_cum", LongType, nullable = false)
    val local = sorted.mapPartitions { it =>
      var acc = 0L
      var pid = Long.MinValue
      it.map { r =>
        val p = r.getLong(2)
        if (p != pid) { acc = 0L; pid = p }
        acc += r.getLong(1)
        Row.fromSeq(r.toSeq :+ acc)
      }
    }(Encoders.row(outSchema))

    // Pass 2: exclusive prefix of the per-bucket totals — aggregated from
    // `local` (the fold output), NOT from `sorted`: a column-pruned
    // re-derivation of `sorted` canonicalizes differently (pass 2 needs no
    // id column), so its exchange would NOT be reused and the input would
    // be scanned and shuffled twice — measured, not hypothetical (the
    // round-2 plan did exactly that). The object-typed fold blocks
    // pruning, so both consumers reference the IDENTICAL exchange subtree
    // and ReuseExchange/AQE stage reuse serves pass 2 from pass 1's
    // shuffle output: one scan, one shuffle write, two shuffle reads plus
    // a (linear, cheap) re-fold — asserted by PlanQualitySpec. The global
    // window sees ≤ `parts` rows.
    val offsets = local
      .groupBy(col("__pid"))
      .agg(sum(col(valCol)).as("__psum"))
      .withColumn(
        "__offset",
        coalesce(
          sum(col("__psum")).over(
            // the offsets frame is ≤ `parts` rows by construction — see
            // Macros.constPartition for why the key is pmod, not lit(0)
            Window.partitionBy(graft.functions.Macros.constPartition(col("__pid")))
              .orderBy(col("__pid")).rowsBetween(Window.unboundedPreceding, -1)),
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

  /** Greedy sequence packing — training-batch construction: pack whole
    * documents into capacity-`capacity` bins WITHOUT splitting (vs
    * [[byBudget]], which cuts shard boundaries mid-stream by start
    * offset). The corpus splits into `numStreams` deterministic packing
    * streams (`id % numStreams` — a pure function of the id, so retries
    * and re-evaluations agree); within a stream, documents in id order
    * fold greedily: a document that would overflow the open bin closes
    * it and opens the next (an oversized document > capacity gets a bin
    * of its own, and the following document always starts fresh).
    *
    * 100 TB shape: packing is inherently sequential PER STREAM — the
    * parallelism knob is `numStreams` (one task's sorted fold per
    * stream, the shape production packers run); no global window, no
    * driver state, one hash shuffle on the stream id +
    * `flatMapSortedGroups` (shuffle-sorted iterators, nothing held in
    * memory per group beyond the open-bin counter).
    */
  def packGreedy(
      df: DataFrame,
      idCol: String,
      valCol: String,
      capacity: Long,
      numStreams: Int = 32): DataFrame = {
    require(capacity >= 1, "packGreedy needs capacity >= 1")
    require(numStreams >= 1, "packGreedy needs numStreams >= 1")
    val spark = df.sparkSession
    import spark.implicits._
    df.select(
        col(idCol).cast(LongType).as("doc_id"),
        col(valCol).cast(LongType).as("n"),
        pmod(col(idCol).cast(LongType), lit(numStreams.toLong)).as("stream_id"))
      .as[(Long, Long, Long)]
      .groupByKey(_._3)
      .flatMapSortedGroups(col("doc_id")) { (stream: Long, it: Iterator[(Long, Long, Long)]) =>
        var bin  = 0L
        var fill = -1L // sentinel: no open bin yet
        it.map { case (docId, n, _) =>
          if (fill < 0 || fill + n > capacity) { bin += 1; fill = n }
          else fill += n
          (docId, stream, bin, n, fill)
        }
      }
      .toDF("doc_id", "stream_id", "bin_seq", "n_tokens", "bin_fill_after")
  }
}
