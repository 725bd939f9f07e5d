package graft

import org.apache.spark.sql.functions._

/** One-shot measurement main for the batched-BPE scaling claim (round-13
  * verdict stretch ask): q210's gated budget is 16 rounds × 16 merges =
  * 256; the 4.2× batching win (64.5 → 15.2 s vs one-merge-per-round at
  * equal budget) extrapolates to the 32k-vocab regime only if round
  * count, not merge count, stays the wall as the budget grows. This main
  * grounds one more point on that curve: a 1,024-merge fit (default
  * 32 rounds × batch 32) on the sf0.1 documents corpus, reporting wall
  * time, rounds consumed, and merges actually selected (the greedy
  * disjoint prefix can under-fill a round; the fit stops at whichever of
  * numMerges/maxRounds binds first).
  *
  * Not a gate — q210's oracle pins the algorithm at the 256 budget; this
  * is the measured data point PERF.md cites. Usage:
  *   runMain graft.BpeScaleDemo [sfDir] [numMerges] [maxBatch]
  */
object BpeScaleDemo {
  def main(args: Array[String]): Unit = {
    val dir       = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val numMerges = if (args.length > 1) args(1).toInt else 1024
    val maxBatch  = if (args.length > 2) args(2).toInt else 32
    val maxRounds = (numMerges + maxBatch - 1) / maxBatch
    val spark = core.Sessions.local(32, "bpe-scale-demo")
    spark.range(1000).selectExpr("sum(id)").collect()
    val docs = core.Tables(spark, dir).documents
      .filter(col("text").isNotNull && length(col("text")) >= 1)
    val t0 = System.nanoTime()
    val merges = operators.Bpe.fitDeltaBatched(
      docs, "text", numMerges = numMerges, maxBatch = maxBatch,
      maxRounds = maxRounds)
    val sec = (System.nanoTime() - t0) / 1e9
    println(String.format(java.util.Locale.ROOT,
      """{"metric":"bpe_scale_demo","num_merges_requested":%d,"max_batch":%d,"max_rounds":%d,"merges_selected":%d,"fit_sec":%.1f,"sf":"%s"}""",
      Int.box(numMerges), Int.box(maxBatch), Int.box(maxRounds),
      Int.box(merges.size), Double.box(sec), dir.split('/').last))
    spark.stop()
  }
}
