package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType
import org.apache.spark.sql.{Column, DataFrame}

/** Byte-pair-style merge induction over token sequences — the
  * tokenizer-FITTING step of a training-data pipeline (the engine already
  * ships tokenizer APPLICATION: regex token counts, q30). Word-level
  * variant of the BPE loop (Sennrich et al., ACL'16 — public algorithm):
  * repeatedly count adjacent pairs and merge the most frequent one,
  * greedily left-to-right non-overlapping.
  *
  * 100 TB shape (the kmeans discipline): each round is ONE corpus scan —
  * a scan-local pair projection (`zip_with` over shifted slices, no
  * explode of anything wider than the token stream) into a partial+final
  * count aggregation, from which the driver takes ONE row (the argmax
  * pair — constant driver state, like kmeans' k·dims centroids). Merge
  * application is a scan-local typed map; the corpus is never shuffled.
  * Determinism: ties break on (count desc, a asc, b asc), so the merge
  * sequence is a pure function of the corpus.
  */
object Bpe {

  /** Merged tokens join with '+', keeping the merge structure visible in
    * the vocab. NOTE: an input token that already contains '+' could
    * collide with a merged form; callers fitting over such corpora
    * should pre-escape (the whitespace word-salad fixtures can't).
    */
  val Sep = "+"

  /** Adjacent-pair frequencies of a token-array column: one scan-local
    * projection (pairs via `zip_with` of shifted slices) + one
    * partial+final aggregation. The pair table is vocab²-bounded, never
    * corpus-sized.
    */
  def pairCounts(df: DataFrame, toks: Column): DataFrame = {
    val n = size(toks)
    val pairs = zip_with(
      slice(toks, lit(1), greatest(n - 1, lit(0))),
      slice(toks, lit(2), greatest(n - 1, lit(0))),
      (x, y) => struct(x.as("a"), y.as("b")))
    df.select(explode(pairs).as("p"))
      .groupBy(col("p.a").as("a"), col("p.b").as("b"))
      .agg(count(lit(1)).cast(LongType).as("cnt"))
  }

  /** Greedy left-to-right non-overlapping application of one merge:
    * `a a a` under merge (a,a) becomes `[a+a, a]`, never `[a+a, a+a]`.
    */
  def applyMerge(toks: Seq[String], a: String, b: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    val t = toks.toIndexedSeq
    var i = 0
    while (i < t.length) {
      if (i + 1 < t.length && t(i) == a && t(i + 1) == b) {
        out += s"$a$Sep$b"; i += 2
      } else { out += t(i); i += 1 }
    }
    out.result()
  }

  /** All `merges` in order (the BPE apply path for new text). */
  def tokenize(toks: Seq[String], merges: Seq[(String, String)]): Seq[String] =
    merges.foldLeft(toks) { case (cur, (a, b)) => applyMerge(cur, a, b) }

  /** Fit `numMerges` merges over whitespace-split `textCol`. Per round:
    * one corpus aggregation (collapsed to the argmax pair via a 1-row
    * TakeOrdered — count desc, pair asc) and nothing else driver-sized.
    * Rounds re-tokenize from scratch with the merges so far (a
    * scan-local map, the kmeans-style literal re-projection) — no state
    * carried between rounds except the merge list itself.
    */
  def fit(df: DataFrame, textCol: String, numMerges: Int): Seq[(String, String)] = {
    require(numMerges >= 1, s"numMerges must be >= 1, got $numMerges")
    val spark = df.sparkSession
    import spark.implicits._
    // NULL text rows contribute no pairs in pairCounts (split(null) → no
    // row); the typed map must skip them too, not NPE on t.split
    val base = df.select(col(textCol).cast("string")).as[String]
      .filter((t: String) => t != null)
    var merges = Vector.empty[(String, String)]
    var round = 0
    while (round < numMerges) {
      val m = merges // stable local for the closure (no var capture)
      val toksDs = base
        .map(t => tokenize(t.split(' ').toSeq.filter(_.nonEmpty), m))
        .toDF("toks")
      val top = pairCounts(toksDs, col("toks"))
        .orderBy(col("cnt").desc, col("a"), col("b"))
        .limit(1)
        .collect()
      if (top.isEmpty) return merges // no adjacent pairs left anywhere
      merges :+= ((top(0).getString(0), top(0).getString(1)))
      round += 1
    }
    merges
  }
}
