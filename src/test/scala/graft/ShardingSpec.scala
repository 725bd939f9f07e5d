package graft

import graft.operators.Sharding
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Two-pass prefix-sum correctness: identical to the single-task global
  * window for ANY partition count (1, 3, 32, more partitions than rows),
  * which is the property that makes it a safe drop-in at scale.
  */
class ShardingSpec extends SparkSpec {
  import spark.implicits._

  private val rows = (1L to 100L).map(i => (i, (i * 37 % 11) + 1)) // ids 1..100, weights 1..11
  private lazy val df = rows.toDF("id", "w")

  private lazy val expected = {
    val w = Window.orderBy(col("id")).rowsBetween(Window.unboundedPreceding, 0)
    df.withColumn("cum", sum(col("w")).over(w))
      .select("id", "w", "cum")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
  }

  test("runningTotal equals the global window for any partition count") {
    for (parts <- Seq(1, 3, 32, 200)) {
      val got = Sharding.runningTotal(df, "id", "w", "cum", parts)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(got == expected, s"mismatch at parts=$parts")
    }
  }

  test("runningTotal stays correct with exchange reuse disabled") {
    // Bucket boundaries are literal-deterministic, so the fold and the
    // offsets branches agree even when ReuseExchange can't dedupe their
    // shuffles — reuse is a performance optimization, never a
    // correctness dependency.
    spark.conf.set("spark.sql.exchange.reuse", "false")
    try {
      val got = Sharding.runningTotal(df, "id", "w", "cum", 8)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(got == expected)
    } finally spark.conf.set("spark.sql.exchange.reuse", "true")
  }

  test("byBudget assigns a row to the shard its first unit falls into") {
    // weights all 1, budget 10 → ids 1..10 shard 0, 11..20 shard 1, ...
    val ones = (1L to 25L).map(i => (i, 1L)).toDF("id", "w")
    val out = Sharding.byBudget(ones, "id", "w", budget = 10L, parts = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(out(1L) == 0L && out(10L) == 0L && out(11L) == 1L && out(25L) == 2L)
  }

  test("packGreedy: whole-doc bins, capacity respected, layout-invariant, oversized isolated") {
    val docs = Seq(
      (0L, 100L), (2L, 400L), (4L, 50L), (6L, 600L), (8L, 10L),   // stream 0
      (1L, 500L), (3L, 12L), (5L, 512L), (7L, 1L), (9L, 511L))    // stream 1
      .toDF("doc_id", "n")
    def run(df: org.apache.spark.sql.DataFrame) =
      Sharding.packGreedy(df, "doc_id", "n", capacity = 512L, numStreams = 2)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    val got = run(docs)
    // independent sequential reference per stream
    val expect = (0 until 2).flatMap { s =>
      val stream = Seq(0L to 9L: _*).filter(_ % 2 == s)
        .flatMap(id => docs.collect().find(_.getLong(0) == id))
        .map(r => (r.getLong(0), r.getLong(1)))
      var bin = 0L; var fill = -1L
      stream.map { case (id, n) =>
        if (fill < 0 || fill + n > 512L) { bin += 1; fill = n } else fill += n
        (id, s.toLong, bin, n, fill)
      }
    }.toSet
    assert(got.toSet == expect)
    // greedy fold order for stream 0: 100,400 fill bin 1 to 500; 50 would
    // overflow (550 > 512) so it opens bin 2; 600 is oversized and sits
    // alone in bin 3; 10 starts bin 4 — all encoded in `expect`; here pin
    // two anchors:
    assert(got.find(_._1 == 6L).get._3 != got.find(_._1 == 4L).get._3,
      "oversized doc must not share the previous bin")
    assert(got.find(_._1 == 8L).get._3 != got.find(_._1 == 6L).get._3,
      "the doc after an oversized one must start a fresh bin")
    // deterministic under any input layout
    assert(run(docs.repartition(7)).toSet == got.toSet)
    // every doc packed exactly once; no bin over capacity unless singleton
    assert(got.map(_._1).toSet.size == 10)
    val byBin = got.groupBy(t => (t._2, t._3))
    byBin.values.foreach { members =>
      val tot = members.map(_._4).sum
      assert(tot <= 512L || members.size == 1,
        s"multi-doc bin over capacity: $members")
    }
  }
}
