package graft

import graft.core.Guard
import graft.operators.{Bpe, Clustering, Pq, Similarity}
import org.apache.spark.sql.functions._

/** Negative tests for the driver-collect runtime guards: every boundary
  * that pulls state to the driver must REFUSE a misconfigured bound with
  * the documented cap in the message, not OOM minutes later. One test
  * per guard site (round-15 verdict item 5).
  */
class GuardSpec extends SparkSpec {
  import spark.implicits._

  private def vecs = (0L until 20L)
    .map(i => (i, Array.tabulate(4)(j => math.sin(i * 4 + j))))
    .toDF("vec_id", "v")

  test("boundedCollect refuses a frame past its bound, cheaply (limit rides the plan)") {
    val ex = intercept[IllegalArgumentException] {
      Guard.boundedCollect(spark.range(10).toDF("id"), 5L, "test frame",
        "shrink the input")
    }
    assert(ex.getMessage.contains("documented bound of 5"))
    assert(ex.getMessage.contains("shrink the input"))
    // under the bound: all rows come back untruncated
    assert(Guard.boundedCollect(spark.range(5).toDF("id"), 5L, "t", "f").length == 5)
  }

  test("boundedArg refuses past the cap and names it") {
    val ex = intercept[IllegalArgumentException] {
      Guard.boundedArg(100L, 10L, "test arg", "because driver state")
    }
    assert(ex.getMessage.contains("cap of 10"))
    Guard.boundedArg(10L, 10L, "t", "f") // at the cap: fine
  }

  test("ivfCentroids refuses nlist past MaxNlist before any job runs") {
    val ex = intercept[IllegalArgumentException] {
      Similarity.ivfCentroids(vecs.withColumnRenamed("v", "v0")
        .select(col("vec_id"), col("v0").as("v")), Similarity.MaxNlist + 1)
    }
    assert(ex.getMessage.contains("ivf nlist"))
  }

  test("kmeans refuses k past MaxCentroids before any job runs") {
    val ex = intercept[IllegalArgumentException] {
      Clustering.fitCentroids(vecs, "vec_id", "v",
        Clustering.MaxCentroids + 1, 1)
    }
    assert(ex.getMessage.contains("kmeans k"))
  }

  test("PQ codebook fit refuses m·k past MaxCodebookEntries before any job runs") {
    val ex = intercept[IllegalArgumentException] {
      Pq.fitCodebooks(vecs, "vec_id", "v",
        m = 2, subDim = 2, k = (Pq.MaxCodebookEntries / 2 + 1).toInt, iters = 1)
    }
    assert(ex.getMessage.contains("PQ codebook state"))
  }

  test("BPE delta fit refuses maxBatch past MaxArgmaxBatch before any job runs") {
    val df = Seq("a b c").toDF("text")
    val ex = intercept[IllegalArgumentException] {
      Bpe.fitDeltaBatched(df, "text", numMerges = 1,
        maxBatch = Bpe.MaxArgmaxBatch + 1)
    }
    assert(ex.getMessage.contains("BPE maxBatch"))
  }
}
