package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftx.KmvDistinct

/** KMV distinct-count sketch semantics: exact below k, sane estimates
  * above, and partition-invariant merges (the property that makes it a
  * valid partial aggregate).
  */
class KmvSpec extends SparkSpec {
  import spark.implicits._

  test("below k the sketch is the exact distinct count") {
    val df = (1 to 40).map(i => s"v$i").toDF("v") // 40 distinct < k=64
    val est = df.agg(KmvDistinct.kmvDistinct(col("v"), 64)).head.getDouble(0)
    assert(est == 40.0)
    // duplicates don't inflate it
    val dup = ((1 to 40) ++ (1 to 40)).map(i => s"v$i").toDF("v")
    assert(dup.agg(KmvDistinct.kmvDistinct(col("v"), 64)).head.getDouble(0) == 40.0)
  }

  test("above k the estimate lands near the true cardinality") {
    val n  = 5000
    val df = (1 to n).map(i => s"item-$i").toDF("v")
    val est = df.agg(KmvDistinct.kmvDistinct(col("v"), 64)).head.getDouble(0)
    // KMV relative error ~ 1/sqrt(k-2) ≈ 13%; allow 3 sigma
    assert(math.abs(est - n) / n < 0.4, s"estimate $est too far from $n")
  }

  test("the estimate is partition-invariant (merge is order-independent)") {
    val df = (1 to 3000).map(i => s"x$i").toDF("v")
    val byParts = Seq(1, 7, 32).map { p =>
      df.repartition(p).agg(KmvDistinct.kmvDistinct(col("v"), 64)).head.getDouble(0)
    }
    assert(byParts.distinct.size == 1, s"partitioning changed the estimate: $byParts")
  }
}
