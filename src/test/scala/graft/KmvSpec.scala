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

  test("q147 quantile sketch: partition-invariant and close to exact quantiles") {
    // the q147 operator body over a synthetic skewed-but-known frame:
    // mergeability (bottom-k of a union ≡ bottom-k of merged bottom-ks)
    // means ANY partitioning yields the identical sample, and a k=64
    // uniform sample's median should land near the true median
    import org.apache.spark.sql.graftx.{SortableDouble, TopKPairs}
    import org.apache.spark.sql.types.{DoubleType, StringType}
    val df = (0 until 4000).map { i =>
      (i.toLong, "g" + (i % 2), (i % 1000).toDouble)
    }.toDF("event_id", "event_type", "value")
    def sketch(parts: Int) = {
      val keyed = df.repartition(parts)
        .select(col("event_type"),
          concat(md5(concat(lit("qsk|"), col("event_id").cast(StringType))),
                 lit("|"), SortableDouble.sortKeyDesc(col("value"))).as("skey"),
          col("event_id"))
      keyed.groupBy(col("event_type"))
        .agg(TopKPairs.topK(col("skey"), col("event_id"), 64).as("top"))
        .withColumn("vals", sort_array(transform(col("top"),
          x => SortableDouble.decodeDesc(substring(x.getField("key"), 34, 16)))))
        .select(col("event_type"),
          element_at(col("vals"), 33).as("near_median")) // 64-sample midpoint
        .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    }
    val byParts = Seq(1, 3, 8).map(sketch)
    assert(byParts.distinct.size == 1, "partitioning changed the sampled quantiles")
    // true per-group median is ~499.5 (values uniform 0..999); a 64-point
    // uniform sample's midpoint should land within ±150 of it
    byParts.head.values.foreach(m => assert(math.abs(m - 499.5) < 150.0,
      s"sampled median $m implausibly far from 499.5"))
  }

  test("q163 per-source estimates ≡ the graftx KmvDistinct aggregate") {
    // q163 rebuilds each source's KMV estimate from string-keyed minima
    // (bounded TopKPairs heap + hex decode) so union sketches can be
    // merged as arrays; the aggregate computes the same estimate from
    // its TreeSet of 32-bit hashes. If either derivation drifts (hash
    // input, prefix width, estimator arithmetic), they disagree.
    val dir  = "/root/testdata/sf0.001"
    val d    = graft.core.Tables(spark, dir).documents
    val tok  = d.select(col("source"),
      explode(graft.functions.Text.tokens(col("text"))).as("tok"))
    val viaAgg = tok.groupBy(col("source"))
      .agg(KmvDistinct.kmvDistinct(col("tok"), 128).as("est"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val viaQuery = SparkEntry.queries("q163_kmv_overlap")(spark, dir)
      .select(col("source_a").as("source"), col("est_a").as("est"))
      .union(SparkEntry.queries("q163_kmv_overlap")(spark, dir)
        .select(col("source_b"), col("est_b")))
      .distinct().collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(viaQuery.keySet == viaAgg.keySet)
    viaQuery.foreach { case (src, est) =>
      val agg = math.floor(viaAgg(src) * 1e9 + 0.5) / 1e9 // q163 quantizes
      assert(est == agg, s"$src: query=$est aggregate=$agg")
    }
  }
}
