package graft.operators

import graft.functions.Vectors._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * Baseline: brute-force cosine top-k — broadcast the (small) query set
  * against the corpus scan; one pass, no shuffle of the corpus. Scale
  * path: random-hyperplane LSH buckets the corpus once (shuffle on
  * bucket), then each query only scans its bucket — candidate set shrinks
  * by ~2^bits; recall is tunable via multi-probe/bit count.
  *
  * Hyperplanes are pseudo-random ±1 derived from md5 parity — data
  * independent, reproducible in any engine with md5, so the whole ANN
  * pipeline is oracle-checkable.
  */
object Similarity {

  /** ±1 hyperplane matrix [planes × dims], derived deterministically from
    * md5 hex parity of "p_d". Pure function of (numPlanes, dims).
    */
  def hyperplanes(numPlanes: Int, dims: Int): Seq[Seq[Double]] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    (0 until numPlanes).map { p =>
      (0 until dims).map { d =>
        val hex   = md.digest(s"${p}_$d".getBytes("UTF-8"))
          .map("%02x".format(_)).mkString
        val first = hex.charAt(0)
        if ("02468ace".contains(first)) 1.0 else -1.0
      }
    }
  }

  /** LSH signature: one bit per plane (sign of the dot product), packed as
    * a string bucket key like "1011...". Works on `array<double>` vectors.
    */
  def lshBucket(vec: org.apache.spark.sql.Column, planes: Seq[Seq[Double]]): org.apache.spark.sql.Column = {
    val bits = planes.map { plane =>
      val planeCol = array(plane.map(lit): _*)
      when(dot(vec, planeCol) >= 0, lit("1")).otherwise(lit("0"))
    }
    concat(bits: _*)
  }

  /** Brute-force cosine top-k: for each row of `queries`, the k nearest
    * `corpus` rows by cosine. Norms are precomputed per side (O(n·d)),
    * the join is broadcast(queries) × corpus scan, and top-k is a
    * per-query window. Self-matches excluded by id.
    */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, idCol: String,
                     vecCol: String, k: Int): DataFrame = {
    val q = queries.select(
      col(idCol).as("query_id"),
      col(vecCol).cast("array<double>").as("qv"))
      .withColumn("qn", norm(col("qv")))
    val c = corpus.select(
      col(idCol).as("neighbor_id"),
      col(vecCol).cast("array<double>").as("cv"))
      .withColumn("cn", norm(col("cv")))
    val scored = broadcast(q)
      .crossJoin(c)
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
              cosinePrenormed(dot(col("qv"), col("cv")), col("qn"), col("cn")).as("cosine"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc_nulls_last, col("neighbor_id"))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank").cast("long").as("rank"),
              col("neighbor_id"), col("cosine"))
  }

  /** LSH-bucketed ANN top-k: corpus and queries are bucketed by hyperplane
    * signs; candidates come only from the query's bucket, then exact
    * cosine + window top-k on that reduced set. Lower recall than brute
    * force by construction — this is the 100 TB path where all-pairs is
    * impossible.
    */
  def annTopK(queries: DataFrame, corpus: DataFrame, idCol: String,
              vecCol: String, k: Int, numPlanes: Int, dims: Int): DataFrame = {
    val planes = hyperplanes(numPlanes, dims)
    val q = queries.select(
      col(idCol).as("query_id"), col(vecCol).cast("array<double>").as("qv"))
      .withColumn("qn", norm(col("qv")))
      .withColumn("bucket", lshBucket(col("qv"), planes))
    val c = corpus.select(
      col(idCol).as("neighbor_id"), col(vecCol).cast("array<double>").as("cv"))
      .withColumn("cn", norm(col("cv")))
      .withColumn("bucket", lshBucket(col("cv"), planes))
    val scored = broadcast(q)
      .join(c, Seq("bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
              cosinePrenormed(dot(col("qv"), col("cv")), col("qn"), col("cn")).as("cosine"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc_nulls_last, col("neighbor_id"))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank").cast("long").as("rank"),
              col("neighbor_id"), col("cosine"))
  }
}
