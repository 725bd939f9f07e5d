package graft

import graft.core.Tables
import graft.operators.Dedup
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

/** Sub-stage timing inside jaccardCandidates: ranked-prefix build vs
  * candidate self-join vs distinct, to locate the q35/q67 mining cost.
  */
object ProbeCand {
  def main(args: Array[String]): Unit = {
    val spark = core.Sessions.local(32, "probe-cand")
    val dir   = args.headOption.getOrElse("/root/testdata/sf0.1")
    val d     = Tables(spark, dir).documents
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"$name%-32s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    spark.range(1000).selectExpr("sum(id)").collect()
    val threshold = 0.5
    val sh = Dedup.shingled(d, "doc_id", "text", 3).cache()
    time("shingled")(sh.count())

    val ex = sh.select(col("doc_id"), explode(col("shingles")).as("shingle"))
    val dfreq = ex.groupBy(col("shingle")).agg(count(lit(1)).as("df_count"))
    val nS = col("n_shingles")
    val (probeLen, indexLen) = (
      (nS - ceil(lit(threshold) * nS - 1e-9) + 1).cast(LongType),
      (nS + 1 - ceil(lit(2 * threshold / (1 + threshold)) * nS - 1e-9)).cast(LongType))
    val wDoc = Window.partitionBy(col("doc_id")).orderBy(col("df_count"), col("shingle"))
    val joined = time("build ex-join-dfreq plan") {
      ex.join(dfreq, Seq("shingle")).withColumn("rn", row_number().over(wDoc))
    }
    time("ex join dfreq + window count")(joined.count())
    val ranked = joined
      .join(sh.select(col("doc_id"), col("n_shingles"),
                      probeLen.as("probe_len"), indexLen.as("index_len")), Seq("doc_id"))
      .select(col("doc_id"), col("n_shingles"), col("rn"),
              col("probe_len"), col("index_len"),
              xxhash64(col("shingle")).as("shingle_h")).cache()
    time("ranked (with sh join) count")(ranked.count())

    val probe = ranked.filter(col("rn") <= col("probe_len"))
      .select(col("doc_id").as("doc_b"), col("n_shingles").as("size_b"),
              col("rn").as("rn_b"), col("shingle_h"))
    val index = ranked.filter(col("rn") <= col("index_len"))
      .select(col("doc_id").as("doc_a"), col("n_shingles").as("size_a"),
              col("rn").as("rn_a"), col("shingle_h"))
    val alpha = ceil(lit(threshold / (1 + threshold)) *
      (col("size_a") + col("size_b")) - 1e-9)
    val cand = probe.join(index, Seq("shingle_h"))
      .filter((col("size_a") < col("size_b")) ||
              (col("size_a") === col("size_b") && col("doc_a") < col("doc_b")))
      .filter(col("size_a").cast(DoubleType) >= lit(threshold) * col("size_b").cast(DoubleType) - 1e-9)
      .filter(lit(1) + least(col("size_a") - col("rn_a"), col("size_b") - col("rn_b")) >= alpha)
      .select(least(col("doc_a"), col("doc_b")).as("doc_a"),
              greatest(col("doc_a"), col("doc_b")).as("doc_b"))
    time("self-join (no distinct)")(cand.count())
    time("self-join + distinct")(cand.distinct().count())
    time("self-join + distinct warm")(cand.distinct().count())
    spark.stop()
  }
}
