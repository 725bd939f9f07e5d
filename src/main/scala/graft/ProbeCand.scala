package graft

import graft.core.Tables
import graft.operators.Dedup
import org.apache.spark.sql.functions._

/** Sub-stage timing inside the SHIPPED jaccardCandidates plan (lazy form,
  * so stages compose exactly as Dedup builds them): shingling, the fused
  * rank+doc-length window pass, candidate self-join, distinct.
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
    val sh = Dedup.shingled(d, "doc_id", "text", 3).cache()
    time("shingled")(sh.count())
    val ex = sh.select(col("doc_id"), explode(col("shingles")).as("shingle"))
    time("explode count")(ex.count())
    time("dfreq groupBy")(
      ex.groupBy(col("shingle")).agg(count(lit(1))).agg(count(lit(1))).collect())
    // the shipped composition, unmaterialized — each stage's marginal cost
    val cand = Dedup.jaccardCandidates(sh, 0.5, materialize = false)
    time("candidates (shipped plan)")(println("  candidates: " + cand.count()))
    time("candidates again (warm)")(cand.count())
    time("full jaccardPairs")(Dedup.jaccardPairs(d, "doc_id", "text", 0.5).count())
    spark.stop()
  }
}
