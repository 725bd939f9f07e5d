package graft

import graft.core.Tables
import graft.operators.Dedup
import org.apache.spark.sql.functions._

/** q36 stage timing: signature aggregate vs band join vs verification. */
object ProbeMinhash {
  def main(args: Array[String]): Unit = {
    val spark = core.Sessions.local(32, "probe-minhash")
    val dir   = args.headOption.getOrElse("/root/testdata/sf0.1")
    val d     = Tables(spark, dir).documents
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"$name%-32s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    spark.range(1000).selectExpr("sum(id)").collect()
    time("warm shingled count")(Dedup.shingled(d, "doc_id", "text").count())
    time("signatures (8x md5 agg)")(
      Dedup.minhashSignatures(d, "doc_id", "text").agg(count(lit(1))).collect())
    time("candidates (bands+join)")(
      Dedup.minhashCandidates(d, "doc_id", "text").count())
    val cand = Dedup.minhashCandidates(d, "doc_id", "text")
    time("verify (shingles x2 + intersect)")(
      Dedup.verifyPairs(cand, Dedup.shingled(d, "doc_id", "text"), 0.0).count())
    spark.stop()
  }
}
