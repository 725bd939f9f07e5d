package graft

import graft.core.Tables
import graft.operators.Dedup
import org.apache.spark.sql.functions._

/** Timing breakdown of the q41 simhash pipeline at sf0.1 — which stage
  * (shingle explode + md5, bit sums, banding join, verification) owns the
  * wall clock.
  */
object ProbeSimhash {
  def main(args: Array[String]): Unit = {
    val spark = core.Sessions.local(32, "probe-simhash")
    val dir   = args.headOption.getOrElse("/root/testdata/sf0.1")
    val d     = Tables(spark, dir).documents
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"$name%-32s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    spark.range(1000).selectExpr("sum(id)").collect() // warm
    time("docs count")(d.count())
    val ex = d.select(col("doc_id"),
      explode(graft.functions.Text.shingles(col("text"), 3)).as("token"))
    time("shingle explode count")(ex.count())
    time("explode + md5")(ex.withColumn("h", md5(col("token")))
      .agg(count(col("h"))).collect())
    val sh = time("simhash build")(Dedup.simhash(d, "doc_id", "text").cache())
    time("simhash materialize")(sh.count())
    time("full simhashPairs")(Dedup.simhashPairs(d, "doc_id", "text").count())
    spark.stop()
  }
}
