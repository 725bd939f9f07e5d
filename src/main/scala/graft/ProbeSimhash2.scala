package graft

import graft.core.Tables
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Which part of the simhash build is hot: shingling, md5, the 16
  * substring/ascii digit extractions, or the 17-buffer hash aggregation.
  */
object ProbeSimhash2 {
  def main(args: Array[String]): Unit = {
    val spark = core.Sessions.local(32, "probe-simhash2")
    val dir   = args.headOption.getOrElse("/root/testdata/sf0.1")
    val d     = Tables(spark, dir).documents
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"$name%-36s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    spark.range(1000).selectExpr("sum(id)").collect()
    val ex = d.select(col("doc_id"),
      explode(graft.functions.Text.shingles(col("text"), 3)).as("token"))
      .withColumn("hex", md5(col("token")))
    time("A explode+md5, count only")(ex.agg(count(col("hex"))).collect())
    val digitVals = (0 until 16).map { dg =>
      val a = ascii(substring(col("hex"), dg + 1, 1))
      when(a <= 57, a - 48).otherwise(a - 87).as(s"v_$dg")
    }
    val withVals = ex.select(col("doc_id") +: digitVals: _*)
    time("B + 16 substring/ascii digits, sum")(
      withVals.agg((0 until 16).map(i => sum(col(s"v_$i"))).head,
        (1 until 16).map(i => sum(col(s"v_$i"))): _*).collect())
    val convVals = ex.select(col("doc_id"),
      conv(substring(col("hex"), 1, 8), 16, 10).cast(LongType).as("hi"),
      conv(substring(col("hex"), 9, 8), 16, 10).cast(LongType).as("lo"))
    time("C + 2 conv halves, sum")(
      convVals.agg(sum(col("hi")), sum(col("lo"))).collect())
    time("D groupBy doc 17-buffer agg (digits)")(
      withVals.groupBy(col("doc_id"))
        .agg(count(lit(1)), (0 until 16).map(i => sum(col(s"v_$i"))): _*)
        .agg(count(lit(1))).collect())
    spark.stop()
  }
}
