package graft

import graft.core.Tables
import graft.operators.Dedup
import org.apache.spark.sql.functions._

/** q67 stage timing: edge mining vs label-propagation loop. */
object ProbeCC {
  def main(args: Array[String]): Unit = {
    val spark = core.Sessions.local(32, "probe-cc")
    val dir   = args.headOption.getOrElse("/root/testdata/sf0.1")
    val d     = Tables(spark, dir).documents
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"$name%-32s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    spark.range(1000).selectExpr("sum(id)").collect()
    val edges = Dedup.dupEdges(d, "doc_id", "text", threshold = 0.5).cache()
    time("edge mining")(println("  edges: " + edges.count()))
    time("components loop")(
      println("  rows: " + Dedup.connectedComponents(
        d.select(col("doc_id").as("id")), edges, "doc_a", "doc_b").count()))
    spark.stop()
  }
}
