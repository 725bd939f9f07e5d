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
    val sh = Dedup.shingled(d, "doc_id", "text").cache()
    time("shingled")(sh.count())
    val exactEdges = Dedup.exact(d, "doc_id", "text")
      .filter(col("is_duplicate"))
      .select(col("canonical_id").as("doc_a"), col("doc_id").as("doc_b"))
    val jacEdges = Dedup.verifyPairs(Dedup.jaccardCandidates(sh, 0.5), sh, 0.5)
      .select(col("doc_a"), col("doc_b"))
    val edges = exactEdges.union(jacEdges).cache()
    time("edge mining")(println("  edges: " + edges.count()))
    time("components loop")(
      println("  rows: " + Dedup.connectedComponents(
        d.select(col("doc_id").as("id")), edges, "doc_a", "doc_b").count()))
    spark.stop()
  }
}
