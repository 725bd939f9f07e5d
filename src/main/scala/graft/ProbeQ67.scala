object ProbeQ67 {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.Sessions.local(32, "probe67")
    val d = graft.core.Tables(spark, "/root/testdata/sf0.1").documents
    spark.range(1000).selectExpr("sum(id)").collect()
    def t[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"PROBE $tag ${(System.nanoTime()-t0)/1e9}%.2f s"); r
    }
    val edges = t("dupEdges") { graft.operators.Dedup.dupEdges(d, "doc_id", "text", 0.5) }
    t("edges.count") { edges.count() }
    val comp = t("cc") { graft.operators.Dedup.connectedComponents(
      d.select(org.apache.spark.sql.functions.col("doc_id").as("id")), edges, "doc_a", "doc_b") }
    t("comp.count") { comp.count() }
    spark.stop()
  }
}
