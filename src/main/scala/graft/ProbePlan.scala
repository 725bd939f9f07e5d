package graft

import graft.core.Tables
import graft.operators.Dedup

/** Prints the physical plan of the lazy jaccardCandidates form. */
object ProbePlan {
  def main(args: Array[String]): Unit = {
    val spark = core.Sessions.local(32, "probe-plan")
    val d = Tables(spark, "/root/testdata/sf0.1").documents
    val sh = Dedup.shingled(d, "doc_id", "text", 3)
    val cand = Dedup.jaccardCandidates(sh, 0.5, materialize = false)
    println(cand.queryExecution.executedPlan.toString.take(8000))
    spark.stop()
  }
}
