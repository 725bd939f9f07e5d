package graft

import graft.core.Tables
import graft.operators.Similarity
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Where does q64's wall time go at sf0.1 (2000 × 64-dim vectors — i.e.
  * almost all fixed overhead)? Stage-by-stage timings backing the PERF.md
  * entry; run twice in-process to split JIT/codegen constants from
  * steady-state cost.
  */
object ProbeIvf {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val t = Tables(spark, "/root/testdata/sf0.1")
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"$name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
    }
    for (round <- 1 to 2) {
      println(s"-- round $round")
      val e = t.embeddings
      time("corpus scan")(e.count())
      time("full q64")(Similarity.annTopKIvf(
        e.filter(col("vec_id") < 50), e, "vec_id", "embedding",
        k = 3, nlist = 16, nprobe = 4).count())
    }
    spark.stop()
  }
}
