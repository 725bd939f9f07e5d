package graft
import org.apache.spark.sql.SparkSession
/** Simulates the driver's smoke: a plain session (no graft-specific confs)
  * calling SparkEntry.entry — must return rows > 0.
  */
object EntrySmoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val n = SparkEntry.entry(spark).count()
    println(s"[smoke] entry rows=$n")
    require(n > 0)
    spark.stop()
  }
}
