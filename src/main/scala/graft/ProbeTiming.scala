package graft
import graft.core.Tables
import graft.models._
import org.apache.spark.sql.SparkSession
object ProbeTiming {
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
      println(f"$name%-28s ${(System.nanoTime()-t0)/1e9}%8.2f s  rows=$n")
    }
    time("raw_unemployment")(TestdataRaw.rawUnemployment(t).count())
    time("stg_unemployment")(Staging.unemployment(TestdataRaw.rawUnemployment(t)).count())
    val su = Staging.unemployment(TestdataRaw.rawUnemployment(t)).cache()
    val si = Staging.inflation(TestdataRaw.rawInflation(t)).cache()
    val sg = Staging.gdp(TestdataRaw.rawGdp(t)).cache()
    val sp = Staging.population(TestdataRaw.rawPopulation(t)).cache()
    time("stg cache warm")(su.count() + si.count() + sg.count() + sp.count())
    val ia = Intermediate.annualMetrics(sg, sp, su, si)
    time("int_annual")(ia.count())
    val im = Intermediate.monthlyIndicators(su, si, ia)
    time("int_monthly")(im.count())
    val dm = Marts.dimCountry(TestdataRaw.seedCountryMetadata(t), sg, java.sql.Timestamp.valueOf("2002-01-01 00:00:00"))
    val f = Marts.fctEconomicIndicators(im, dm, java.sql.Timestamp.valueOf("2002-01-01 00:00:00"), "x")
    time("fct")(f.count())
    time("fct again")(f.count())
    time("forecast")(graft.analytics.Forecast.forecast(f, java.sql.Timestamp.valueOf("2002-01-01 00:00:00")).count())
    time("anomaly")(graft.analytics.Anomaly.detect(f).count())
    spark.stop()
  }
}
