package graft

import graft.semantic.Metrics

/** Saved-query API over the metric registry (the reference's `mf query`
  * consumption path) — resolution, hidden dependencies, dimension
  * mapping, and the fail-fast negative paths q105 can't gate.
  */
class MetricsSpec extends SparkSpec {
  import spark.implicits._

  private def fixture = Seq(
    ("DE", 2020, java.sql.Date.valueOf("2020-01-01"), 5.0, 100.0, 80.0),
    ("DE", 2020, java.sql.Date.valueOf("2020-02-01"), 6.0, 100.0, 80.0),
    ("DE", 2021, java.sql.Date.valueOf("2021-01-01"), 7.0, 110.0, 81.0),
    ("FR", 2020, java.sql.Date.valueOf("2020-01-01"), 8.0, 200.0, 60.0),
    ("FR", 2021, java.sql.Date.valueOf("2021-01-01"), 9.0, 150.0, 61.0))
    .toDF("country_code", "reference_year", "reference_date",
          "unemployment_rate_pct", "annual_gdp_million_eur",
          "annual_population_count")

  test("query resolves registry metrics over grouped dims, where applied pre-agg") {
    val out = Metrics.query(fixture,
      metrics = Seq("unemployment_rate", "gdp_growth"),
      groupBy = Seq("country_code", "metric_time__year"),
      where = Some("country_code = 'DE'"))
      .orderBy("country_code", "reference_year")
      .collect()
    assert(out.length == 2) // FR filtered out BEFORE aggregation
    assert(out(0).getDouble(2) == 5.5) // mean(5, 6), exact decimal
    assert(out(0).isNullAt(3))         // first year has no previous
    assert(out(1).getDouble(3) == 10.0) // (110 - 100) / 100 * 100
  }

  test("derived metric pulls hidden inputs; output carries only requested columns") {
    val out = Metrics.query(fixture,
      metrics = Seq("gdp_per_capita_derived"),
      groupBy = Seq("country_code", "metric_time__year"))
      .orderBy("country_code", "reference_year")
    assert(out.columns.toSeq ==
      Seq("country_code", "reference_year", "gdp_per_capita_derived"))
    val de2020 = out.collect()(0)
    // total_gdp 200 (two monthly rows), population 160 → 200e6 / 160
    assert(de2020.getDouble(2) == 200000000.0 / 160.0)
  }

  test("unknown metric names fail fast, listing the registry") {
    val e = intercept[IllegalArgumentException] {
      Metrics.query(fixture, Seq("unemployment_rate", "nope"), Seq("country_code"))
    }
    assert(e.getMessage.contains("nope"))
    assert(e.getMessage.contains("unemployment_rate")) // registry listed
  }

  test("window metrics demand exactly one time dimension in groupBy") {
    val e = intercept[IllegalArgumentException] {
      Metrics.query(fixture, Seq("gdp_growth"), Seq("country_code"))
    }
    assert(e.getMessage.contains("time dimension"))
  }

  test("duplicate metric requests fail fast (would alias-collide in the agg)") {
    intercept[IllegalArgumentException] {
      Metrics.query(fixture, Seq("unemployment_rate", "unemployment_rate"),
        Seq("country_code"))
    }
  }
}
