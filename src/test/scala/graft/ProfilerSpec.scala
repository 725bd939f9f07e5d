package graft

import graft.quality.Profiler

/** One-pass profiler semantics: exact per-column stats in one scan,
  * typed ranges, fail-fast on unknown columns.
  */
class ProfilerSpec extends SparkSpec {
  import spark.implicits._

  private def fixture = Seq(
    (1L, Some(2.5), "b"),
    (2L, None, "a"),
    (3L, Some(7.0), "a"),
    (3L, Some(2.5), null)).toDF("id", "v", "s")

  test("profiles numeric and string columns with exact stats") {
    val out = Profiler.profile(fixture, Seq("id", "v", "s"))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out.keySet == Set("id", "v", "s"))
    val id = out("id")
    assert(id.getLong(1) == 4 && id.getLong(2) == 0 && id.getLong(3) == 3)
    assert(id.getDouble(4) == 1.0 && id.getDouble(5) == 3.0)
    assert(id.isNullAt(6) && id.isNullAt(7)) // numeric → no string range
    val v = out("v")
    assert(v.getLong(2) == 1 && v.getLong(3) == 2) // one null, {2.5, 7.0}
    val s = out("s")
    assert(s.getLong(2) == 1 && s.getLong(3) == 2)
    assert(s.getString(6) == "a" && s.getString(7) == "b")
    assert(s.isNullAt(4) && s.isNullAt(5)) // string → no numeric range
  }

  test("unknown columns and empty requests fail fast") {
    intercept[IllegalArgumentException](Profiler.profile(fixture, Seq("nope")))
    intercept[IllegalArgumentException](Profiler.profile(fixture, Seq.empty))
  }

  test("approxDistinct rejects raw double/float columns (engine-unportable strings)") {
    import spark.implicits._
    val df = Seq((1L, 0.5), (2L, 1.5)).toDF("k", "x")
    // exact mode is fine; the KMV mode must refuse — its estimate hashes
    // cast(x as string) whose formatting is engine-specific
    graft.quality.Profiler.profile(df, Seq("x")).collect()
    val ex = intercept[IllegalArgumentException] {
      graft.quality.Profiler.profile(df, Seq("x"), approxDistinct = true)
    }
    assert(ex.getMessage.contains("decimal"))
  }

  test("one scan: the profile plan reads the input once") {
    val df = Profiler.profile(fixture, Seq("id", "v", "s"))
    df.collect()
    // a LocalTableScan per profiled column would betray a per-column
    // pass; the adaptive plan prints "== Final Plan ==" then "== Initial
    // Plan ==" — only the final section reflects what ran
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    val scans = plan.split("LocalTableScan").length - 1
    assert(scans <= 1, s"profile scans the input more than once:\n$plan")
  }
}
