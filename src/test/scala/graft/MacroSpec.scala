package graft

import graft.functions.Macros
import org.apache.spark.sql.functions._

/** Macro ports vs the reference semantics (`macros/calculations.sql`). */
class MacroSpec extends SparkSpec {
  import spark.implicits._

  test("surrogateKey is md5 of '||'-joined null-coalesced strings") {
    val df = Seq(("DE", "2023"), (null, "2023")).toDF("geo", "time")
      .select(Macros.surrogateKey(col("geo"), col("time")).as("k"))
    val got = df.collect().map(_.getString(0))
    def md5hex(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(got(0) == md5hex("DE||2023"))
    assert(got(1) == md5hex("||2023")) // null → empty string, separator kept
  }

  test("safeDivide defaults to 0; nullSafeDivide to null (both kept distinct)") {
    val df = Seq((10.0, 2.0), (10.0, 0.0)).toDF("n", "d")
      .select(Macros.safeDivide(col("n"), col("d")).as("s"),
              Macros.nullSafeDivide(col("n"), col("d")).as("ns"))
    val rows = df.collect()
    assert(rows(0).getDouble(0) == 5.0 && rows(0).getDouble(1) == 5.0)
    assert(rows(1).getDouble(0) == 0.0 && rows(1).isNullAt(1))
  }

  test("yoyChange: (cur - prev)/prev*100, null on first/zero prev") {
    val df = Seq(("DE", 2020, 100.0), ("DE", 2021, 110.0), ("DE", 2022, 0.0), ("DE", 2023, 5.0))
      .toDF("c", "y", "v")
      .select(col("y"), Macros.yoyChange(col("v"), col("c"), col("y")).as("yoy"))
      .orderBy("y")
    val rows = df.collect()
    assert(rows(0).isNullAt(1))                       // no prior year
    assert(approx(rows(1).getDouble(1), 10.0))        // (110-100)/100*100
    assert(approx(rows(2).getDouble(1), -100.0))      // (0-110)/110*100
    assert(rows(3).isNullAt(1))                       // prev == 0 → null
  }

  test("rollingAvg uses partial trailing windows (reference unit-test values)") {
    val df = Seq(("FR", 1, 7.0), ("FR", 2, 7.2), ("FR", 3, 7.1)).toDF("c", "m", "v")
      .select(col("m"), Macros.rollingAvg(col("v"), col("c"), col("m"), 12).as("avg"))
      .orderBy("m")
    val got = df.collect().map(_.getDouble(1))
    assert(approx(got(0), 7.0) && approx(got(1), 7.1) && approx(got(2), 7.1))
  }

  test("rankWithinGroup orders nulls last in both directions (DuckDB parity)") {
    val df = Seq(("A", 2020, Some(3.0)), ("B", 2020, None), ("C", 2020, Some(1.0)))
      .toDF("c", "y", "v")
      .select(col("c"),
        Macros.rankWithinGroup(col("v"), col("y"), ascending = true).as("asc_rank"),
        Macros.rankWithinGroup(col("v"), col("y"), ascending = false).as("desc_rank"))
    val byC = df.collect().map(r => r.getString(0) -> (r.getInt(1), r.getInt(2))).toMap
    assert(byC("C") == ((1, 2)))
    assert(byC("A") == ((2, 1)))
    assert(byC("B") == ((3, 3))) // null last in BOTH orders
  }
}
