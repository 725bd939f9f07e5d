package graft

import org.apache.spark.sql.{AnalysisException, SparkSession}
import org.apache.spark.sql.functions._

/** The SQL surface of the graft expression library: every registered
  * function must be callable from `spark.sql` and agree exactly with its
  * Column-API form, on both registration paths (builder extensions and
  * post-hoc register), without leaking into unrelated sessions.
  */
class GraftExtensionsSpec extends SparkSpec {
  import spark.implicits._

  private def sqlSession(): SparkSession = {
    val s = spark.newSession()
    GraftExtensions.register(s)
    s
  }

  test("scalar functions: SQL ≡ Column API") {
    val s = sqlSession()
    val d = s.sql(
      "SELECT graft_dot_product(array(1.0d, 2.0d, 3.0d), array(4.0d, 5.0d, 6.0d)) AS d")
      .head().getDouble(0)
    assert(d == 32.0)
    val sh = s.sql("SELECT graft_shingles('a b c d', 3) AS sh")
      .head().getSeq[String](0)
    assert(sh == Seq("a b c", "b c d"))
    val is = s.sql(
      "SELECT graft_intersect_size(array('x', 'y', 'z'), array('y', 'z', 'w')) AS n")
      .head().getInt(0)
    assert(is == 2)
    val cdc = s.sql("SELECT graft_cdc_chunks('hello world', 8, 64) AS ch")
      .selectExpr("ch").head().getSeq[org.apache.spark.sql.Row](0)
    assert(cdc.map(_.getAs[String]("chunk_text")).mkString == "hello world",
      "graft_cdc_chunks must partition the exact char stream")
    val hist = s.sql("SELECT graft_char_hist('abba') AS h")
      .head().getSeq[org.apache.spark.sql.Row](0)
    assert(hist.map(r => r.getString(0) -> r.getLong(1)) ==
      Seq("a" -> 2L, "b" -> 2L))
    val gh = s.sql("SELECT graft_char_gram_hist('abab', 2) AS h")
      .head().getSeq[org.apache.spark.sql.Row](0)
    assert(gh.map(r => r.getString(0) -> r.getLong(1)) ==
      Seq("ab" -> 2L, "ba" -> 1L))
  }

  test("aggregates: SQL results equal the Column-API results per group") {
    val s = sqlSession()
    import s.implicits._
    val docs = Seq(
      (0L, "a b c d e f"), (0L, "g h i"), (1L, "a b c"), (1L, "a b c"))
      .toDF("g", "t")
    docs.createOrReplaceTempView("docs_ext")
    val viaSql = s.sql(
      """SELECT g, graft_kmv_distinct(t, 8) AS kmv, graft_simhash(t) AS sh,
        |       graft_minhash_sigs(t, 4) AS mh
        |FROM docs_ext GROUP BY g""".stripMargin)
      .collect().map(r => r.getLong(0) ->
        (r.getDouble(1), r.getLong(2), r.getSeq[Long](3))).toMap
    val viaApi = docs.groupBy(col("g"))
      .agg(org.apache.spark.sql.graftx.KmvDistinct.kmvDistinct(col("t"), 8).as("kmv"),
           org.apache.spark.sql.graftx.SimhashAgg.simhash64(col("t")).as("sh"),
           org.apache.spark.sql.graftx.MinHashSigs.minhashSigs(col("t"), 4).as("mh"))
      .collect().map(r => r.getLong(0) ->
        (r.getDouble(1), r.getLong(2), r.getSeq[Long](3))).toMap
    assert(viaSql == viaApi)
    val topk = s.sql(
      "SELECT graft_topk_pairs(t, g, 2) AS top FROM docs_ext")
      .head().getSeq[org.apache.spark.sql.Row](0)
    assert(topk.map(_.getString(0)) == Seq("a b c", "a b c"))
  }

  test("builder-extensions path injects the same registry entries") {
    // A session BUILT with the extension (the spark.sql.extensions path)
    // must resolve the functions without any register() call. getOrCreate
    // would return the suite session, so clear actives first and restore.
    spark // force the shared session into existence before clearing
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s = SparkSession.builder()
        .master("local[4]")
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      assert(s ne spark)
      assert(s.sql("SELECT graft_dot_product(array(2.0d), array(3.0d)) AS d")
        .head().getDouble(0) == 6.0)
    } finally {
      SparkSession.setDefaultSession(spark)
      SparkSession.setActiveSession(spark)
    }
  }

  test("registration is session-scoped and literal params are enforced") {
    val fresh = spark.newSession() // never registered
    intercept[AnalysisException] {
      fresh.sql("SELECT graft_dot_product(array(1.0d), array(1.0d))").collect()
    }
    val s = sqlSession()
    val err = intercept[Exception] {
      s.sql("SELECT g, graft_kmv_distinct(t, g + 1) FROM (SELECT 1L AS g, 'x' AS t) GROUP BY g, t")
        .collect()
    }
    assert(err.getMessage.contains("INT literal") ||
      Option(err.getCause).exists(_.getMessage.contains("INT literal")))
  }
}
