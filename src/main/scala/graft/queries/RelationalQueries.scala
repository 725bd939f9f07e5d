package graft.queries

import graft.core.Tables
import graft.functions.Exact._
import graft.functions.Macros._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Relational operator inventory (SURVEY §2.1-2.4, §2.6-2.8) expressed over
  * the driver's TPC-H-ish testdata, one named query per operator family,
  * each with a DuckDB oracle in [[oracles]].
  *
  * Determinism conventions (required for oracle hash-matching, and the same
  * discipline a 100 TB run needs for reproducible results):
  *   - multi-row double reductions use exact decimal sums ([[graft.functions.Exact]]);
  *   - derived integers are LongType on both sides;
  *   - every window order has a unique tiebreaker column.
  */
object RelationalQueries {

  type Q = (SparkSession, String) => DataFrame

  val defs: Map[String, Q] = Map(
    // A-family: grouped aggregation with exact sums/avgs (TPC-H Q1 shape;
    // reference analog: monthly→annual rollups, int_country_annual_metrics.sql:37-59).
    // Multi-way star join: fact ⋈ part ⋈ supplier ⋈ nation, all three
    // dims broadcast (fact side never shuffles for the joins — only the
    // final group-by exchanges). Exercises the part/supplier tables and
    // the canonical revenue-by-two-dimensions shape.
    "q74_part_margin" -> { (s, dir) =>
      val t   = Tables(s, dir)
      val one = lit(1).cast(DecimalType(18, 2))
      t.lineitem
        .join(broadcast(t.part.select(col("p_partkey"), col("p_brand"))),
              col("l_partkey") === col("p_partkey"))
        .join(broadcast(t.supplier.select(col("s_suppkey"), col("s_nationkey"))),
              col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(t.nation.select(col("n_nationkey"), col("n_name"))),
              col("s_nationkey") === col("n_nationkey"))
        .groupBy(col("p_brand"), col("n_name"))
        .agg(
          sum(dec(col("l_extendedprice")) * (one - dec(col("l_discount"))))
            .cast(DoubleType).as("revenue"),
          sumExact(col("l_quantity")).as("sum_qty"),
          countDistinct(col("l_suppkey")).as("n_suppliers"),
          count(lit(1)).as("n_lineitems"))
    },

    "q01_pricing_summary" -> { (s, dir) =>
      val l   = Tables(s, dir).lineitem
      val one = lit(1).cast(DecimalType(18, 2))
      l.filter(col("l_shipdate") <= lit("2001-09-02").cast(TimestampType))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sumExact(col("l_quantity")).as("sum_qty"),
          sumExact(col("l_extendedprice")).as("sum_base_price"),
          sum(dec(col("l_extendedprice")) * (one - dec(col("l_discount"))))
            .cast(DoubleType).as("sum_disc_price"),
          sum(dec(col("l_extendedprice")) * (one - dec(col("l_discount"))) * (one + dec(col("l_tax"))))
            .cast(DoubleType).as("sum_charge"),
          avgExact(col("l_quantity")).as("avg_qty"),
          avgExact(col("l_extendedprice")).as("avg_price"),
          avgExact(col("l_discount")).as("avg_disc"),
          count(lit(1)).as("count_order"))
    },

    // P1/P2/P3/F4/F5: staging-style rename projection + validity filters +
    // period parsing (stg_eurostat__unemployment.sql:22-62 shape).
    "q02_stage_rename" -> { (s, dir) =>
      val e = Tables(s, dir).events
      e.filter(col("value").isNotNull && col("user_id").isNotNull)
        .withColumn("period_code", date_format(col("ts"), "yyyy-MM"))
        .filter(length(col("period_code")) >= 7)
        .select(
          col("event_id"),
          col("user_id").as("entity_code"),
          col("event_type").as("indicator_code"),
          substring(col("period_code"), 1, 4).cast(LongType).as("reference_year"),
          substring(col("period_code"), 6, 2).cast(LongType).as("reference_month"),
          make_date(
            substring(col("period_code"), 1, 4).cast(IntegerType),
            substring(col("period_code"), 6, 2).cast(IntegerType),
            lit(1)).cast(StringType).as("reference_date"),
          col("value").as("indicator_value"))
    },

    // F1: md5 surrogate keys, byte-identical to the reference macro
    // (macros/calculations.sql:1-13).
    "q03_surrogate_key" -> { (s, dir) =>
      val l = Tables(s, dir).lineitem
      l.select(
        col("l_orderkey"),
        col("l_linenumber").cast(LongType).as("l_linenumber"),
        surrogateKey(col("l_orderkey"), col("l_linenumber")).as("line_key"),
        surrogateKey(col("l_returnflag"), col("l_shipdate").cast(DateType), col("l_suppkey"))
          .as("attr_key"))
    },

    // J1-J3 + A + F7: annual-metrics pipeline slice — fact agg joined to a
    // population-style dim with null-safe per-capita divide
    // (int_country_annual_metrics.sql:75-108 shape).
    "q04_annual_metrics" -> { (s, dir) =>
      val t = Tables(s, dir)
      val gdp = t.orders
        .join(t.customer, col("o_custkey") === col("c_custkey"), "left")
        .groupBy(col("c_nationkey").cast(LongType).as("nation_key"),
                 year(col("o_orderdate")).cast(LongType).as("reference_year"))
        .agg(sumExact(col("o_totalprice")).as("gdp_value"),
             count(lit(1)).as("order_count"))
      val pop = t.customer
        .groupBy(col("c_nationkey").cast(LongType).as("nation_key"))
        .agg(count(lit(1)).as("population"))
      gdp
        .join(broadcast(pop), Seq("nation_key"), "left")
        .select(
          col("nation_key"), col("reference_year"), col("gdp_value"),
          col("order_count"), col("population"),
          nullSafeDivide(col("gdp_value"), col("population").cast(DoubleType))
            .cast(DoubleType).as("gdp_per_capita"),
          safeDivide(col("gdp_value"), col("population").cast(DoubleType))
            .cast(DoubleType).as("gdp_per_capita_defaulted"))
    },

    // W4: rank within year, asc + desc, nulls-last to match DuckDB
    // (rpt_annual_economic_summary.sql:44-47, macros/calculations.sql:72-88).
    "q07_rank_within_year" -> { (s, dir) =>
      val t = Tables(s, dir)
      val rev = t.orders
        .groupBy(col("o_custkey"),
                 year(col("o_orderdate")).cast(LongType).as("reference_year"))
        .agg(sumExact(col("o_totalprice")).as("revenue"))
      rev.select(
        col("o_custkey"), col("reference_year"), col("revenue"),
        rankWithinGroup(col("revenue"), col("reference_year"), ascending = false)
          .cast(LongType).as("revenue_rank_desc"),
        rankWithinGroup(col("revenue"), col("reference_year"), ascending = true)
          .cast(LongType).as("revenue_rank_asc"))
    },

    // A7: DISTINCT projection — activity spine
    // (int_country_monthly_indicators.sql:52-61 shape).
    "q09_distinct_spine" -> { (s, dir) =>
      Tables(s, dir).events
        .select(col("user_id"),
                to_date(date_trunc("DAY", col("ts"))).cast(StringType).as("activity_date"))
        .distinct()
    },

    // P5/S7: incremental high-watermark — rows strictly past max(ts) of the
    // already-materialized slice (fct_economic_indicators.sql:28-31).
    "q10_incremental_watermark" -> { (s, dir) =>
      val e = Tables(s, dir).events
      val cutoff = lit("2024-01-25 00:00:00").cast(TimestampType)
      val wm = e.filter(col("ts") < cutoff).agg(max(col("ts")).as("wm"))
      e.crossJoin(broadcast(wm))
        .filter(col("ts") > col("wm"))
        .select(col("event_id"), col("user_id"), col("ts"), col("value"))
    },

    // J10/P4/P6/F9: aggregate-consistency check — member sums vs reported
    // totals within 5% (tests/assert_eu_aggregate_consistency.sql).
    "q11_aggregate_consistency" -> { (s, dir) =>
      val t = Tables(s, dir)
      val enriched = t.orders
        .join(t.customer, col("o_custkey") === col("c_custkey"))
        .join(broadcast(t.nation), col("c_nationkey") === col("n_nationkey"))
      val reported = enriched
        .groupBy(col("n_regionkey").cast(LongType).as("region_key"),
                 year(col("o_orderdate")).cast(LongType).as("reference_year"))
        .agg(sumExact(col("o_totalprice")).as("reported_total"))
      val members = enriched
        .groupBy(col("n_regionkey").cast(LongType).as("region_key"),
                 col("n_nationkey").cast(LongType).as("nation_key"),
                 year(col("o_orderdate")).cast(LongType).as("reference_year"))
        .agg(sumExact(col("o_totalprice")).as("nation_total"))
        .groupBy(col("region_key"), col("reference_year"))
        .agg(sumExact(col("nation_total")).as("member_total"))
      members
        .join(reported, Seq("region_key", "reference_year"), "inner")
        .select(
          col("region_key"), col("reference_year"),
          col("member_total"), col("reported_total"),
          (abs(col("member_total") - col("reported_total")) / col("reported_total"))
            .as("pct_diff"),
          (abs(col("member_total") - col("reported_total")) / col("reported_total") <= 0.05)
            .as("is_consistent"))
    },

    // S3/J8/A3/F6/F7: dimension build — seed-style nation table enriched
    // with region + data-availability aggregates (dim_country.sql shape).
    "q12_dim_nation" -> { (s, dir) =>
      val t = Tables(s, dir)
      val avail = t.orders
        .join(t.customer, col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_nationkey").cast(LongType).as("nation_key"))
        .agg(
          min(year(col("o_orderdate"))).cast(LongType).as("first_year"),
          max(year(col("o_orderdate"))).cast(LongType).as("last_year"),
          countDistinct(year(col("o_orderdate"))).as("years_with_data"))
      t.nation
        .join(broadcast(t.region), col("n_regionkey") === col("r_regionkey"), "left")
        .join(avail, col("n_nationkey").cast(LongType) === avail("nation_key"), "left")
        .select(
          col("n_nationkey").cast(LongType).as("nation_key2"),
          col("n_name").as("nation_name"),
          coalesce(col("r_name"), lit("UNKNOWN")).as("region_name"),
          col("first_year"), col("last_year"),
          coalesce(col("years_with_data"), lit(0L)).as("years_with_data"),
          when(coalesce(col("years_with_data"), lit(0L)) >= 7, "complete")
            .when(coalesce(col("years_with_data"), lit(0L)) >= 4, "partial")
            .otherwise("sparse").as("coverage_status"))
        .withColumnRenamed("nation_key2", "nation_key")
    },

    // S8: SCD2 change classification — full-outer join of two snapshot
    // versions, derive insert/update/close/keep (snapshots/snap_gdp_history.sql).
    "q15_scd2_changes" -> { (s, dir) =>
      val o   = Tables(s, dir).orders
      val f11 = lit(1.1).cast(DecimalType(3, 1))
      val vOld = o.filter(col("o_orderkey") % 10 =!= 0)
        .select(col("o_orderkey").as("key_old"), dec(col("o_totalprice")).as("price_old"))
      val vNew = o.filter(col("o_orderkey") % 11 =!= 0)
        .select(
          col("o_orderkey").as("key_new"),
          when(col("o_orderkey") % 7 === 0, dec(col("o_totalprice")) * f11)
            .otherwise(dec(col("o_totalprice")) * lit(1.0).cast(DecimalType(3, 1)))
            .as("price_new"))
      vOld
        .join(vNew, col("key_old") === col("key_new"), "full_outer")
        .select(
          coalesce(col("key_old"), col("key_new")).as("record_key"),
          col("price_old").cast(DoubleType).as("price_old"),
          col("price_new").cast(DoubleType).as("price_new"),
          when(col("key_old").isNull, "insert")
            .when(col("key_new").isNull, "close")
            .when(col("price_old") =!= col("price_new"), "update")
            .otherwise("keep").as("scd_action"))
    })

  val oracles: Map[String, String] = Map(
    "q74_part_margin" ->
      """SELECT p_brand, n_name,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  COUNT(DISTINCT l_suppkey) AS n_suppliers,
        |  COUNT(*) AS n_lineitems
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |GROUP BY 1, 2""".stripMargin,
    "q01_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))) * (CAST(1 AS DECIMAL(18,2)) + CAST(l_tax AS DECIMAL(18,2)))) AS DOUBLE) AS sum_charge,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(l_quantity) AS avg_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(l_extendedprice) AS avg_price,
        |  CAST(SUM(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / COUNT(l_discount) AS avg_disc,
        |  COUNT(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '2001-09-02'
        |GROUP BY l_returnflag, l_linestatus""".stripMargin,
    "q02_stage_rename" ->
      """SELECT event_id, user_id AS entity_code, event_type AS indicator_code,
        |  CAST(SUBSTRING(strftime(ts, '%Y-%m'), 1, 4) AS BIGINT) AS reference_year,
        |  CAST(SUBSTRING(strftime(ts, '%Y-%m'), 6, 2) AS BIGINT) AS reference_month,
        |  make_date(CAST(SUBSTRING(strftime(ts, '%Y-%m'), 1, 4) AS INTEGER),
        |            CAST(SUBSTRING(strftime(ts, '%Y-%m'), 6, 2) AS INTEGER), 1)::VARCHAR AS reference_date,
        |  value AS indicator_value
        |FROM events
        |WHERE value IS NOT NULL AND user_id IS NOT NULL
        |  AND LENGTH(strftime(ts, '%Y-%m')) >= 7""".stripMargin,
    "q03_surrogate_key" ->
      """SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
        |  md5(concat_ws('||', coalesce(CAST(l_orderkey AS VARCHAR), ''), coalesce(CAST(l_linenumber AS VARCHAR), ''))) AS line_key,
        |  md5(concat_ws('||', coalesce(CAST(l_returnflag AS VARCHAR), ''), coalesce(CAST(CAST(l_shipdate AS DATE) AS VARCHAR), ''), coalesce(CAST(l_suppkey AS VARCHAR), ''))) AS attr_key
        |FROM lineitem""".stripMargin,
    "q04_annual_metrics" ->
      """WITH gdp AS (
        |  SELECT CAST(c_nationkey AS BIGINT) AS nation_key,
        |         CAST(year(o_orderdate) AS BIGINT) AS reference_year,
        |         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS gdp_value,
        |         COUNT(*) AS order_count
        |  FROM orders LEFT JOIN customer ON o_custkey = c_custkey
        |  GROUP BY 1, 2),
        |pop AS (
        |  SELECT CAST(c_nationkey AS BIGINT) AS nation_key, COUNT(*) AS population
        |  FROM customer GROUP BY 1)
        |SELECT g.nation_key, g.reference_year, g.gdp_value, g.order_count, p.population,
        |  CASE WHEN p.population IS NULL OR p.population = 0 THEN NULL
        |       ELSE g.gdp_value / CAST(p.population AS DOUBLE) END AS gdp_per_capita,
        |  CASE WHEN p.population IS NULL OR p.population = 0 THEN 0
        |       ELSE g.gdp_value / CAST(p.population AS DOUBLE) END AS gdp_per_capita_defaulted
        |FROM gdp g LEFT JOIN pop p USING (nation_key)""".stripMargin,
    "q07_rank_within_year" ->
      """WITH rev AS (
        |  SELECT o_custkey, CAST(year(o_orderdate) AS BIGINT) AS reference_year,
        |         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |  FROM orders GROUP BY 1, 2)
        |SELECT o_custkey, reference_year, revenue,
        |  CAST(rank() OVER (PARTITION BY reference_year ORDER BY revenue DESC NULLS LAST) AS BIGINT) AS revenue_rank_desc,
        |  CAST(rank() OVER (PARTITION BY reference_year ORDER BY revenue ASC NULLS LAST) AS BIGINT) AS revenue_rank_asc
        |FROM rev""".stripMargin,
    "q09_distinct_spine" ->
      """SELECT DISTINCT user_id, CAST(CAST(date_trunc('day', ts) AS DATE) AS VARCHAR) AS activity_date
        |FROM events""".stripMargin,
    "q10_incremental_watermark" ->
      """SELECT event_id, user_id, ts, value FROM events
        |WHERE ts > (SELECT max(ts) FROM events WHERE ts < TIMESTAMP '2024-01-25 00:00:00')""".stripMargin,
    "q11_aggregate_consistency" ->
      """WITH enriched AS (
        |  SELECT CAST(n_regionkey AS BIGINT) AS region_key,
        |         CAST(n_nationkey AS BIGINT) AS nation_key,
        |         CAST(year(o_orderdate) AS BIGINT) AS reference_year,
        |         o_totalprice
        |  FROM orders
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN nation ON c_nationkey = n_nationkey),
        |reported AS (
        |  SELECT region_key, reference_year,
        |         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS reported_total
        |  FROM enriched GROUP BY 1, 2),
        |members AS (
        |  SELECT region_key, reference_year,
        |         CAST(SUM(nation_total) AS DOUBLE) AS member_total
        |  FROM (SELECT region_key, nation_key, reference_year,
        |               SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS nation_total
        |        FROM enriched GROUP BY 1, 2, 3)
        |  GROUP BY 1, 2)
        |SELECT m.region_key, m.reference_year, m.member_total, r.reported_total,
        |  abs(m.member_total - r.reported_total) / r.reported_total AS pct_diff,
        |  abs(m.member_total - r.reported_total) / r.reported_total <= 0.05 AS is_consistent
        |FROM members m JOIN reported r USING (region_key, reference_year)""".stripMargin,
    "q12_dim_nation" ->
      """WITH avail AS (
        |  SELECT CAST(c_nationkey AS BIGINT) AS nation_key,
        |         CAST(min(year(o_orderdate)) AS BIGINT) AS first_year,
        |         CAST(max(year(o_orderdate)) AS BIGINT) AS last_year,
        |         COUNT(DISTINCT year(o_orderdate)) AS years_with_data
        |  FROM orders JOIN customer ON o_custkey = c_custkey
        |  GROUP BY 1)
        |SELECT CAST(n_nationkey AS BIGINT) AS nation_key, n_name AS nation_name,
        |  coalesce(r_name, 'UNKNOWN') AS region_name,
        |  a.first_year, a.last_year,
        |  coalesce(a.years_with_data, 0) AS years_with_data,
        |  CASE WHEN coalesce(a.years_with_data, 0) >= 7 THEN 'complete'
        |       WHEN coalesce(a.years_with_data, 0) >= 4 THEN 'partial'
        |       ELSE 'sparse' END AS coverage_status
        |FROM nation
        |LEFT JOIN region ON n_regionkey = r_regionkey
        |LEFT JOIN avail a ON CAST(n_nationkey AS BIGINT) = a.nation_key""".stripMargin,
    "q15_scd2_changes" ->
      """WITH v_old AS (
        |  SELECT o_orderkey AS key_old, CAST(o_totalprice AS DECIMAL(18,2)) AS price_old
        |  FROM orders WHERE o_orderkey % 10 != 0),
        |v_new AS (
        |  SELECT o_orderkey AS key_new,
        |    CASE WHEN o_orderkey % 7 = 0
        |         THEN CAST(o_totalprice AS DECIMAL(18,2)) * CAST(1.1 AS DECIMAL(3,1))
        |         ELSE CAST(o_totalprice AS DECIMAL(18,2)) * CAST(1.0 AS DECIMAL(3,1)) END AS price_new
        |  FROM orders WHERE o_orderkey % 11 != 0)
        |SELECT coalesce(key_old, key_new) AS record_key,
        |  CAST(price_old AS DOUBLE) AS price_old,
        |  CAST(price_new AS DOUBLE) AS price_new,
        |  CASE WHEN key_old IS NULL THEN 'insert'
        |       WHEN key_new IS NULL THEN 'close'
        |       WHEN price_old != price_new THEN 'update'
        |       ELSE 'keep' END AS scd_action
        |FROM v_old FULL OUTER JOIN v_new ON key_old = key_new""".stripMargin)
}
