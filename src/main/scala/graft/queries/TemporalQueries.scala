package graft.queries

import graft.core.Tables
import graft.functions.Exact
import graft.operators.TemporalJoins
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Temporal-join operator inventory: as-of join, bounded range join,
  * sessionization — operators Spark lacks as built-ins, composed
  * shuffle-consciously in [[TemporalJoins]] and oracle-checked against
  * DuckDB's native ASOF JOIN / inequality joins.
  */
object TemporalQueries {

  type Q = (SparkSession, String) => DataFrame

  private val HourMicros = 3600L * 1000000L
  private val Gap30Min   = 1800L * 1000000L

  val defs: Map[String, Q] = Map(
    // As-of (backward) join: each click gets the user's latest purchase
    // at-or-before it. Right side deduped per (user, ts) so the "latest"
    // row is well-defined on both engines.
    "q42_asof_join" -> { (s, dir) =>
      val e = Tables(s, dir).events
      val wDedup = Window.partitionBy(col("user_id"), col("ts"))
        .orderBy(col("event_id").desc)
      val purchases = e.filter(col("event_type") === "purchase")
        .withColumn("rn", row_number().over(wDedup))
        .filter(col("rn") === 1)
        .select(col("user_id"), col("ts"), col("value"), col("event_id"))
      val clicks = e.filter(col("event_type") === "click")
        .select(col("event_id"), col("user_id"), col("ts"), col("value"))
      TemporalJoins.asofBackward(
        clicks, purchases, Seq("user_id"), "ts", "ts",
        Seq("event_id", "ts", "value"))
    },

    // Bounded range join: purchases within the hour after each view,
    // aggregated per view (binned equi-join, not a theta join).
    "q43_range_join" -> { (s, dir) =>
      val e = Tables(s, dir).events
      val views = e.filter(col("event_type") === "view")
        .select(col("event_id"), col("user_id"), col("ts"))
      val purchases = e.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"), col("value"))
      val matches = TemporalJoins.boundedRangeJoin(
        views, purchases, Seq("user_id"), "ts", "ts", HourMicros)
      val agg = matches.groupBy(col("event_id"))
        .agg(count(lit(1)).as("n_next_hour_purchases"),
             Exact.sumExact(col("r_value")).as("value_next_hour"))
      views.join(agg, Seq("event_id"), "left")
        .select(col("event_id"), col("user_id"),
          coalesce(col("n_next_hour_purchases"), lit(0L)).as("n_next_hour_purchases"),
          coalesce(col("value_next_hour"), lit(0.0)).as("value_next_hour"))
    },

    // Sessionization: 30-minute-gap sessions per user, rolled up.
    "q44_sessionize" -> { (s, dir) =>
      val e = Tables(s, dir).events
      TemporalJoins.sessionize(e, Seq("user_id"), "ts", Gap30Min)
        .groupBy(col("user_id"), col("session_seq"))
        .agg(
          min(col("ts")).as("session_start"),
          max(col("ts")).as("session_end"),
          count(lit(1)).as("n_events"),
          Exact.sumExact(col("value")).as("total_value"))
        .withColumn("duration_seconds",
          floor((unix_micros(col("session_end")) - unix_micros(col("session_start"))) / 1000000L)
            .cast("long"))
    })

  val oracles: Map[String, String] = Map(
    "q42_asof_join" ->
      """WITH pd AS (
        |  SELECT user_id, ts, value, event_id,
        |         row_number() OVER (PARTITION BY user_id, ts ORDER BY event_id DESC) AS rn
        |  FROM events WHERE event_type = 'purchase'),
        |p AS (SELECT user_id, ts, value, event_id FROM pd WHERE rn = 1),
        |clicks AS (SELECT event_id, user_id, ts, value FROM events WHERE event_type = 'click')
        |SELECT c.event_id, c.user_id, c.ts, c.value,
        |       p.event_id AS asof_event_id, p.ts AS asof_ts, p.value AS asof_value
        |FROM clicks c ASOF LEFT JOIN p ON c.user_id = p.user_id AND c.ts >= p.ts""".stripMargin,
    "q43_range_join" ->
      """WITH views AS (
        |  SELECT event_id, user_id, ts FROM events WHERE event_type = 'view'),
        |purchases AS (
        |  SELECT user_id, ts, value FROM events WHERE event_type = 'purchase'),
        |matched AS (
        |  SELECT v.event_id, COUNT(*) AS n,
        |         CAST(SUM(CAST(p.value AS DECIMAL(18,2))) AS DOUBLE) AS val
        |  FROM views v JOIN purchases p
        |    ON v.user_id = p.user_id
        |   AND p.ts > v.ts AND epoch_us(p.ts) <= epoch_us(v.ts) + 3600000000
        |  GROUP BY v.event_id)
        |SELECT v.event_id, v.user_id,
        |  coalesce(m.n, 0) AS n_next_hour_purchases,
        |  coalesce(m.val, 0.0) AS value_next_hour
        |FROM views v LEFT JOIN matched m ON v.event_id = m.event_id""".stripMargin,
    "q44_sessionize" ->
      """WITH gaps AS (
        |  SELECT user_id, ts, value,
        |    CASE WHEN lag(ts) OVER w IS NULL THEN 1
        |         WHEN epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000 THEN 1
        |         ELSE 0 END AS new_session
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
        |sessions AS (
        |  SELECT user_id, ts, value,
        |    SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
        |                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_seq
        |  FROM gaps)
        |SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq,
        |  min(ts) AS session_start, max(ts) AS session_end,
        |  COUNT(*) AS n_events,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value,
        |  CAST(floor((epoch_us(max(ts)) - epoch_us(min(ts))) / 1000000) AS BIGINT) AS duration_seconds
        |FROM sessions GROUP BY user_id, session_seq""".stripMargin)
}
