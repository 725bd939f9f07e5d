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
    },

    // ---------------------------------------------------------------
    // q80: sequential funnel — per user, the first 'view', the first
    // 'click' at-or-after it, and the first 'purchase' at-or-after that
    // click, plus how deep the user got. The standard 3-step product
    // funnel, expressed as stepwise conditional-min aggregations.
    //
    // Shape at 100 TB: three partial-aggregated groupBy(user_id) mins
    // and two equi-joins, all hash-partitioned on user_id — Catalyst
    // reuses the partitioning across the chain, and each step's input
    // is pre-filtered to one event_type before its shuffle. No windows,
    // no per-user event sorting: a user's whole history never passes
    // through one task.
    // ---------------------------------------------------------------
    // q160: per-user EWMA (α=0.25) of event values with max absolute
    // deviation — the sequential-recurrence monitor (the q58 ES fold
    // discipline applied to behavioral streams): the smoothed state a
    // drift/fraud monitor keeps per entity, plus the largest shock seen.
    // The fold runs over the (ts, event_id)-ordered value list inside
    // ONE aggregate row per user (q102's pos-ordered collect_list
    // collapse) with the exact IEEE op order the DuckDB list_reduce
    // replays — bit-identical, so the doubles hash-gate. State packing
    // rule (the q58 Holt lesson): the accumulator's `d` field is
    // written BEFORE `m`, so under DuckDB's in-place field mutation `d`
    // still reads the pre-update mean.
    //
    // 100 TB shape: per-user event lists are bounded (panel data); one
    // partial+final collect per user, no window over the event stream.
    "q160_ewma_deviation" -> { (s, dir) =>
      val e = Tables(s, dir).events.filter(col("value").isNotNull)
      val g = e.groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_events"),
             array_sort(collect_list(struct(
               col("ts").as("ts"), col("event_id").as("eid"),
               col("value").as("v")))).as("xs"))
      val firstV = element_at(col("xs"), 1).getField("v")
      val tail = slice(col("xs"), lit(2),
                       greatest(size(col("xs")) - 1, lit(0)))
      val st = aggregate(
        tail,
        struct(lit(0.0).as("d"), firstV.as("m")),
        (acc, x) => struct(
          greatest(acc.getField("d"),
                   abs(x.getField("v") - acc.getField("m"))).as("d"),
          (lit(0.25) * x.getField("v") + lit(0.75) * acc.getField("m"))
            .as("m")))
      g.select(col("user_id"), col("n_events"),
               element_at(col("xs"), size(col("xs"))).getField("v")
                 .as("last_value"),
               st.getField("m").as("ewma"),
               st.getField("d").as("max_abs_dev"),
               (st.getField("d") > abs(st.getField("m"))).as("is_volatile"))
    },

    "q80_funnel" -> { (s, dir) =>
      val e = Tables(s, dir).events
      val views = e.filter(col("event_type") === "view")
        .groupBy(col("user_id")).agg(min(col("ts")).as("first_view"))
      val clicks = e.filter(col("event_type") === "click")
        .join(views, "user_id")
        .filter(col("ts") >= col("first_view"))
        .groupBy(col("user_id")).agg(min(col("ts")).as("first_click"))
      val purchases = e.filter(col("event_type") === "purchase")
        .join(clicks, "user_id")
        .filter(col("ts") >= col("first_click"))
        .groupBy(col("user_id")).agg(min(col("ts")).as("first_purchase"))
      e.groupBy(col("user_id")).agg(count(lit(1)).as("n_events"))
        .join(views, Seq("user_id"), "left")
        .join(clicks, Seq("user_id"), "left")
        .join(purchases, Seq("user_id"), "left")
        .select(col("user_id"), col("n_events"),
                col("first_view"), col("first_click"), col("first_purchase"),
                when(col("first_purchase").isNotNull, 3L)
                  .when(col("first_click").isNotNull, 2L)
                  .when(col("first_view").isNotNull, 1L)
                  .otherwise(0L).as("reached_step"))
    },

    // ---------------------------------------------------------------
    // q81: cohort retention — users grouped by first-activity date, and
    // for each cohort the count of users still active in each 7-day
    // offset window. Day-offset buckets are pure integer arithmetic
    // (datediff/7), so the result is partitioning-independent.
    //
    // Shape at 100 TB: cohort assignment is one groupBy(user_id) min;
    // the activity stream joins it on user_id (both sides partitioned
    // the same way), then the per-(cohort, week) distinct-user count is
    // a two-key groupBy whose distinct is bounded by the user dimension,
    // not the event volume — partial aggregation dedupes
    // (user, cohort, week) map-side before the final shuffle.
    // ---------------------------------------------------------------
    "q81_retention" -> { (s, dir) =>
      val e = Tables(s, dir).events
      val cohort = e.groupBy(col("user_id"))
        .agg(min(to_date(col("ts"))).as("cohort_date"))
      e.select(col("user_id"), to_date(col("ts")).as("d"))
        .join(cohort, "user_id")
        .select(col("user_id"), col("cohort_date"),
                floor(datediff(col("d"), col("cohort_date")) / 7)
                  .cast("long").as("week_offset"))
        .distinct()
        .groupBy(col("cohort_date"), col("week_offset"))
        .agg(countDistinct(col("user_id")).as("n_users"))
        .select(date_format(col("cohort_date"), "yyyy-MM-dd").as("cohort_date"),
                col("week_offset"), col("n_users"))
    })

  val oracles: Map[String, String] = Map(
    "q160_ewma_deviation" ->
      """WITH e AS (
        |  SELECT user_id, ts, event_id, value AS v
        |  FROM events WHERE value IS NOT NULL),
        |g AS (
        |  SELECT user_id,
        |    CAST(count(*) AS BIGINT) AS n_events,
        |    list(v ORDER BY ts, event_id) AS xs
        |  FROM e GROUP BY 1),
        |f AS (
        |  SELECT *,
        |    list_reduce(
        |      [{'d': CAST(0 AS DOUBLE), 'm': xs[1]}] ||
        |      list_transform(xs[2:], x -> {'d': CAST(0 AS DOUBLE), 'm': x}),
        |      (acc, e) -> {'d': greatest(acc.d, abs(e.m - acc.m)),
        |                   'm': 0.25*e.m + 0.75*acc.m}) AS st
        |  FROM g)
        |SELECT user_id, n_events, xs[len(xs)] AS last_value,
        |  st.m AS ewma, st.d AS max_abs_dev,
        |  st.d > abs(st.m) AS is_volatile
        |FROM f""".stripMargin,
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
        |FROM sessions GROUP BY user_id, session_seq""".stripMargin,

    "q80_funnel" ->
      """WITH v AS (
        |  SELECT user_id, min(ts) AS first_view
        |  FROM events WHERE event_type = 'view' GROUP BY user_id),
        |c AS (
        |  SELECT e.user_id, min(e.ts) AS first_click
        |  FROM events e JOIN v ON e.user_id = v.user_id AND e.ts >= v.first_view
        |  WHERE e.event_type = 'click' GROUP BY e.user_id),
        |p AS (
        |  SELECT e.user_id, min(e.ts) AS first_purchase
        |  FROM events e JOIN c ON e.user_id = c.user_id AND e.ts >= c.first_click
        |  WHERE e.event_type = 'purchase' GROUP BY e.user_id),
        |u AS (SELECT user_id, count(*) AS n_events FROM events GROUP BY user_id)
        |SELECT u.user_id, u.n_events, v.first_view, c.first_click, p.first_purchase,
        |  CAST(CASE WHEN p.user_id IS NOT NULL THEN 3
        |            WHEN c.user_id IS NOT NULL THEN 2
        |            WHEN v.user_id IS NOT NULL THEN 1
        |            ELSE 0 END AS BIGINT) AS reached_step
        |FROM u
        |LEFT JOIN v USING (user_id)
        |LEFT JOIN c USING (user_id)
        |LEFT JOIN p USING (user_id)""".stripMargin,

    "q81_retention" ->
      """WITH cohort AS (
        |  SELECT user_id, min(CAST(ts AS DATE)) AS cohort_date
        |  FROM events GROUP BY user_id),
        |a AS (
        |  SELECT DISTINCT e.user_id, cohort.cohort_date,
        |    CAST(floor(date_diff('day', cohort.cohort_date, CAST(e.ts AS DATE)) / 7)
        |         AS BIGINT) AS week_offset
        |  FROM events e JOIN cohort USING (user_id))
        |SELECT CAST(cohort_date AS VARCHAR) AS cohort_date, week_offset,
        |  CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
        |FROM a GROUP BY a.cohort_date, week_offset""".stripMargin)
}
