package graft.registry

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ext.EventOps
import graft.runtime.Sources

/** [EXT] Event-analytics query registrations (ext/EventOps): session
  * rollups, as-of attribution, conversion funnel, retention cohorts —
  * each with a DuckDB oracle. Outputs are integer-only (epoch µs,
  * counts, offsets) plus one DATE column, so the hash compare never
  * rides on timestamp rendering or double accumulation.
  */
object EventQueries {

  type Q = (SparkSession, String) => DataFrame

  private val sessionGapMinutes = 30
  private val funnelStages = Seq("signup", "view", "click", "purchase")
  private val funnelWindowUs = 24L * 3600L * 1000000L // 24h conversion window

  val queries: Map[String, Q] = Map(
    // GA-style 30-minute-idle sessions rolled up per (user, session)
    "q_ext_sessionize" -> ((s, dir) =>
      EventOps.sessionSummary(Sources(s, dir).events, sessionGapMinutes)),
    // the same sessionization on the SQL surface: Spark SQL's WINDOW
    // clause + window CTE pipeline, textually near the DuckDB oracle
    "q_ext_sessionize_sql" -> ((s, dir) => {
      Sources(s, dir).events.createOrReplaceTempView("events_sess_sql")
      s.sql("""
        WITH g AS (
          SELECT user_id, ts, event_id, event_type,
            CASE WHEN lag(ts) OVER w IS NULL
                 OR unix_micros(ts) - unix_micros(lag(ts) OVER w) > 1800000000
              THEN 1 ELSE 0 END AS brk
          FROM events_sess_sql
          WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ), sessioned AS (
          SELECT user_id, ts, event_type,
            sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
              ROWS UNBOUNDED PRECEDING) AS session_idx
          FROM g
        )
        SELECT user_id, session_idx,
          min(unix_micros(ts)) AS session_start_us,
          max(unix_micros(ts)) AS session_end_us,
          count(1) AS n_events,
          sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS n_purchases
        FROM sessioned GROUP BY user_id, session_idx""")
    }),
    // Spark's BUILT-IN session_window cross-gated against a DuckDB
    // mirror of its exact merge rule (gap < threshold — strict, unlike
    // sessionize's <=; the oracle CTE uses >= as the break test)
    "q_ext_session_window" -> ((s, dir) =>
      Sources(s, dir).events
        .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
        .agg(min(unix_micros(col("ts"))).as("session_start_us"),
          max(unix_micros(col("ts"))).as("session_end_us"),
          count(lit(1)).as("n_events"),
          sum(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("n_purchases"))
        .select("user_id", "session_start_us", "session_end_us",
          "n_events", "n_purchases")),
    // last-click attribution: each purchase joined as-of to the user's
    // most recent at-or-before click. Unmatched → -1 sentinels (not
    // NULL) so both engines emit non-null BIGINTs. No right-side dedup:
    // asOfJoin's (ts, tie) ordering already picks the max event_id among
    // ts-tied clicks, which the oracle mirrors with a QUALIFY dedup.
    "q_ext_asof_attrib" -> ((s, dir) => {
      val ev = Sources(s, dir).events
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"), col("event_id"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts"), col("event_id"),
          col("event_id").as("click_event_id"),
          unix_micros(col("ts")).as("click_us"))
      EventOps.asOfJoin(purchases, clicks, "user_id", "ts", "event_id",
          Seq("click_event_id", "click_us"))
        .select(col("event_id"), col("user_id"),
          unix_micros(col("ts")).as("purchase_us"),
          coalesce(col("click_event_id"), lit(-1L)).as("click_event_id"),
          coalesce(unix_micros(col("ts")) - col("click_us"), lit(-1L)).as("lag_us"))
    }),
    // signup → view → click → purchase, each step within 24h of the
    // previous (150 → 39 → 16 → 5 users at sf0.01)
    "q_ext_funnel" -> ((s, dir) =>
      EventOps.funnelCounts(Sources(s, dir).events, funnelStages, funnelWindowUs)),
    // weekly retention by first-activity cohort
    "q_ext_retention" -> ((s, dir) =>
      EventOps.retentionCohorts(Sources(s, dir).events)),
    // dense user×day matrix with zero-fill (494 silent cells at sf0.01)
    "q_ext_date_spine" -> ((s, dir) =>
      EventOps.dailyActivitySpine(Sources(s, dir).events)),
    // LOCF densify over the per-user-BOUNDED spine (r16: the global
    // spine is users × platform-days — 100× rows at the 10×-users/
    // 10×-history sf1 tier; bounded output is Σ per-user spans). The
    // -1 default is unreachable on a bounded spine (day 1 is an
    // observation) but kept for the forwardFill contract.
    "q_ext_locf" -> ((s, dir) => {
      val spine = EventOps.dailyActivitySpineBounded(Sources(s, dir).events)
        .withColumn("__v", when(col("n_events") > 0, col("n_events")))
      EventOps.forwardFill(spine, Seq("user_id"), "day", "__v", lit(-1L))
        .select(col("user_id"), col("day"), col("filled"))
    }),
    // sliding 7-day windows advancing daily (overlapping — each event
    // lands in exactly 7 windows); epoch-aligned UTC window starts
    "q_ext_sliding_window" -> ((s, dir) =>
      Sources(s, dir).events
        .groupBy(window(col("ts"), "7 days", "1 day"), col("event_type"))
        .agg(count(lit(1)).as("n"), countDistinct(col("user_id")).as("uniq"))
        .select(to_date(col("window.start")).as("win_start"),
          col("event_type"), col("n"), col("uniq"))),
    // linear interpolation across silent days (LOCF's other half):
    // missing cells take the straight line between surrounding
    // observations — per-user-BOUNDED spine (r16), so the edge-
    // extension rows outside a user's span are never manufactured
    "q_ext_interpolate" -> ((s, dir) => {
      val spine = EventOps.dailyActivitySpineBounded(Sources(s, dir).events)
        .withColumn("__v", when(col("n_events") > 0, col("n_events")))
        .withColumn("__pos", datediff(col("day"), to_date(lit("1970-01-01"))))
      EventOps.interpolateLinear(spine, Seq("user_id"), "__pos", "__v")
        .select(col("user_id"), col("day"), col("interp"))
    }),
    // keyless containment join: platform-wide events inside each user's
    // first-72h window, counted per window. Day buckets ≈ span/3 →
    // each interval replicates 4-5 ways; residual BETWEEN filters
    // within-bucket candidates.
    "q_ext_interval_join" -> ((s, dir) => {
      val ev = Sources(s, dir).events
      val iv = ev.groupBy(col("user_id").as("iv_user"))
        .agg(min(col("ts")).as("iv_start"))
        .withColumn("iv_end", col("iv_start") + expr("INTERVAL 72 HOURS"))
      EventOps.intervalJoin(ev.select("event_id", "ts"), "ts",
          iv, "iv_start", "iv_end", Seq("iv_user"), 86400000000L)
        .groupBy(col("iv_user"))
        .agg(count(lit(1)).as("n_ctx_events"))
    }),
  )

  val oracle: Map[String, String] = Map(
    "q_ext_sessionize" ->
      ("""WITH g AS (
         |  SELECT user_id, ts, event_id, event_type,
         |    CASE WHEN lag(ts) OVER w IS NULL
         |         OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
         |      THEN 1 ELSE 0 END AS brk
         |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
         |), s AS (
         |  SELECT user_id, ts, event_type,
         |    CAST(sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
         |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_idx
         |  FROM g
         |)
         |SELECT user_id, session_idx,
         |  CAST(min(epoch_us(ts)) AS BIGINT) AS session_start_us,
         |  CAST(max(epoch_us(ts)) AS BIGINT) AS session_end_us,
         |  count(*) AS n_events,
         |  CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_purchases
         |FROM s GROUP BY 1, 2""".stripMargin),
    "q_ext_sessionize_sql" ->
      ("""WITH g AS (
         |  SELECT user_id, ts, event_id, event_type,
         |    CASE WHEN lag(ts) OVER w IS NULL
         |         OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
         |      THEN 1 ELSE 0 END AS brk
         |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
         |), s AS (
         |  SELECT user_id, ts, event_type,
         |    CAST(sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
         |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_idx
         |  FROM g
         |)
         |SELECT user_id, session_idx,
         |  CAST(min(epoch_us(ts)) AS BIGINT) AS session_start_us,
         |  CAST(max(epoch_us(ts)) AS BIGINT) AS session_end_us,
         |  count(*) AS n_events,
         |  CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_purchases
         |FROM s GROUP BY 1, 2""".stripMargin),
    "q_ext_session_window" ->
      ("""WITH g AS (
         |  SELECT user_id, ts, event_id, event_type,
         |    CASE WHEN lag(ts) OVER w IS NULL
         |         OR epoch_us(ts) - epoch_us(lag(ts) OVER w) >= 1800000000
         |      THEN 1 ELSE 0 END AS brk
         |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
         |), s AS (
         |  SELECT user_id, ts, event_type,
         |    sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
         |      ROWS UNBOUNDED PRECEDING) AS session_idx
         |  FROM g
         |)
         |SELECT user_id,
         |  CAST(min(epoch_us(ts)) AS BIGINT) AS session_start_us,
         |  CAST(max(epoch_us(ts)) AS BIGINT) AS session_end_us,
         |  count(*) AS n_events,
         |  CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_purchases
         |FROM s GROUP BY user_id, session_idx""".stripMargin),
    "q_ext_asof_attrib" ->
      ("""WITH c AS (
         |  SELECT user_id, ts, event_id FROM events WHERE event_type = 'click'
         |  QUALIFY row_number() OVER (PARTITION BY user_id, ts ORDER BY event_id DESC) = 1
         |), p AS (
         |  SELECT user_id, ts, event_id FROM events WHERE event_type = 'purchase'
         |)
         |SELECT p.event_id, p.user_id,
         |  CAST(epoch_us(p.ts) AS BIGINT) AS purchase_us,
         |  CAST(COALESCE(c.event_id, -1) AS BIGINT) AS click_event_id,
         |  CAST(COALESCE(epoch_us(p.ts) - epoch_us(c.ts), -1) AS BIGINT) AS lag_us
         |FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND p.ts >= c.ts""".stripMargin),
    "q_ext_funnel" ->
      ("""WITH s0 AS (SELECT user_id, min(epoch_us(ts)) AS t FROM events
         |  WHERE event_type = 'signup' GROUP BY 1),
         |s1 AS (SELECT e.user_id, min(epoch_us(e.ts)) AS t FROM events e JOIN s0 USING (user_id)
         |  WHERE e.event_type = 'view' AND epoch_us(e.ts) > s0.t
         |    AND epoch_us(e.ts) - s0.t <= 86400000000 GROUP BY 1),
         |s2 AS (SELECT e.user_id, min(epoch_us(e.ts)) AS t FROM events e JOIN s1 USING (user_id)
         |  WHERE e.event_type = 'click' AND epoch_us(e.ts) > s1.t
         |    AND epoch_us(e.ts) - s1.t <= 86400000000 GROUP BY 1),
         |s3 AS (SELECT e.user_id, min(epoch_us(e.ts)) AS t FROM events e JOIN s2 USING (user_id)
         |  WHERE e.event_type = 'purchase' AND epoch_us(e.ts) > s2.t
         |    AND epoch_us(e.ts) - s2.t <= 86400000000 GROUP BY 1)
         |SELECT 0 AS stage_idx, 'signup' AS stage, CAST((SELECT count(*) FROM s0) AS BIGINT) AS users
         |UNION ALL SELECT 1, 'view', CAST((SELECT count(*) FROM s1) AS BIGINT)
         |UNION ALL SELECT 2, 'click', CAST((SELECT count(*) FROM s2) AS BIGINT)
         |UNION ALL SELECT 3, 'purchase', CAST((SELECT count(*) FROM s3) AS BIGINT)""".stripMargin),
    "q_ext_retention" ->
      ("""WITH c AS (
         |  SELECT user_id, min(CAST(ts AS DATE)) AS cohort_date FROM events GROUP BY 1
         |)
         |SELECT c.cohort_date,
         |  CAST(date_diff('day', c.cohort_date, CAST(e.ts AS DATE)) // 7 AS BIGINT) AS week_offset,
         |  CAST(count(DISTINCT e.user_id) AS BIGINT) AS users
         |FROM events e JOIN c USING (user_id)
         |GROUP BY 1, 2""".stripMargin),
    "q_ext_date_spine" ->
      ("""WITH b AS (
         |  SELECT min(CAST(ts AS DATE)) AS d0, max(CAST(ts AS DATE)) AS d1 FROM events
         |), days AS (
         |  SELECT CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE) AS day FROM b
         |), u AS (
         |  SELECT DISTINCT user_id FROM events
         |), daily AS (
         |  SELECT user_id, CAST(ts AS DATE) AS day, count(*) AS ne,
         |    sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS np
         |  FROM events GROUP BY 1, 2
         |)
         |SELECT u.user_id, days.day,
         |  CAST(COALESCE(d.ne, 0) AS BIGINT) AS n_events,
         |  CAST(COALESCE(d.np, 0) AS BIGINT) AS n_purchases
         |FROM u CROSS JOIN days
         |LEFT JOIN daily d ON d.user_id = u.user_id AND d.day = days.day""".stripMargin),
    "q_ext_locf" ->
      ("""WITH daily AS (
         |  SELECT user_id, CAST(ts AS DATE) AS day, count(*) AS ne
         |  FROM events GROUP BY 1, 2
         |), span AS (
         |  SELECT user_id, min(day) AS d0, max(day) AS d1 FROM daily GROUP BY 1
         |), sp AS (
         |  SELECT user_id, CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE) AS day
         |  FROM span
         |)
         |SELECT sp.user_id, sp.day,
         |  CAST(COALESCE(last_value(d.ne IGNORE NULLS) OVER
         |    (PARTITION BY sp.user_id ORDER BY sp.day
         |     ROWS UNBOUNDED PRECEDING), -1) AS BIGINT) AS filled
         |FROM sp
         |LEFT JOIN daily d ON d.user_id = sp.user_id AND d.day = sp.day""".stripMargin),
    "q_ext_sliding_window" ->
      ("""WITH offs AS (SELECT unnest(range(0, 7)) AS o),
         |ev AS (SELECT CAST(ts AS DATE) AS d, event_type, user_id FROM events)
         |SELECT CAST(ev.d - CAST(offs.o AS INTEGER) AS DATE) AS win_start, event_type,
         |  count(*) AS n, CAST(count(DISTINCT user_id) AS BIGINT) AS uniq
         |FROM ev CROSS JOIN offs
         |GROUP BY 1, 2""".stripMargin),
    "q_ext_interpolate" ->
      ("""WITH daily AS (
         |  SELECT user_id, CAST(ts AS DATE) AS day, count(*) AS ne
         |  FROM events GROUP BY 1, 2
         |), span AS (
         |  SELECT user_id, min(day) AS d0, max(day) AS d1 FROM daily GROUP BY 1
         |), sp0 AS (
         |  SELECT user_id, CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE) AS day
         |  FROM span
         |), sp AS (
         |  SELECT sp0.user_id, sp0.day, d.ne,
         |    date_diff('day', DATE '1970-01-01', sp0.day) AS pos
         |  FROM sp0
         |  LEFT JOIN daily d ON d.user_id = sp0.user_id AND d.day = sp0.day
         |), win AS (
         |  SELECT *,
         |    last_value(ne IGNORE NULLS) OVER wb AS pv,
         |    last_value(CASE WHEN ne IS NOT NULL THEN pos END IGNORE NULLS) OVER wb AS pp,
         |    first_value(ne IGNORE NULLS) OVER wf AS nv,
         |    first_value(CASE WHEN ne IS NOT NULL THEN pos END IGNORE NULLS) OVER wf AS np
         |  FROM sp
         |  WINDOW wb AS (PARTITION BY user_id ORDER BY pos ROWS UNBOUNDED PRECEDING),
         |         wf AS (PARTITION BY user_id ORDER BY pos
         |                ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
         |)
         |SELECT user_id, day,
         |  CASE WHEN ne IS NOT NULL THEN CAST(ne AS DOUBLE)
         |       WHEN pv IS NULL THEN CAST(nv AS DOUBLE)
         |       WHEN nv IS NULL THEN CAST(pv AS DOUBLE)
         |       ELSE CAST(pv AS DOUBLE) + (CAST(nv AS DOUBLE) - CAST(pv AS DOUBLE)) *
         |         (CAST(pos - pp AS DOUBLE) / CAST(np - pp AS DOUBLE)) END AS interp
         |FROM win""".stripMargin),
    "q_ext_interval_join" ->
      ("""WITH iv AS (
         |  SELECT user_id AS iv_user, min(ts) AS s, min(ts) + INTERVAL 72 HOUR AS e
         |  FROM events GROUP BY 1
         |)
         |SELECT iv.iv_user, count(*) AS n_ctx_events
         |FROM events ev JOIN iv ON ev.ts >= iv.s AND ev.ts <= iv.e
         |GROUP BY 1""".stripMargin),
  )
}
