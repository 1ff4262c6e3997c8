package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables._
import graft.operators.TimeJoins

/** Temporal correlation through the correctness gate: the bucketed
  * range-count join and the window-pass as-of join (graft.operators
  * .TimeJoins), differentially checked against direct non-equi /
  * window SQL in DuckDB (fine at oracle scale; the Spark side uses
  * the scalable formulations).
  */
object Temporal {

  val entries: Vector[Q] = Vector(

    // clicks within the 10 minutes preceding each error, histogrammed
    Q("q43_range_join", (s, d) => {
      val ev = t(s, d, "events")
      val err = ev.filter(col("event_type") === "error")
      val clk = ev.filter(col("event_type") === "click")
      TimeJoins.rangeCount(err, clk,
        keys = Seq("user_id"), leftTs = "ts", rightTs = "ts",
        leftId = "event_id", windowSec = 600L, asName = "n_clicks")
        .groupBy(col("n_clicks"))
        .agg(count(lit(1)).as("errors"))
        .orderBy(col("n_clicks"))
    }, Some("""
      WITH err AS (SELECT event_id, user_id, ts FROM events WHERE event_type='error'),
      clk AS (SELECT user_id, ts FROM events WHERE event_type='click'),
      cnt AS (
        SELECT e.event_id, CAST(count(c.user_id) AS BIGINT) n_clicks
        FROM err e LEFT JOIN clk c ON e.user_id = c.user_id
          AND c.ts >= e.ts - INTERVAL 10 MINUTE AND c.ts < e.ts
        GROUP BY 1)
      SELECT n_clicks, CAST(count(*) AS BIGINT) AS errors
      FROM cnt GROUP BY 1 ORDER BY 1""")),

    // for each error, the same user's most recent view at-or-before it
    Q("q44_asof_join", (s, d) => {
      val ev = t(s, d, "events")
      val err = ev.filter(col("event_type") === "error")
      val views = ev.filter(col("event_type") === "view")
      TimeJoins.asofJoin(err, views,
        keys = Seq("user_id"), leftTs = "ts", rightTs = "ts",
        leftId = "event_id", rightValue = "event_id", asName = "asof_view")
        .orderBy(col("event_id"))
    }, Some("""
      WITH tagged AS (
        SELECT event_id, user_id, ts,
               CASE WHEN event_type='view' THEN 0 ELSE 1 END tag
        FROM events WHERE event_type IN ('view','error')),
      w AS (
        SELECT event_id, tag,
               last_value(CASE WHEN tag=0 THEN event_id END IGNORE NULLS)
                 OVER (PARTITION BY user_id ORDER BY ts, tag, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) asof_view
        FROM tagged)
      SELECT event_id, asof_view FROM w WHERE tag=1 ORDER BY event_id""")),

    // gap-based sessionization through the REAL operator
    // (graft.streaming.Sessionize.sessionsBatch — the same function
    // SessionizeSpec proves equal to the streaming stateful path, so
    // this gate row transitively covers both): 6-hour-gap sessions
    // per user, reported as per-user session stats in epoch millis
    Q("q61_sessionize", (s, d) => {
      // long keys stay long end-to-end (sessionsBatchDF) — the typed
      // Event path's String key forced a cast that made every window
      // sort comparison a string compare at 100x events
      val ev = t(s, d, "events").select(col("user_id"), col("ts"))
      graft.streaming.Sessionize.sessionsBatchDF(ev, "user_id", "ts",
          gapMs = 21600000L)
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_sessions"),
          sum(col("events")).as("n_events"),
          max(unix_millis(col("end")) - unix_millis(col("start"))).as("longest_ms"))
        .orderBy(col("user_id"))
    }, Some("""
      WITH w AS (
        SELECT user_id, ts,
          CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                 OR epoch_ms(ts) - epoch_ms(lag(ts) OVER (PARTITION BY user_id ORDER BY ts))
                    > 21600000 THEN 1 ELSE 0 END ns
        FROM events),
      sid AS (
        SELECT user_id, ts,
          SUM(ns) OVER (PARTITION BY user_id ORDER BY ts
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) sid
        FROM w),
      sess AS (
        SELECT user_id, sid, count(*) n,
               epoch_ms(max(ts)) - epoch_ms(min(ts)) dur
        FROM sid GROUP BY 1, 2)
      SELECT user_id, count(*) AS n_sessions, CAST(SUM(n) AS BIGINT) AS n_events,
             CAST(MAX(dur) AS BIGINT) AS longest_ms
      FROM sess GROUP BY 1 ORDER BY 1""")),

    // rolling 7-day distinct active users (DAU/WAU) — the sliding
    // DISTINCT that naive windowing can't do: formulated SHUFFLE-
    // FRIENDLY as an explode of each (day, user) into its 7 target
    // days + one distinct-count groupBy, never a range join (a
    // 30-row broadcast range join is fine here but becomes a
    // nested-loop fan-out at a year × 1e9 users; the explode form is
    // Θ(7·|day-user pairs|) of narrow rows with map-side combine).
    // Day = integer offset from 2024-01-01 (engine-exact under the
    // pinned UTC session, the q11 convention)
    Q("q128_rolling_active_users", (s, d) => {
      val du = t(s, d, "events")
        .select(datediff(to_date(col("ts")), lit("2024-01-01")).as("d"),
          col("user_id"))
        .distinct()
      val days = du.select(col("d")).distinct()
      du.select(explode(expr("sequence(d, d + 6)")).as("day"), col("user_id"))
        .join(days.withColumnRenamed("d", "day"), Seq("day"), "leftsemi")
        .groupBy(col("day"))
        .agg(countDistinct(col("user_id")).as("wau"))
        .join(du.groupBy(col("d").as("day")).agg(count(lit(1)).as("dau")),
          "day")
        .select(col("day").cast("long").as("day"), col("dau"), col("wau"))
        .orderBy(col("day"))
    }, Some("""
      WITH du AS (SELECT DISTINCT
                    date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) d,
                    user_id
                  FROM events),
      days AS (SELECT DISTINCT d FROM du),
      ex AS (SELECT unnest(generate_series(d, d + 6)) AS day, user_id FROM du),
      wau AS (SELECT day, CAST(count(DISTINCT user_id) AS BIGINT) wau
              FROM ex WHERE day IN (SELECT d FROM days) GROUP BY 1),
      dau AS (SELECT d AS day, CAST(count(*) AS BIGINT) dau FROM du GROUP BY 1)
      SELECT CAST(day AS BIGINT) AS day, dau, wau
      FROM dau JOIN wau USING (day) ORDER BY day""")),

    // first-touch event funnel: users whose FIRST view precedes their
    // first click precedes their first purchase — the product-
    // analytics conversion ladder as one per-user min-ts aggregate
    // (scan-stage conditional mins, one shuffle on user_id, a 3-row
    // bounded rollup; deterministic under the strict-< rule)
    Q("q129_event_funnel", (s, d) => {
      val mt = t(s, d, "events")
        .groupBy(col("user_id"))
        .agg(min(when(col("event_type") === "view", col("ts"))).as("tv"),
          min(when(col("event_type") === "click", col("ts"))).as("tc"),
          min(when(col("event_type") === "purchase", col("ts"))).as("tp"))
      mt.agg(
          sum(when(col("tv").isNotNull, 1L).otherwise(0L)).as("s1"),
          sum(when(col("tv").isNotNull && col("tc").isNotNull &&
            col("tv") < col("tc"), 1L).otherwise(0L)).as("s2"),
          sum(when(col("tv").isNotNull && col("tc").isNotNull &&
            col("tp").isNotNull && col("tv") < col("tc") &&
            col("tc") < col("tp"), 1L).otherwise(0L)).as("s3"))
        .selectExpr("stack(3, '1_view', s1, '2_click', s2, '3_purchase', s3) " +
          "AS (step, n_users)")
        .orderBy(col("step"))
    }, Some("""
      WITH mt AS (
        SELECT user_id,
          min(CASE WHEN event_type='view' THEN ts END) tv,
          min(CASE WHEN event_type='click' THEN ts END) tc,
          min(CASE WHEN event_type='purchase' THEN ts END) tp
        FROM events GROUP BY 1),
      agg AS (
        SELECT
          CAST(SUM(CASE WHEN tv IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) s1,
          CAST(SUM(CASE WHEN tv IS NOT NULL AND tc IS NOT NULL AND tv < tc
                   THEN 1 ELSE 0 END) AS BIGINT) s2,
          CAST(SUM(CASE WHEN tv IS NOT NULL AND tc IS NOT NULL
                    AND tp IS NOT NULL AND tv < tc AND tc < tp
                   THEN 1 ELSE 0 END) AS BIGINT) s3
        FROM mt)
      SELECT '1_view' AS step, s1 AS n_users FROM agg
      UNION ALL SELECT '2_click', s2 FROM agg
      UNION ALL SELECT '3_purchase', s3 FROM agg
      ORDER BY step""")),

    // retention cohort matrix: users bucketed by first-active day,
    // distinct actives per (cohort, day offset) — the classic
    // triangle, bounded |days|² rows; offset 0 is the cohort size.
    // Two keyed shuffles (first-day per user, cohort-offset rollup)
    Q("q130_retention_cohorts", (s, d) => {
      val du = t(s, d, "events")
        .select(datediff(to_date(col("ts")), lit("2024-01-01")).as("d"),
          col("user_id"))
        .distinct()
      val first = du.groupBy(col("user_id")).agg(min(col("d")).as("cohort"))
      du.join(first, "user_id")
        .groupBy(col("cohort"), (col("d") - col("cohort")).as("day_offset"))
        .agg(count(lit(1)).as("n_active"))
        .select(col("cohort").cast("long").as("cohort"),
          col("day_offset").cast("long").as("day_offset"), col("n_active"))
        .orderBy(col("cohort"), col("day_offset"))
    }, Some("""
      WITH du AS (SELECT DISTINCT
                    date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) d,
                    user_id
                  FROM events),
      first AS (SELECT user_id, min(d) cohort FROM du GROUP BY 1)
      SELECT CAST(cohort AS BIGINT) AS cohort,
        CAST(d - cohort AS BIGINT) AS day_offset,
        CAST(count(*) AS BIGINT) AS n_active
      FROM du JOIN first USING (user_id)
      GROUP BY 1, 2 ORDER BY 1, 2""")),

    // burst detection — the brute-force/bot heuristic of the
    // reference's log-analytics domain: each user's peak event count
    // inside any trailing 10-minute window, via a per-user RANGE
    // frame over epoch seconds (equal-second events share a frame —
    // identical semantics both engines; flag threshold ≥ 2 calibrated
    // to this corpus: 91/150 users at sf0.01). The user-partitioned
    // window is the honest shape: per-user event counts are bounded,
    // so no partition is a skew risk (the q75 caveat applies to
    // corpus-wide keys, not per-entity timelines)
    Q("q131_burst_detection", (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("user_id")).orderBy(col("sec"))
        .rangeBetween(-599L, 0L)
      t(s, d, "events")
        .select(col("user_id"), unix_timestamp(col("ts")).as("sec"))
        .withColumn("b", count(lit(1)).over(w))
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_events"), max(col("b")).as("peak_burst"))
        .withColumn("is_burst", col("peak_burst") >= 2L)
        .orderBy(col("user_id"))
    }, Some("""
      WITH e AS (SELECT user_id, epoch_ms(ts)//1000 sec FROM events),
      w AS (SELECT user_id,
              CAST(count(*) OVER (PARTITION BY user_id ORDER BY sec
                RANGE BETWEEN 599 PRECEDING AND CURRENT ROW) AS BIGINT) b
            FROM e)
      SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
        CAST(MAX(b) AS BIGINT) AS peak_burst,
        (MAX(b) >= 2) AS is_burst
      FROM w GROUP BY 1 ORDER BY 1"""))
  )
}
