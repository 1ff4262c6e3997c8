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
      FROM sess GROUP BY 1 ORDER BY 1"""))
  )
}
