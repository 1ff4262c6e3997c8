package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming event analytics — the ingest-side face of the q128
  * rolling-active-users gate. The batch formulation (explode each
  * (day, user) observation into its `windowDays` target days, then
  * count DISTINCT users per target day) maps onto Structured
  * Streaming's two supported stateful primitives directly:
  * `dropDuplicates` carries the DISTINCT (state = one row per live
  * (target_day, user) pair, bounded by days × users) and a plain
  * count aggregate carries the rollup — no unsupported streaming
  * `count(DISTINCT)` anywhere.
  *
  * Production note: cap state with `withWatermark` on the event time
  * before the dedup so closed days age out; the parity spec runs
  * complete-mode without a watermark because the fixture replays a
  * bounded corpus.
  */
object EventStream {

  /** Distinct active users per day over a trailing `windowDays`
    * window: `windowDays = 1` is DAU, `7` the q128 WAU. Emits
    * (day, active) with day = integer offset from 2024-01-01 (the
    * q11/q128 pinned-UTC convention). Target days beyond the
    * observed range are emitted too (the stream cannot know the
    * future); the batch gate's observed-days filter is applied by
    * the consumer. */
  def activeUsersStream(events: DataFrame, windowDays: Int): DataFrame = {
    require(windowDays >= 1, s"windowDays out of range: $windowDays")
    events
      .select(datediff(to_date(col("ts")), lit("2024-01-01")).as("d"),
        col("user_id"))
      .select(explode(expr(s"sequence(d, d + ${windowDays - 1})")).as("day"),
        col("user_id"))
      .dropDuplicates("day", "user_id")
      .groupBy(col("day"))
      .agg(count(lit(1)).as("active"))
      .select(col("day").cast("long").as("day"), col("active"))
  }
}
