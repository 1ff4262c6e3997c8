package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Gap-based sessionization — the canonical custom-state streaming
  * operator (`flatMapGroupsWithState`), covering what neither the
  * reference's key-side time bucketing nor Spark's fixed `window()`
  * can express: a session ends when a key is quiet for `gap`, not at
  * a wall-clock boundary.
  *
  * State per key is O(1) (open-session bounds + count), the state
  * store evicts via event-time timeout against the watermark, and
  * emission happens exactly once per closed session — the shape that
  * holds at an unbounded 100 TB/day key space. The same function
  * sessionizes a batch Dataset (Spark runs flatMapGroupsWithState in
  * batch mode too), which is how the spec cross-checks it.
  */
object Sessionize {

  final case class Event(key: String, ts: Timestamp)
  final case class Session(key: String, start: Timestamp, end: Timestamp, events: Long)

  /** O(1) per-key open-session state (public: the state Encoder's
    * generated code must construct it). */
  final case class Open(start: Long, end: Long, n: Long)

  /** Close-out logic shared by timeout and in-batch gap detection. */
  private def step(gapMs: Long)(
      key: String,
      events: Iterator[Event],
      state: GroupState[Open]): Iterator[Session] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Session]
    if (state.hasTimedOut) {
      val s = state.get
      out += Session(key, new Timestamp(s.start), new Timestamp(s.end), s.n)
      state.remove()
    } else {
      var cur = state.getOption.orNull
      for (e <- events.toSeq.sortBy(_.ts.getTime)) {
        val t = e.ts.getTime
        if (cur == null) cur = Open(t, t, 1L)
        else if (t - cur.end <= gapMs) cur = Open(cur.start, math.max(cur.end, t), cur.n + 1)
        else {
          out += Session(key, new Timestamp(cur.start), new Timestamp(cur.end), cur.n)
          cur = Open(t, t, 1L)
        }
      }
      if (cur != null) {
        state.update(cur)
        // close when no event arrives within gap of the session end
        // (fires once the watermark passes end+gap)
        state.setTimeoutTimestamp(cur.end + gapMs)
      }
    }
    out.iterator
  }

  /** Streaming sessionization: requires a watermark on `ts` upstream;
    * emits each session once, when the watermark passes its close. */
  def sessions(events: Dataset[Event], gapMs: Long): Dataset[Session] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .groupByKey(_.key)
      .flatMapGroupsWithState[Open, Session](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(step(gapMs))
  }

  /** Batch sessionization over any keyed DataFrame, key type
    * preserved — long keys window/group as longs (the typed path's
    * String contract forced a cast-to-string that made the sort/hash
    * of every event row a string comparison; at 100× events that cast
    * dominated, and nothing in the algorithm needs it). Output:
    * (keyCol, start, end, events). */
  def sessionsBatchDF(df: org.apache.spark.sql.DataFrame,
                      keyCol: String, tsCol: String, gapMs: Long)
      : org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol))
    df
      .withColumn("__prev", lag(col(tsCol), 1).over(w))
      .withColumn("__ns",
        // millisecond precision to match the stateful path's
        // Timestamp.getTime (cast("long") truncates to whole seconds,
        // which can disagree on sub-second gaps near the threshold)
        when(col("__prev").isNull ||
          unix_millis(col(tsCol)) - unix_millis(col("__prev")) > gapMs, 1L)
          .otherwise(0L))
      .withColumn("__sid", sum(col("__ns")).over(
        w.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col(keyCol), col("__sid"))
      .agg(min(col(tsCol)).as("start"), max(col(tsCol)).as("end"),
        count(lit(1)).as("events"))
      .select(col(keyCol), col("start"), col("end"), col("events"))
  }

  /** Batch equivalent via plain window functions — the differential
    * oracle for the stateful path (same semantics, no state store). */
  def sessionsBatch(events: Dataset[Event], gapMs: Long): Dataset[Session] = {
    val spark = events.sparkSession
    import spark.implicits._
    sessionsBatchDF(events.toDF(), "key", "ts", gapMs)
      .select(col("key"), col("start"), col("end"), col("events"))
      .as[Session]
  }
}
