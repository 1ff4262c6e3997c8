package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

class SessionizeSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def ts(m: Int, s: Int = 0) =
    Timestamp.valueOf(f"2024-01-01 10:$m%02d:$s%02d")

  test("batch sessionization splits on gaps > threshold") {
    import spark.implicits._
    val ev = Seq(
      Sessionize.Event("a", ts(0)), Sessionize.Event("a", ts(2)),
      Sessionize.Event("a", ts(9)), // 7-min gap -> new session
      Sessionize.Event("b", ts(1))).toDS()
    val out = Sessionize.sessionsBatch(ev, gapMs = 5 * 60 * 1000)
      .collect().sortBy(r => (r.key, r.start.getTime))
    assert(out.map(s => (s.key, s.events)).toSeq == Seq(("a", 2L), ("a", 1L), ("b", 1L)))
    assert(out.head.start == ts(0) && out.head.end == ts(2))
  }

  test("stateful streaming sessionization matches the batch oracle") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val in = MemoryStream[Sessionize.Event]
    val withWm = in.toDS()
      .withWatermark("ts", "0 seconds")
    val q = Sessionize.sessions(withWm.as[Sessionize.Event], gapMs = 5 * 60 * 1000)
      .writeStream.format("memory").queryName("sessions")
      .outputMode("append").start()
    try {
      in.addData(
        Sessionize.Event("a", ts(0)), Sessionize.Event("a", ts(2)),
        Sessionize.Event("b", ts(1)))
      q.processAllAvailable()
      // events far past the close boundary advance the watermark so the
      // first sessions time out and emit
      in.addData(Sessionize.Event("a", ts(30)), Sessionize.Event("b", ts(30)))
      q.processAllAvailable()
      in.addData(Sessionize.Event("a", ts(59)))
      q.processAllAvailable()
      val got = spark.table("sessions").as[Sessionize.Session].collect()
        .map(s => (s.key, s.start.toString.take(16), s.events)).toSet
      assert(got.contains(("a", "2024-01-01 10:00", 2L)))
      assert(got.contains(("b", "2024-01-01 10:01", 1L)))
      assert(got.contains(("a", "2024-01-01 10:30", 1L)))
    } finally q.stop()
  }

  test("untyped long-key batch path equals the typed string-key path") {
    import spark.implicits._
    val rows = Seq(
      (7L, ts(0)), (7L, ts(2)), (7L, ts(20)), (8L, ts(1)), (8L, ts(3)))
    val df = rows.toDF("user_id", "ts")
    val viaLong = Sessionize
      .sessionsBatchDF(df, "user_id", "ts", gapMs = 5 * 60 * 1000)
      .collect()
      .map(r => (r.getLong(0).toString, r.getTimestamp(1), r.getTimestamp(2),
        r.getLong(3))).toSet
    val typed = Sessionize.sessionsBatch(
      df.select(col("user_id").cast("string").as("key"), col("ts"))
        .as[Sessionize.Event], gapMs = 5 * 60 * 1000)
      .collect().map(s => (s.key, s.start, s.end, s.events)).toSet
    assert(viaLong == typed)
    assert(viaLong.size == 3) // key 7 splits on the 18-min gap
  }
}
