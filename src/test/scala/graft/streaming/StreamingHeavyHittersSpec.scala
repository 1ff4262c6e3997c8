package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.functions.HeavyHitters

/** The Misra–Gries Aggregator is mergeable, so it drops straight into
  * a streaming groupBy in complete mode: per micro-batch the state
  * store keeps one O(k) summary per group and merges each new batch's
  * partials into it — the "top talkers over an unbounded stream"
  * monitoring shape with bounded state, no shuffle of raw history.
  * The spec drives batches through MemoryStream and checks the
  * streamed summary equals the batch run over the same rows (exact
  * regime: k above key cardinality) and respects the MG bounds in the
  * sketchy regime (small k).
  */
class StreamingHeavyHittersSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("streaming MG summary equals batch over the same rows (exact regime)") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val in = MemoryStream[(String, String)]
    val agg = in.toDF().toDF("g", "v")
      .groupBy(col("g")).agg(HeavyHitters(col("v"), 100).as("hh"))
    val q = agg.writeStream.format("memory").queryName("hh_stream")
      .outputMode("complete").start()
    val batch1 = Seq(("a", "x"), ("a", "x"), ("a", "y"), ("b", "z"))
    val batch2 = Seq(("a", "x"), ("b", "z"), ("b", "w"), ("a", "q"))
    try {
      in.addData(batch1: _*)
      q.processAllAvailable()
      in.addData(batch2: _*)
      q.processAllAvailable()
      val streamed = spark.table("hh_stream").collect()
        .map(r => r.getString(0) -> r.getAs[Map[String, Long]]("hh")).toMap
      val batch = (batch1 ++ batch2).toDF("g", "v")
        .groupBy(col("g")).agg(HeavyHitters(col("v"), 100).as("hh"))
        .collect().map(r => r.getString(0) -> r.getAs[Map[String, Long]]("hh")).toMap
      assert(streamed == batch)
      assert(streamed("a") == Map("x" -> 3L, "y" -> 1L, "q" -> 1L))
    } finally q.stop()
  }

  test("sketch regime across batches: bounded state, MG guarantees hold") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val in = MemoryStream[String]
    val k = 8
    val agg = in.toDF().toDF("v")
      .agg(HeavyHitters(col("v"), k).as("hh"))
    val q = agg.writeStream.format("memory").queryName("hh_sketch")
      .outputMode("complete").start()
    // hot key in every batch + churning cold keys
    val batches = (0 until 5).map(b =>
      Seq.fill(40)("hot") ++ (0 until 30).map(i => s"cold_${b}_$i"))
    try {
      batches.foreach { rows => in.addData(rows: _*); q.processAllAvailable() }
      val got = spark.table("hh_sketch").collect().head
        .getAs[Map[String, Long]]("hh")
      val n = batches.map(_.size).sum.toLong
      assert(got.size <= k, s"state exceeded k: ${got.size}")
      // "hot" (200 of 350) is far above n/(k+1) ≈ 39: must be present,
      // underestimated by at most n/(k+1)
      assert(got.contains("hot"))
      assert(got("hot") <= 200L && 200L - got("hot") <= n / (k + 1))
    } finally q.stop()
  }
}
