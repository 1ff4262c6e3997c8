package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.functions.{ExactCols, KmvSketch}

/** The KMV Aggregator is mergeable (union + re-cap), so it drops
  * straight into a streaming groupBy in complete mode — "distinct
  * users over an unbounded stream" with O(k) state per group. Because
  * the k-minimum set is a pure function of the input multiset, the
  * streamed estimate equals the batch run EXACTLY in both regimes —
  * not just within bounds (the q156 merge-order-independence property
  * carried over micro-batch boundaries). */
class StreamingKmvSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def batches: Seq[Seq[(String, String)]] = {
    val all = (1 to 900).map(i => (s"g${i % 3}", s"user_${i % 450}"))
    all.grouped(300).toSeq
  }

  test("streaming KMV equals batch exactly — exact regime and sketch tier") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    for (k <- Seq(32, 1000)) { // sketch tier and exact-capacity tier
      val in = MemoryStream[(String, String)]
      val agg = in.toDF().toDF("g", "v")
        .select(col("g"), ExactCols.h60(col("v")).as("h"))
        .groupBy(col("g")).agg(KmvSketch(col("h"), k).as("n"))
      val q = agg.writeStream.format("memory").queryName(s"kmv_$k")
        .outputMode("complete").start()
      try {
        batches.foreach { b => in.addData(b: _*); q.processAllAvailable() }
        val streamed = spark.table(s"kmv_$k").collect()
          .map(r => r.getString(0) -> r.getAs[Long]("n")).toMap
        val batch = batches.flatten.toDF("g", "v")
          .select(col("g"), ExactCols.h60(col("v")).as("h"))
          .groupBy(col("g")).agg(KmvSketch(col("h"), k).as("n"))
          .collect().map(r => r.getString(0) -> r.getAs[Long]("n")).toMap
        assert(streamed == batch, s"k=$k")
        if (k == 1000) // above cardinality: exact distinct counts
          assert(streamed.values.toSeq.sorted == Seq(150L, 150L, 150L))
      } finally q.stop()
    }
  }
}
