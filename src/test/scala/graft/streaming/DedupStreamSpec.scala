package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

class DedupStreamSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def ts(m: Int) = Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")

  test("exact streaming dedup keeps first occurrence across batches") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val in = MemoryStream[(Long, Timestamp, String)]
    val df = in.toDF().toDF("doc_id", "ts", "text")
    val q = DedupStream.dedupExact(df, "ts", "text", watermark = "1 hour")
      .writeStream.format("memory").queryName("dedup_exact")
      .outputMode("append").start()
    try {
      in.addData((1L, ts(0), "alpha beta"), (2L, ts(1), "gamma"))
      q.processAllAvailable()
      in.addData((3L, ts(2), "alpha beta"), (4L, ts(3), "delta")) // 3 is a dup
      q.processAllAvailable()
      val ids = spark.table("dedup_exact").collect().map(_.getAs[Long]("doc_id")).sorted
      assert(ids.toSeq == Seq(1L, 2L, 4L))
    } finally q.stop()
  }

  test("minhash signature dedup suppresses near-identical docs") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val base = (1 to 20).map(i => s"tok$i").mkString(" ")
    val in = MemoryStream[(Long, Timestamp, String)]
    val df = in.toDF().toDF("doc_id", "ts", "text")
    val q = DedupStream.dedupMinhash(df, "ts", "text", watermark = "1 hour")
      .writeStream.format("memory").queryName("dedup_mh")
      .outputMode("append").start()
    try {
      in.addData((1L, ts(0), base))
      q.processAllAvailable()
      // identical shingle SET (signature collision) vs genuinely different
      in.addData((2L, ts(1), base), (3L, ts(2), "completely different words here now"))
      q.processAllAvailable()
      val ids = spark.table("dedup_mh").collect().map(_.getAs[Long]("doc_id")).sorted
      assert(ids.toSeq == Seq(1L, 3L))
    } finally q.stop()
  }
}
