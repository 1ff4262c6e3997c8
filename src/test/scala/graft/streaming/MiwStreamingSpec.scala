package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.miw.LogFormat

/** Incremental (streaming) aggregation = the reference's
  * -merge_results loop (miw/job.cc:197-226): state carries across
  * batches and per-key aggregates are re-merged as new lines arrive. */
class MiwStreamingSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private val sumFmt = LogFormat.parse(
    """{"format_name":"t","delims":",","fields":[
        {"name":"k","pos":0,"type":"string","key":true},
        {"name":"v","pos":1,"type":"int","aggregated":true,"aggregation":"sum"}]}""")

  test("keyed aggregation state merges across micro-batches") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val in = MemoryStream[String]
    val q = MiwStreaming.aggregateStream(sumFmt, in.toDF())
      .writeStream.format("memory").queryName("miw_inc")
      .outputMode("complete").start()
    try {
      in.addData("a,1", "a,2", "b,10")
      q.processAllAvailable()
      val r1 = spark.table("miw_inc").collect()
        .map(r => r.getAs[String]("id") -> r.getAs[Long]("v")).toMap
      assert(r1 == Map("a" -> 3L, "b" -> 10L))

      // second file/chunk arrives: previous state is re-merged, not reset
      in.addData("a,4", "c,7")
      q.processAllAvailable()
      val r2 = spark.table("miw_inc").collect()
        .map(r => r.getAs[String]("id") -> r.getAs[Long]("v")).toMap
      assert(r2 == Map("a" -> 7L, "b" -> 10L, "c" -> 7L))
      val logs = spark.table("miw_inc").collect()
        .map(r => r.getAs[String]("id") -> r.getAs[Long]("logs")).toMap
      assert(logs == Map("a" -> 3L, "b" -> 1L, "c" -> 1L))
    } finally q.stop()
  }

  test("foreachBatch snapshots partial state per batch (the -tmp_save analog)") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val in = MemoryStream[String]
    val snapDir = java.nio.file.Files.createTempDirectory("miwsnap").toFile
    val q = MiwStreaming.aggregateStream(sumFmt, in.toDF())
      .writeStream
      .outputMode("complete")
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
                       id: Long) =>
        // timestamped CSV of the running state after each file/chunk
        // (reference: mr_job.h:147-177), rendered by the reference-
        // format CSV sink
        val lines = graft.miw.Output.csvLines(batch.toDF()).collect()
        val w = new java.io.PrintWriter(new java.io.File(snapDir, s"snap_$id.csv"))
        try { w.println(graft.miw.Output.csvHeader(batch.toDF())); lines.foreach(w.println) }
        finally w.close()
      }
      .start()
    try {
      in.addData("a,1", "a,2")
      q.processAllAvailable()
      in.addData("a,4")
      q.processAllAvailable()
      val snaps = snapDir.listFiles().map(_.getName).sorted
      assert(snaps.length >= 2, snaps.mkString(","))
      val last = scala.io.Source.fromFile(
        new java.io.File(snapDir, snaps.last)).getLines().toSeq
      assert(last.head == "id,k,logs,v")
      assert(last.tail.contains("\"a\",\"a\",3,7"))
    } finally q.stop()
  }

  test("file-source stream: files appearing in a directory feed the pipeline") {
    val dir = java.nio.file.Files.createTempDirectory("miwstream").toFile
    def writeFile(name: String, s: String): Unit = {
      val w = new java.io.PrintWriter(new java.io.File(dir, name))
      try w.print(s) finally w.close()
    }
    writeFile("f1.log", "a,1\na,2\n")
    val q = MiwStreaming.runOnDirectory(spark, sumFmt, dir.getPath)
      .writeStream.format("memory").queryName("miw_files")
      .outputMode("complete").start()
    try {
      q.processAllAvailable()
      assert(spark.table("miw_files").collect()
        .map(r => r.getAs[String]("id") -> r.getAs[Long]("v")).toMap == Map("a" -> 3L))
      writeFile("f2.log", "a,10\nb,5\n")
      q.processAllAvailable()
      assert(spark.table("miw_files").collect()
        .map(r => r.getAs[String]("id") -> r.getAs[Long]("v")).toMap ==
        Map("a" -> 13L, "b" -> 5L))
    } finally q.stop()
  }

  test("event-time tumbling window with watermark") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val fmt = LogFormat.parse(
      """{"format_name":"t","delims":",","fields":[
          {"name":"ts","pos":0,"type":"string"},
          {"name":"k","pos":1,"type":"string","key":true}]}""")
    val in = MemoryStream[String]
    val q = MiwStreaming.windowedAggregateStream(fmt, in.toDF(),
        tsField = "ts", window = "10 minutes", watermark = "1 hour")
      .writeStream.format("memory").queryName("miw_win")
      .outputMode("complete").start()
    try {
      in.addData(
        "2024-01-01 10:03:00,a", "2024-01-01 10:07:00,a",
        "2024-01-01 10:13:00,a", "2024-01-01 10:04:00,b")
      q.processAllAvailable()
      val rows = spark.table("miw_win").collect()
        .map(r => (r.getAs[java.sql.Timestamp]("window_start").toString.take(16),
          r.getAs[String]("id")) -> r.getAs[Long]("logs")).toMap
      assert(rows == Map(
        ("2024-01-01 10:00", "a") -> 2L,
        ("2024-01-01 10:10", "a") -> 1L,
        ("2024-01-01 10:00", "b") -> 1L))
    } finally q.stop()
  }

  test("streaming HTTP push posts each micro-batch's refreshed rows") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val bodies = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/update", new com.sun.net.httpserver.HttpHandler {
      override def handle(ex: com.sun.net.httpserver.HttpExchange): Unit = {
        bodies.add(new String(ex.getRequestBody.readAllBytes(), "UTF-8"))
        ex.sendResponseHeaders(200, 2L)
        ex.getResponseBody.write("{}".getBytes("UTF-8"))
        ex.close()
      }
    })
    server.start()
    val url = s"http://127.0.0.1:${server.getAddress.getPort}/update"
    val in = MemoryStream[String]
    val (q, results) = MiwStreaming.pushStream(
      MiwStreaming.aggregateStream(sumFmt, in.toDF()), url)
    try {
      in.addData("a,1", "b,2")
      q.processAllAvailable()
      in.addData("a,4")
      q.processAllAvailable()
      // every batch POSTed successfully and the updated key rode along
      val rs = results.toArray(Array.empty[graft.miw.HttpSink.PushResult])
      assert(rs.nonEmpty && rs.forall(r => r.failed == 0 && r.succeeded >= 1))
      val all = bodies.toArray(Array.empty[String]).mkString
      assert(all.contains("\"id\":\"a\"") && all.contains("\"v\":5"))
    } finally { q.stop(); server.stop(0) }
  }
}
