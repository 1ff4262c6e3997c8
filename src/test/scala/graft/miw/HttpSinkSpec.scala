package graft.miw

import java.net.InetSocketAddress
import java.util.concurrent.ConcurrentLinkedQueue

import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** HTTP push sink against an in-process stub server: batch bodies must
  * be JSON arrays of the jsonLines records, and the SUCCEED/FAILED
  * batch counts must match the reference's semantics (any non-200 or
  * transport error = one failed batch, app/solr_commit.cc:130-137). */
class HttpSinkSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  /** Starts a stub on an ephemeral port; hands (url, bodies) to f. */
  private def withServer(status: Int)(f: (String, ConcurrentLinkedQueue[String]) => Unit): Unit = {
    val bodies = new ConcurrentLinkedQueue[String]()
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/update", new HttpHandler {
      override def handle(ex: HttpExchange): Unit = {
        val body = new String(ex.getRequestBody.readAllBytes(), "UTF-8")
        bodies.add(body)
        val resp = "{}".getBytes("UTF-8")
        ex.sendResponseHeaders(status, resp.length.toLong)
        ex.getResponseBody.write(resp)
        ex.close()
      }
    })
    server.start()
    try f(s"http://127.0.0.1:${server.getAddress.getPort}/update", bodies)
    finally server.stop(0)
  }

  private def sampleDf = {
    import spark.implicits._
    (1 to 7).map(i => (s"k$i", i.toLong)).toDF("id", "logs").coalesce(1)
  }

  test("POSTs JSON-array batches of jsonLines records; counts succeed") {
    withServer(200) { (url, bodies) =>
      val r = HttpSink.push(sampleDf, url, batchSize = 3)
      // 7 rows in 1 partition at batch 3 → 3 batches, all 200
      assert(r == HttpSink.PushResult(3, 0))
      val got = bodies.toArray(Array.empty[String]).toSeq
      assert(got.size == 3)
      // every body is a well-formed JSON array wrapping jsonLines rows
      got.foreach(b => assert(b.startsWith("[") && b.endsWith("]")))
      val expected = Output.jsonLines(sampleDf).collect().toSet
      val posted = got.flatMap { b =>
        // records contain no nested braces here: split on "},{"
        b.stripPrefix("[").stripSuffix("]").split("(?<=\\}),(?=\\{)").toSeq
      }.toSet
      assert(posted == expected)
      assert(HttpSink.summary(r).contains("SUCCEED 3, FAILED 0"))
    }
  }

  test("non-200 responses count as failed batches") {
    withServer(500) { (url, bodies) =>
      val r = HttpSink.push(sampleDf, url, batchSize = 100)
      assert(r == HttpSink.PushResult(0, 1))
      assert(bodies.size == 1)
    }
  }

  test("unreachable endpoint counts transport failures, does not throw") {
    val r = HttpSink.push(sampleDf, "http://127.0.0.1:1/update",
      batchSize = 2, connectTimeoutMs = 500, readTimeoutMs = 500)
    assert(r == HttpSink.PushResult(0, 4)) // ceil(7/2) batches, all failed
  }

  test("CLI -output_format solr wires url and batch size") {
    val a = MiwCli.parseArgs(Array(
      "-fnames", "x", "-format_name", "y", "-output_format", "solr",
      "-solr_url", "http://h:1/u", "-solr_batch_size", "17"))
    assert(a.outputFormat == "solr")
    assert(a.solrUrl == "http://h:1/u")
    assert(a.solrBatchSize == 17)
  }
}
