package graft.miw

import java.net.{HttpURLConnection, URL}

import scala.util.control.NonFatal

import org.apache.spark.sql.DataFrame

/** HTTP push sink — the reference's Solr committer re-expressed for a
  * cluster (reference: app/solr_commit.cc:100-141 batches a map
  * split's JSON records into one `[...]` POST via curl;
  * :196-226 reduces per-split SUCCEED/FAILED counters into the job
  * result; app/curl_mget.cc:74-130 is the transport).
  *
  * Spark shape: `foreachPartition` — one executor-side loop per
  * partition, rows batched into JSON-array POST bodies of at most
  * `batchSize` records (the reference's "split" granularity becomes
  * the partition, its whole-split body becomes a bounded batch so a
  * big partition can't build an unbounded string). Success/failure
  * counts flow back through `LongAccumulator`s — the distributed
  * analog of the reference's SUCCEED/FAILED map-emit keys. No
  * driver-side collect: 100 TB of results stream straight from
  * executors to the endpoint, and the endpoint fan-in is bounded by
  * the number of concurrent tasks.
  */
object HttpSink {

  /** Job-level outcome: number of POST batches that returned 200 vs
    * not (the reference counts splits the same way). */
  final case class PushResult(succeeded: Long, failed: Long) {
    def batches: Long = succeeded + failed
  }

  /** POST one body; returns true iff HTTP 200 (solr_commit.cc:130-137:
    * any transport error or non-200 counts as a failed batch). */
  private def post(url: String, body: Array[Byte], contentType: String,
                   connectTimeoutMs: Int, readTimeoutMs: Int): Boolean =
    try {
      val conn = new URL(url).openConnection().asInstanceOf[HttpURLConnection]
      conn.setRequestMethod("POST")
      conn.setConnectTimeout(connectTimeoutMs)
      conn.setReadTimeout(readTimeoutMs)
      conn.setDoOutput(true)
      conn.setFixedLengthStreamingMode(body.length)
      conn.setRequestProperty("Content-Type", contentType)
      val out = conn.getOutputStream
      try out.write(body) finally out.close()
      val code = conn.getResponseCode
      // drain so the connection can be reused by the JVM's keep-alive pool
      val in = if (code >= 400) conn.getErrorStream else conn.getInputStream
      if (in != null) try { while (in.read() != -1) () } finally in.close()
      code == 200
    } catch { case NonFatal(_) => false }

  /** Push a result DataFrame as JSON-array batches (reference body
    * shape: `[rec,rec,…]`, `Content-Type: application/json`). Blocks
    * until the job finishes; returns the batch success/fail counts. */
  def push(df: DataFrame, url: String, batchSize: Int = 1000,
           connectTimeoutMs: Int = 300000, readTimeoutMs: Int = 300000): PushResult = {
    require(batchSize > 0, "batchSize must be positive")
    val sc = df.sparkSession.sparkContext
    val succ = sc.longAccumulator("http_sink_succeeded")
    val fail = sc.longAccumulator("http_sink_failed")
    Output.jsonLines(df).foreachPartition { it: Iterator[String] =>
      it.grouped(batchSize).foreach { batch =>
        val body = batch.mkString("[", ",", "]").getBytes("UTF-8")
        if (post(url, body, "application/json", connectTimeoutMs, readTimeoutMs))
          succ.add(1)
        else fail.add(1)
      }
    }
    PushResult(succ.value, fail.value)
  }

  /** Reference-style summary line (solr_commit.cc print_top). */
  def summary(r: PushResult): String =
    s"solr_commit: results (SUCCEED ${r.succeeded}, FAILED ${r.failed} of ${r.batches} batches)"
}
