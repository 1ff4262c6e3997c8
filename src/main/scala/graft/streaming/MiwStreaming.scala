package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.miw.{LogFormat, MiwEngine}

/** Structured Streaming front-end for the MIW engine.
  *
  * The reference's `-merge_results` loop (miw/job.cc:197-226) re-emits
  * previously reduced state into each new file's map phase — an
  * incremental re-aggregation. Structured Streaming's stateful
  * aggregation IS that loop, distributed and fault-tolerant: the state
  * store holds the running per-key aggregates, each micro-batch merges
  * new lines in, and `outputMode("update")` emits refreshed rows —
  * the snapshot-after-each-file behavior (mr_job.h:147-177) falls out
  * of `foreachBatch`.
  *
  * `parse` is reused verbatim from the batch engine: every per-row
  * transform (tokenize, casts, bucketing, matches) is
  * streaming-compatible by construction. Only the aggregation differs:
  * streaming supports the monoid aggs (count/sum/max/min/mean);
  * collect-style aggs (union/union_count) need `flatMapGroupsWithState`
  * and are intentionally not offered here — at 100 TB/day you do not
  * want unbounded per-key sets in the state store.
  */
object MiwStreaming {

  /** Running keyed aggregation over a (possibly unbounded) line
    * stream; same plan shape as the batch `MiwEngine.aggregate` minus
    * collect-style aggs and output-time sorting. */
  def aggregateStream(fmt: LogFormat, lines: DataFrame): DataFrame = {
    val parsed = MiwEngine.parse(fmt, lines)
    val aggs = scala.collection.mutable.ArrayBuffer.empty[org.apache.spark.sql.Column]
    aggs += count(lit(1)).as("logs")
    for (f <- fmt.resolvedFields if f.aggregation != "ratio") {
      val c = col("`" + f.name + "`")
      if (f.filterType == "contain") aggs += sum(c).as(f.name)
      else if (!f.aggregated || f.aggregation.isEmpty) aggs += min(c).as(f.name)
      else f.aggregation match {
        case "sum"  => aggs += sum(c).as(f.name)
        case "max"  => aggs += max(c).as(f.name)
        case "mean" => aggs += (sum(c).cast("double") / count(c)).as(f.name)
        case _      => aggs += min(c).as(f.name)
      }
    }
    parsed.groupBy(col("__miw_key").as("id"))
      .agg(aggs.head, aggs.tail.toSeq: _*)
  }

  /** Event-time tumbling-window variant with a watermark: the
    * streaming-native answer to the reference's key-side time
    * bucketing (date/time `processing`) — late data beyond the
    * watermark is dropped and state for closed windows is evicted,
    * which is what bounds state at scale. */
  def windowedAggregateStream(
      fmt: LogFormat,
      lines: DataFrame,
      tsField: String,
      window: String,
      watermark: String): DataFrame = {
    val parsed = MiwEngine.parse(fmt, lines)
      .withColumn("__ts", to_timestamp(col(tsField)))
      .withWatermark("__ts", watermark)
    parsed
      .groupBy(org.apache.spark.sql.functions.window(col("__ts"), window).as("win"),
        col("__miw_key").as("id"))
      .agg(count(lit(1)).as("logs"))
      .select(col("win.start").as("window_start"), col("id"), col("logs"))
  }

  /** File-source convenience: stream text files appearing under `dir`
    * through the format pipeline (the unbounded version of the CLI's
    * multi-file loop). */
  def runOnDirectory(spark: org.apache.spark.sql.SparkSession, fmt: LogFormat,
                     dir: String): DataFrame =
    aggregateStream(fmt, spark.readStream.text(dir))

  /** Streaming HTTP push: each micro-batch's refreshed rows POST to
    * `url` as JSON-array batches via [[graft.miw.HttpSink]] — the
    * streaming analog of the reference's per-file Solr commit loop
    * (app/solr_commit.cc): continuous export instead of batch-and-
    * script. Returns a handle whose per-batch PushResults accumulate
    * in `results` (driver-side, one small record per micro-batch). */
  def pushStream(aggregated: DataFrame, url: String, batchSize: Int = 1000)
      : (org.apache.spark.sql.streaming.StreamingQuery,
         java.util.concurrent.ConcurrentLinkedQueue[graft.miw.HttpSink.PushResult]) = {
    val results =
      new java.util.concurrent.ConcurrentLinkedQueue[graft.miw.HttpSink.PushResult]()
    val q = aggregated.writeStream
      .outputMode("update")
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
                       _: Long) =>
        results.add(graft.miw.HttpSink.push(batch.toDF(), url, batchSize))
        ()
      }
      .start()
    (q, results)
  }
}
