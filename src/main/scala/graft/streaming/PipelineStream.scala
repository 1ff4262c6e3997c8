package graft.streaming

import org.apache.spark.sql.DataFrame

import graft.queries.Pipeline

/** Streaming forms of the corpus-preparation gate operators — the
  * two a streaming ingest actually runs continuously (the rest of
  * the q71–q76 suite is inherently corpus-wide: block dedup and
  * decontamination need the full corpus on both sides).
  *
  * Both reuse the EXACT batch plan functions from
  * [[graft.queries.Pipeline]] — that equivalence is the point, and
  * it is only possible because those aggregations were designed as
  * monoid sums from the start (order-independent partial aggregation
  * is simultaneously what makes them partition-safe at 100 TB in
  * batch AND incrementally updatable under Structured Streaming).
  * PipelineStreamSpec proves batch ≡ stream end-to-end on fixture
  * data fed in multiple micro-batches.
  *
  * State bounds (the 100 TB/day question):
  *  - PII audit: one state row per segment key — O(|segments|),
  *    independent of stream length.
  *  - Funnel: ONE global state row of 12 longs — O(1). The stack()
  *    unpivot stays OUT of the streaming plan (a Generate after a
  *    streaming aggregation is not incrementally executable);
  *    consumers unpivot the wide row with
  *    [[graft.queries.Pipeline.funnelTable]] on the sink side.
  *
  * Run both with `outputMode("complete")` (or `update`): the
  * aggregates are monoids, so Spark's state store merges each
  * micro-batch's partials exactly like batch partial aggregation
  * merges map-side partials.
  */
object PipelineStream {

  /** Per-segment PII hit counts + redacted-text checksum over an
    * unbounded feed. `rows` is a streaming DataFrame; output carries
    * the same columns as gate q71 (n, n_hits, redacted_sum keyed by
    * `segCol`). */
  def piiAuditStream(rows: DataFrame, segCol: String, nameCol: String): DataFrame =
    Pipeline.piiAudit(rows, segCol, nameCol)

  /** Cumulative Gopher-funnel statistics (one wide row: d0..d5 docs,
    * t0..t5 tokens per stage) over an unbounded document feed. */
  def funnelStatsStream(docs: DataFrame, textCol: String): DataFrame =
    Pipeline.funnelStats(docs, textCol)
}
