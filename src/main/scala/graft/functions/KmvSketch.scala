package graft.functions

import org.apache.spark.sql.{Column, DataFrame, Encoder}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Mergeable KMV sketch state. Public case class: flatMapGroupsWithState
  * / Aggregator encoder codegen constructs it reflectively.
  *
  * `hs` holds candidate hashes (all of them while un-saturated; after a
  * compaction, a superset of the k smallest seen); `sat` records that a
  * compaction has discarded values, i.e. the count is no longer exact. */
final case class KmvState(hs: Set[Long], sat: Boolean)

/** k-minimum-values distinct-count sketch (Bar-Yossef et al. 2002 §2;
  * the unbiased (k−1)·M/h_(k) estimator analysis is Beyer et al.
  * SIGMOD 2007) — the cardinality member of the bounded-summary family
  * next to Misra–Gries counts (HeavyHitters) and the rank summary
  * (QuantileSketch): distinct counting over 100 TB without shuffling
  * every distinct key, with O(k) mergeable state that rides Spark's
  * partial/final aggregate split.
  *
  * Input is the value's 60-bit md5 hash (ExactCols.h60 — computed as a
  * codegen column BEFORE the aggregator, so the JVM side never
  * re-hashes), the state keeps the k smallest DISTINCT hashes, and
  * merge is union + re-cap — associative and commutative, so results
  * are partition- and merge-order-independent.
  *
  * EXACT regime (the q66/q139 gating contract): while a group's
  * distinct-hash cardinality stays ≤ k, no compaction ever fires, the
  * kept set IS the distinct set, and `finish` returns the exact
  * distinct-hash count — which a COUNT(DISTINCT h60) oracle reproduces
  * bit-for-bit (both engines count the SAME 60-bit hashes, so even a
  * hash collision cannot split them). [[KmvSketch.autoK]] derives k
  * from a distinct-count pre-pass so the regime holds at ANY scale
  * factor; with `failOnApprox` the job dies loudly the moment a
  * compaction would discard a hash (the ScaleUp trap guard).
  *
  * Sketch tier (spec-verified bounds, no oracle — estimates are
  * correct-on-average, not deterministic targets): saturated groups
  * estimate (k−1)·2^60/h_(k), within ~1/√k relative error w.h.p.
  *
  * Implementation note: inserts buffer up to 2k distinct hashes, then
  * compact to the k smallest (O(k log k) every ≥k inserts — amortized
  * O(log k)); discarded hashes rank > k among those seen, and ranks
  * only grow as values arrive, so they can never re-enter the final
  * k-minimum set. */
final class KmvSketch(k: Int, failOnApprox: Boolean = false)
    extends Aggregator[Long, KmvState, Long] {
  require(k > 0)

  private def leftExactRegime(): Nothing =
    throw new IllegalStateException(
      s"KmvSketch(k=$k) left the exact regime: a group exceeded $k " +
        "distinct hashes, so the count would become an estimate — raise " +
        "k above the per-group cardinality (autoK) or use the sketch " +
        "tier (apply)")

  private def cap(s: KmvState): KmvState =
    if (!s.sat && failOnApprox && s.hs.size > k) leftExactRegime()
    else if (s.hs.size <= 2 * k) s
    else KmvState(s.hs.toSeq.sorted.take(k).toSet, sat = true)

  def zero: KmvState = KmvState(Set.empty, sat = false)

  def reduce(b: KmvState, h: Long): KmvState =
    if (b.hs.contains(h)) b else cap(KmvState(b.hs + h, b.sat))

  def merge(a: KmvState, b: KmvState): KmvState = {
    val (small, large) = if (a.hs.size < b.hs.size) (a, b) else (b, a)
    cap(KmvState(large.hs ++ small.hs, a.sat || b.sat))
  }

  def finish(s: KmvState): Long =
    if (!s.sat) {
      if (failOnApprox && s.hs.size > k) leftExactRegime()
      s.hs.size.toLong
    } else {
      // saturated: hs holds ≥ k candidates; h_(k) = kth smallest
      val kth = s.hs.toSeq.sorted.apply(k - 1)
      if (kth <= 0L) k.toLong
      // (k−1)·2^60 overflows int64 past k=8 — ride BigInt
      else ((BigInt(k - 1) << 60) / kth).toLong
    }

  def bufferEncoder: Encoder[KmvState] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
  def outputEncoder: Encoder[Long] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
}

object KmvSketch {
  /** Sketch tier: distinct-count estimate from the k smallest hashes —
    * never fails; exact while cardinality ≤ k, ~1/√k relative error
    * beyond. `h` must be an ExactCols.h60-hashed column. */
  def apply(h: Column, k: Int): Column = udaf(new KmvSketch(k)).apply(h)

  /** Exact-regime form: identical to COUNT(DISTINCT h) while k exceeds
    * every group's cardinality, but FAILS THE JOB the moment a
    * compaction would discard a hash (the q66 contract). */
  def exact(h: Column, k: Int): Column =
    udaf(new KmvSketch(k, failOnApprox = true)).apply(h)

  /** Data-derived exact-regime k (the HeavyHitters.autoK pattern): one
    * distinct-count pre-pass — O(groups) shuffle output, one scalar to
    * the driver — returns the max per-group cardinality of `h` plus
    * one, so [[exact]] never compacts at ANY scale factor. The
    * fail-loud guard stays armed behind it. */
  def autoK(df: DataFrame, groupKeys: Seq[Column], h: Column): Int = {
    import org.apache.spark.sql.functions.{col, countDistinct, max => fmax}
    // empty input → the max aggregate returns one NULL row; fall back
    // to the minimal k (nothing will ever enter the sketch anyway)
    val row = df.groupBy(groupKeys: _*)
      .agg(countDistinct(h).as("c"))
      .agg(fmax(col("c")))
      .head
    val card = if (row.isNullAt(0)) 0L else row.getLong(0)
    math.min(card + 1L, Int.MaxValue.toLong).toInt
  }
}
