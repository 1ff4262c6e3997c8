package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Mergeable quantile summary over int64 values — the rank-statistics
  * sketch next to [[HeavyHitters]]' frequency sketch: a bounded
  * (value → count) summary that rides the partial/final aggregate
  * split and merges associatively, for "p99 latency per key over
  * 100 TB" where collecting per-group sorted arrays is unbounded.
  *
  * SELF-CERTIFYING ERROR BOUND (the measure-don't-guess doctrine
  * applied to the sketch itself): when the summary would exceed
  * `buffer` distinct values, compaction folds the smallest-count
  * entry into its left neighbor and adds the folded mass to `moved`.
  * Every fold displaces exactly that mass downward past one value, so
  * for ANY rank query the absolute rank error is ≤ the final `moved`
  * — the summary carries its own certified bound instead of a formula
  * the caller must trust (QuantileSketchSpec checks the bound against
  * ground truth on adversarial fixtures). `moved == 0` certifies the
  * EXACT regime: no fold ever fired, the summary is the true value
  * histogram, and quantiles are exact order statistics — which is
  * what makes the q139 gate oracle-checkable (the q66 contract).
  *
  * Quantile positions are RATIONALS (num, den): pos = ⌈q·n⌉ computed
  * as (num·n + den − 1) div den in int64 — no float touches rank
  * arithmetic, so DuckDB replays positions bit-exactly.
  *
  * Exact-regime enforcement mirrors HeavyHitters: `exact` fails the
  * job loudly the moment a fold would fire (the ScaleUp trap —
  * replicated corpora multiply cardinality past the buffer);
  * `autoBuffer` derives the buffer from a distinct-count pre-pass so
  * the gate stays exact at ANY scale factor with the guard armed.
  */
final class QuantileSketch(buffer: Int, quantiles: Seq[(Long, Long)],
                           failOnApprox: Boolean = false)
    extends Aggregator[Long, QuantileSketch.State, QuantileSketch.Result] {
  require(buffer > 1, s"buffer must exceed 1: $buffer")
  require(quantiles.nonEmpty && quantiles.forall { case (n, d) =>
    n >= 0 && d > 0 && n <= d }, s"quantiles must be rationals in [0,1]")

  import QuantileSketch.{Result, State}

  private def leftExactRegime(): Nothing =
    throw new IllegalStateException(
      s"QuantileSketch(buffer=$buffer) left the exact regime: a group " +
        s"exceeded $buffer distinct values, so ranks would shift by the " +
        "folded mass — raise the buffer above the per-group value " +
        "cardinality (autoBuffer) or use the sketch tier (apply)")

  /** Fold smallest-count entries into their left neighbors until the
    * summary fits; the folded mass is the certified rank-error bound.
    * The LOWEST value is never folded (it anchors rank 1), so min and
    * any quantile resolving below the first fold stay exact. */
  private def compact(vals: Map[Long, Long], moved: Long): State = {
    if (vals.size <= buffer) State(vals, moved)
    else if (failOnApprox) leftExactRegime()
    else {
      var entries = vals.toArray.sortBy(_._1)
      var m = moved
      while (entries.length > buffer) {
        var best = 1
        var i = 2
        while (i < entries.length) {
          if (entries(i)._2 < entries(best)._2) best = i
          i += 1
        }
        val (_, c) = entries(best)
        entries(best - 1) = (entries(best - 1)._1, entries(best - 1)._2 + c)
        entries = entries.patch(best, Nil, 1)
        m += c
      }
      State(entries.toMap, m)
    }
  }

  def zero: State = State(Map.empty, 0L)

  def reduce(b: State, v: Long): State = {
    val vals = b.vals.updated(v, b.vals.getOrElse(v, 0L) + 1L)
    compact(vals, b.moved)
  }

  def merge(a: State, b: State): State = {
    val (small, large) = if (a.vals.size < b.vals.size) (a, b) else (b, a)
    val summed = small.vals.foldLeft(large.vals) { case (acc, (v, c)) =>
      acc.updated(v, acc.getOrElse(v, 0L) + c)
    }
    compact(summed, a.moved + b.moved)
  }

  def finish(st: State): Result = {
    val entries = st.vals.toArray.sortBy(_._1)
    val n = entries.map(_._2).sum
    val qs = quantiles.map { case (num, den) =>
      if (n == 0L) 0L
      else {
        val pos = math.max(1L, (num * n + den - 1) / den)
        var cum = 0L
        var i = 0
        var out = entries.last._1
        var found = false
        while (i < entries.length && !found) {
          cum += entries(i)._2
          if (cum >= pos) { out = entries(i)._1; found = true }
          i += 1
        }
        out
      }
    }
    Result(qs, n, st.moved)
  }

  def bufferEncoder: Encoder[State] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
  def outputEncoder: Encoder[Result] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
}

object QuantileSketch {
  /** Summary state (public: encoder codegen constructs it). */
  final case class State(vals: Map[Long, Long], moved: Long)

  /** Quantile values in input order, the group count, and the
    * certified rank-error bound (0 ⇒ exact order statistics). */
  final case class Result(q: Seq[Long], n: Long, moved: Long)

  /** Sketch tier: bounded summary, never fails; every returned
    * quantile's rank is within ± the reported `moved` of its target. */
  def apply(c: Column, buffer: Int, quantiles: Seq[(Long, Long)]): Column =
    udaf(new QuantileSketch(buffer, quantiles)).apply(c)

  /** Exact-regime tier: identical while the buffer exceeds every
    * group's value cardinality; FAILS THE JOB the moment a fold would
    * fire (the q66 fail-loud contract). */
  def exact(c: Column, buffer: Int, quantiles: Seq[(Long, Long)]): Column =
    udaf(new QuantileSketch(buffer, quantiles, failOnApprox = true)).apply(c)

  /** Data-derived exact-regime buffer: max per-group distinct values
    * + 1 (one scalar to the driver — the autoK pattern), so `exact`
    * never folds at ANY scale factor while the guard stays armed. */
  def autoBuffer(df: org.apache.spark.sql.DataFrame, groupKeys: Seq[Column],
                 value: Column): Int = {
    import org.apache.spark.sql.functions.{countDistinct, max => fmax}
    // empty input → the max aggregate returns one NULL row; fall back
    // to the minimal buffer (nothing will ever enter the sketch anyway)
    val row = df.groupBy(groupKeys: _*)
      .agg(countDistinct(value).as("c"))
      .agg(fmax(org.apache.spark.sql.functions.col("c")))
      .head
    val card = if (row.isNullAt(0)) 0L else row.getLong(0)
    math.min(card + 1L, Int.MaxValue.toLong).toInt
  }
}
