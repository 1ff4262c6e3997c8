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
  * entry into its left neighbor. Folds only move attribution DOWN,
  * so the sketch cumulative C_sk(x) over-counts the truth by exactly
  * the mass attributed at-or-below x that originated above x — and
  * that straddling mass is bounded PER ENTRY, not globally: each
  * entry v carries g(v) ≥ (mass attributed at entries ≤ v
  * originating above any query point landing on v), maintained by
  * three local rules — fold e→l sets g(l) = max(g(e), g(l) + c(e))
  * (c(e) originates entirely ≥ e: folds never move mass up); a fresh
  * insert between entries inherits its left neighbor's g (that
  * straddle may now cross it); a merge sums, per combined entry, each
  * side's g at its largest entry ≤ v (over-counts add). The reported
  * `moved` = max g — for ANY rank query the absolute rank error is
  * ≤ `moved` (QuantileSketchSpec checks the bound against ground
  * truth on adversarial fixtures; the r12 crossover test measured it
  * ≈ n/buffer on uniform mass where the previous Σ-folded-mass bound
  * certified 87% of n). `moved == 0` certifies the EXACT regime: no
  * fold ever fired, the summary is the true value histogram, and
  * quantiles are exact order statistics — which is what makes the
  * q139 gate oracle-checkable (the q66 contract).
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
  *
  * MEMORY BOUND (the 100 TB story for q173-shaped per-key rank
  * statistics): sketch-tier state is ≤ `buffer` (value, count) pairs
  * — O(buffer) longs — PER GROUP, independent of group row count, so
  * a per-priority p99 over 10¹² lineitem rows holds
  * |priorities|·buffer entries total across the partial aggregates
  * (≈ 5·256 pairs for q173 at buffer 256), and the partial/final
  * merge is the associative `merge` below. Value replication
  * (ScaleUp) never grows cardinality, so q173's bounded delay domain
  * keeps the gate in the exact regime at any sf; cardinality GROWTH
  * is what crosses into the sketch tier, where every answer carries
  * the certified `moved` bound — QuantileSketchSpec's crossover test
  * drives the q173 shape through that transition.
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

  /** Fold entries into their left neighbors until the summary fits,
    * maintaining the per-entry straddle bounds `gs`
    * (g(l) = max(g(e), g(l) + c(e)) — see the object scaladoc's
    * invariant). The victim is the entry minimizing the COMBINED pair
    * count c(l) + c(e) (leftmost on ties): a pure smallest-c(e) rule
    * chains every uniform-count fold into one ever-growing left
    * anchor (measured: g hit 68% of n where this rule holds ~n/buffer
    * — folded-into entries grow and stop being minimal, so folds
    * spread and each survivor absorbs ≈ its own final count). The
    * LOWEST value is never folded (it anchors rank 1), so min and any
    * quantile resolving below the first fold stay exact. `gs` holds
    * only nonzero bounds: an empty map IS the exact-regime
    * certificate (and keeps the reduce fast path lookup-free). */
  private def compact(vals: Map[Long, Long], gs: Map[Long, Long]): State = {
    if (vals.size <= buffer) State(vals, gs)
    else if (failOnApprox) leftExactRegime()
    else {
      var entries = vals.toArray.sortBy(_._1)
      val g = scala.collection.mutable.Map.empty[Long, Long] ++ gs
      while (entries.length > buffer) {
        var best = 1
        var bestSum = entries(0)._2 + entries(1)._2
        var i = 2
        while (i < entries.length) {
          val s = entries(i - 1)._2 + entries(i)._2
          if (s < bestSum) { best = i; bestSum = s }
          i += 1
        }
        val (ev, c) = entries(best)
        val lv = entries(best - 1)._1
        entries(best - 1) = (lv, entries(best - 1)._2 + c)
        entries = entries.patch(best, Nil, 1)
        g(lv) = math.max(g.getOrElse(ev, 0L), g.getOrElse(lv, 0L) + c)
        g.remove(ev)
      }
      State(entries.toMap, g.toMap)
    }
  }

  /** Largest entry ≤ v's bound, 0 when none — the straddle a fresh
    * or merged entry at v must inherit. */
  private def below(gs: Map[Long, Long], vals: Map[Long, Long], v: Long): Long =
    if (gs.isEmpty) 0L
    else {
      // gs nonempty ⇒ sketch tier ⇒ vals ≤ buffer entries: linear scan
      var best = Long.MinValue
      var out = 0L
      for ((k, c) <- vals if k <= v && k > best && c > 0L) {
        best = k
        out = gs.getOrElse(k, 0L)
      }
      out
    }

  def zero: State = State(Map.empty, Map.empty)

  def reduce(b: State, v: Long): State = reduceWeighted(b, v, 1L)

  /** [[reduce]] generalized to a (value, count) increment — inserting
    * v with count c is state-identical to c consecutive unweighted
    * inserts in the exact regime (the histogram is the same either
    * way), and in the sketch tier it is one mini-merge obeying the
    * same straddle rules (a fresh entry inherits its left neighbor's
    * g regardless of count). Precondition: c ≥ 1 (histogram counts). */
  private[functions] def reduceWeighted(b: State, v: Long, c: Long): State = {
    val fresh = !b.vals.contains(v)
    val vals = b.vals.updated(v, b.vals.getOrElse(v, 0L) + c)
    // a fresh entry between existing ones inherits its left
    // neighbor's straddle (that mass may originate above v); the
    // exact regime (gs empty) skips the scan entirely
    val gs =
      if (fresh && b.gs.nonEmpty) {
        val inh = below(b.gs, b.vals, v)
        if (inh > 0L) b.gs.updated(v, inh) else b.gs
      } else b.gs
    compact(vals, gs)
  }

  def merge(a: State, b: State): State = {
    val keys = a.vals.keySet ++ b.vals.keySet
    val vals = keys.iterator.map(v =>
      v -> (a.vals.getOrElse(v, 0L) + b.vals.getOrElse(v, 0L))).toMap
    // per combined entry, the two sides' over-counts add: inherit
    // each side's g at its largest entry ≤ v
    val gs =
      if (a.gs.isEmpty && b.gs.isEmpty) Map.empty[Long, Long]
      else keys.iterator.map { v =>
        v -> (below(a.gs, a.vals, v) + below(b.gs, b.vals, v))
      }.filter(_._2 > 0L).toMap
    compact(vals, gs)
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
    Result(qs, n, if (st.gs.isEmpty) 0L else st.gs.values.max)
  }

  def bufferEncoder: Encoder[State] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
  def outputEncoder: Encoder[Result] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
}

/** [[QuantileSketch]] over pre-aggregated (value, count) rows — the
  * gate-side fast path (r13): a codegen groupBy((keys, value)).count()
  * reduces the corpus to one row per distinct (group, value) BEFORE
  * the row-at-a-time JVM aggregator runs, so the typed Aggregator's
  * per-row cost (immutable-Map update + State allocation per reduce
  * call — profiled as the q225/q173 hot loop) is paid once per
  * DISTINCT value instead of once per raw event. In the exact regime
  * the state is the same full histogram either way (reduceWeighted is
  * c unweighted inserts fused), so exact-tier results are IDENTICAL;
  * in the sketch tier the per-entry straddle bounds hold under the
  * same rules (a weighted insert is a mini-merge). Precondition:
  * counts ≥ 1. QuantileSketchSpec pins weighted ≡ unweighted on the
  * exact tier and the `moved` bound on the sketch tier. */
final class QuantileSketchWeighted(buffer: Int, quantiles: Seq[(Long, Long)],
                                   failOnApprox: Boolean = false)
    extends Aggregator[(Long, Long), QuantileSketch.State, QuantileSketch.Result] {
  private val inner = new QuantileSketch(buffer, quantiles, failOnApprox)
  def zero: QuantileSketch.State = inner.zero
  def reduce(b: QuantileSketch.State, vc: (Long, Long)): QuantileSketch.State =
    inner.reduceWeighted(b, vc._1, vc._2)
  def merge(a: QuantileSketch.State, b: QuantileSketch.State): QuantileSketch.State =
    inner.merge(a, b)
  def finish(st: QuantileSketch.State): QuantileSketch.Result = inner.finish(st)
  def bufferEncoder: Encoder[QuantileSketch.State] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
  def outputEncoder: Encoder[QuantileSketch.Result] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
}

object QuantileSketch {
  /** Summary state (public: encoder codegen constructs it): the
    * (value → count) histogram plus the per-entry straddle bounds
    * (nonzero only — empty `gs` certifies the exact regime). */
  final case class State(vals: Map[Long, Long], gs: Map[Long, Long])

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

  /** Sketch tier over pre-aggregated (value, count) rows — see
    * [[QuantileSketchWeighted]]. */
  def applyWeighted(v: Column, cnt: Column, buffer: Int,
                    quantiles: Seq[(Long, Long)]): Column =
    udaf(new QuantileSketchWeighted(buffer, quantiles)).apply(v, cnt)

  /** [[exact]] over pre-aggregated (value, count) rows — exact-tier
    * state (and so results, and the fail-loud guard) identical to
    * feeding the raw rows; the aggregator runs over one row per
    * distinct (group, value). */
  def exactWeighted(v: Column, cnt: Column, buffer: Int,
                    quantiles: Seq[(Long, Long)]): Column =
    udaf(new QuantileSketchWeighted(buffer, quantiles, failOnApprox = true))
      .apply(v, cnt)

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
