package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Misra–Gries heavy hitters: approximate top keys in ONE pass with a
  * bounded k-counter summary — the sketch tier for "top domains/users
  * over 100 TB" where an exact groupBy must shuffle every distinct
  * key. The summary is O(k) regardless of cardinality, rides the
  * partial/final aggregate split (map-side combine), and merges
  * associatively via the Agarwal-et-al. mergeable-summaries rule
  * (pointwise sum, then subtract the (k+1)-th largest and drop ≤ 0).
  *
  * Guarantees (for n processed values): every key with true count
  * > n/(k+1) is present, and each reported count is an UNDERestimate
  * by at most n/(k+1). Reported counts depend on merge order (like
  * HLL et al.), so tests assert the guarantees, not exact equality —
  * the exact tier (groupBy + TopKPerKey) remains the oracle-checkable
  * path.
  */
final class HeavyHitters(k: Int, failOnApprox: Boolean = false)
    extends Aggregator[String, Map[String, Long], Map[String, Long]] {
  require(k > 0)

  // the exact-regime contract, enforced: the moment the MG
  // decrement/cut path would fire, the summary stops equaling the
  // true counts — exact mode fails the job loudly instead of
  // silently diverging from a GROUP BY oracle (the ScaleUp trap:
  // replicated keys multiply cardinality past k)
  private def leftExactRegime(): Nothing =
    throw new IllegalStateException(
      s"HeavyHitters(k=$k) left the exact regime: a group exceeded $k " +
        "distinct keys, so counts would become underestimates — raise k " +
        "above the per-group cardinality or use the sketch tier (apply)")

  def zero: Map[String, Long] = Map.empty

  def reduce(b: Map[String, Long], v: String): Map[String, Long] =
    if (v == null) b
    else b.get(v) match {
      case Some(n) => b.updated(v, n + 1L)
      case None if b.size < k => b.updated(v, 1L)
      case None if failOnApprox => leftExactRegime()
      case None => // decrement all, drop zeros (the classic MG step)
        b.flatMap { case (key, n) => if (n > 1L) Some(key -> (n - 1L)) else None }
    }

  def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] = {
    val summed = {
      val (small, large) = if (a.size < b.size) (a, b) else (b, a)
      small.foldLeft(large) { case (acc, (key, n)) =>
        acc.updated(key, acc.getOrElse(key, 0L) + n)
      }
    }
    if (summed.size <= k) summed
    else if (failOnApprox) leftExactRegime()
    else {
      val cut = summed.values.toSeq.sorted(Ordering[Long].reverse)(k)
      summed.flatMap { case (key, n) =>
        if (n > cut) Some(key -> (n - cut)) else None
      }
    }
  }

  def finish(m: Map[String, Long]): Map[String, Long] = m

  def bufferEncoder: Encoder[Map[String, Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
  def outputEncoder: Encoder[Map[String, Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
}

object HeavyHitters {
  /** Column form: ≤ k candidate heavy keys of `c` per group with
    * lower-bound counts (the sketch tier — never fails, counts may
    * underestimate by up to n/(k+1)). */
  def apply(c: Column, k: Int): Column = udaf(new HeavyHitters(k)).apply(c)

  /** Exact-regime form: identical output while k exceeds every
    * group's key cardinality, but FAILS THE JOB the moment the
    * Misra–Gries decrement would fire — the guard that makes an
    * oracle-gated use (q66) blow up loudly on ScaleUp-replicated
    * corpora instead of silently entering the sketch regime. */
  def exact(c: Column, k: Int): Column =
    udaf(new HeavyHitters(k, failOnApprox = true)).apply(c)

  /** Data-derived exact-regime k: one distinct-count pre-pass (the
    * semdedup auto-k pattern — a single scalar to the driver, O(groups)
    * shuffle output) returns the max per-group cardinality of `value`
    * plus one, so `exact` stays in the never-decrements regime at ANY
    * scale factor, including ScaleUp-replicated corpora whose shifted
    * keys multiply cardinality. The fail-loud guard stays armed: if the
    * data changes between the pre-pass and the aggregate (a streaming
    * source, a non-deterministic sample), the job still dies instead of
    * silently underestimating. */
  def autoK(df: org.apache.spark.sql.DataFrame, groupKeys: Seq[Column],
            value: Column): Int = {
    import org.apache.spark.sql.functions.{countDistinct, max => fmax}
    val card = df.groupBy(groupKeys: _*)
      .agg(countDistinct(value).as("c"))
      .agg(fmax(org.apache.spark.sql.functions.col("c")))
      .head.getLong(0)
    math.min(card + 1L, Int.MaxValue.toLong).toInt
  }
}
