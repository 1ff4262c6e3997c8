package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Distinct-value occurrence counters: the reference's `union_count`
  * aggregation (miw/log_record.cc:57-142, count branch :105-122) —
  * per group, the set of distinct string values of a field plus how
  * many times each occurred.
  *
  * A classic commutative-monoid fold, so partial (map-side) and final
  * merges share one implementation; Spark runs it as a partial/final
  * ObjectHashAggregate pair, which is exactly the reference's
  * combiner + reducer split distributed over executors.
  *
  * The reference emits values in nondeterministic first-seen order
  * (SURVEY §7.4 hazard 1); we canonicalize by sorting keys, which also
  * makes output reproducible across partitionings at any scale.
  */
object UnionCount extends Aggregator[String, Map[String, Long], Map[String, Long]] {
  def zero: Map[String, Long] = Map.empty
  def reduce(b: Map[String, Long], v: String): Map[String, Long] =
    if (v == null) b else b.updated(v, b.getOrElse(v, 0L) + 1L)
  def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] = {
    val (small, large) = if (a.size < b.size) (a, b) else (b, a)
    small.foldLeft(large) { case (acc, (k, n)) =>
      acc.updated(k, acc.getOrElse(k, 0L) + n)
    }
  }
  def finish(m: Map[String, Long]): Map[String, Long] = m
  // ExpressionEncoder (not kryo): shuffles the partial maps as Tungsten
  // rows, keeping the two-phase aggregate compact on the wire.
  def bufferEncoder: Encoder[Map[String, Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
  def outputEncoder: Encoder[Map[String, Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()

  /** Column form: value-frequency map of `c` per group. */
  def apply(c: Column): Column = udaf(this).apply(c)
}
