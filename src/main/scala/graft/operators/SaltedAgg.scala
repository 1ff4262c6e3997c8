package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Two-phase salted aggregation for skewed group keys.
  *
  * A plain `groupBy(k).agg(...)` hash-partitions on `k`: one hot key
  * = one hot reducer, and at 100 TB a single key holding 1% of rows
  * stalls the stage. Salting splits each key into `buckets` synthetic
  * sub-keys, aggregates partials per (key, salt) — spreading the hot
  * key over `buckets` tasks — then merges the partials in a second,
  * tiny aggregation keyed by `k` alone.
  *
  * Only decomposable (monoid) aggregates qualify; this helper covers
  * the engine's core set (count / sum / min / max — mean and variance
  * derive from sum+count at finalize, exactly like the reference's
  * merge kernel). AQE's skew-join handling covers JOIN skew at
  * runtime; aggregation skew is planned here, at plan build.
  *
  * The salt is `pmod(hash(random-ish row bits), buckets)` derived
  * from a second column when provided (deterministic, testable) or
  * `spark_partition_id()` otherwise (zero extra hashing; partials
  * are per-input-partition, the classic combiner shape).
  */
object SaltedAgg {

  final case class MonoidAgg(column: Column, kind: String, as: String)
  def sumOf(c: Column, as: String): MonoidAgg = MonoidAgg(c, "sum", as)
  def countRows(as: String): MonoidAgg = MonoidAgg(lit(1L), "count", as)
  def minOf(c: Column, as: String): MonoidAgg = MonoidAgg(c, "min", as)
  def maxOf(c: Column, as: String): MonoidAgg = MonoidAgg(c, "max", as)

  def aggregate(
      df: DataFrame,
      keys: Seq[Column],
      aggs: Seq[MonoidAgg],
      buckets: Int = 64,
      saltSource: Option[Column] = None): DataFrame = {
    require(buckets > 0)
    val salt = saltSource match {
      case Some(c) => pmod(hash(c), lit(buckets))
      case None    => spark_partition_id() % buckets
    }
    val partialExprs = aggs.map { a =>
      (a.kind match {
        case "sum"   => sum(a.column)
        case "count" => count(a.column)
        case "min"   => min(a.column)
        case "max"   => max(a.column)
        case other   => throw new IllegalArgumentException(s"non-monoid agg: $other")
      }).as("__p_" + a.as)
    }
    val keyNames = keys.indices.map(i => s"__k_$i")
    val partial = df
      .groupBy((keys.zip(keyNames).map { case (k, n) => k.as(n) } :+ salt.as("__salt")): _*)
      .agg(partialExprs.head, partialExprs.tail: _*)
    val mergeExprs = aggs.map { a =>
      val p = col("__p_" + a.as)
      (a.kind match {
        case "sum" | "count" => sum(p)
        case "min"           => min(p)
        case "max"           => max(p)
      }).as(a.as)
    }
    partial
      .groupBy(keyNames.map(col): _*)
      .agg(mergeExprs.head, mergeExprs.tail: _*)
      .withColumnsRenamed(keyNames.zipWithIndex.map { case (n, i) =>
        n -> s"key_$i"
      }.toMap)
  }
}
