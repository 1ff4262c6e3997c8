package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal correlation operators — as-of join and range-count join —
  * in their scalable forms. Spark has no native as-of/range join; the
  * naive formulations are non-equi theta joins that plan as nested
  * loops (|L|·|R| compares). Both operators here reduce to EQUI joins
  * or a single window pass, which shuffle on (key[, bucket]) and
  * survive arbitrary scale; both are deterministic under ties so a
  * SQL oracle can reproduce them exactly.
  */
object TimeJoins {

  /** As-of join: for each left row, the right-side `value` with the
    * greatest (rightTs, value) at-or-before the left row's time,
    * per key. Implemented as union-tag + one window pass (no join at
    * all): right rows sort before left rows at equal timestamps
    * (at-or-before includes same-instant), `last(value) ignoreNulls`
    * over the running frame carries the newest right value forward.
    * One shuffle on the key — the plan a sort-merge as-of join would
    * want, without a custom SparkPlan.
    *
    * Returns (leftId, asName) — join back on leftId if the full left
    * row is needed.
    */
  def asofJoin(
      left: DataFrame, right: DataFrame,
      keys: Seq[String], leftTs: String, rightTs: String,
      leftId: String, rightValue: String, asName: String): DataFrame = {
    val idType = left.schema(leftId).dataType
    val vType = right.schema(rightValue).dataType
    val lU = left.select(
      keys.map(col) ++ Seq(
        col(leftId).as("__lid"), col(leftTs).as("__ts"),
        lit(1).as("__tag"), lit(null).cast(vType).as("__val")): _*)
    val rU = right.select(
      keys.map(col) ++ Seq(
        lit(null).cast(idType).as("__lid"), col(rightTs).as("__ts"),
        lit(0).as("__tag"), col(rightValue).as("__val")): _*)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__ts"), col("__tag"), col("__val"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    lU.unionByName(rU)
      .withColumn(asName, last(col("__val"), ignoreNulls = true).over(w))
      .filter(col("__tag") === 1)
      .select(col("__lid").as(leftId), col(asName))
  }

  /** Range-count join: for each left row, how many right rows share
    * its key and fall in [leftTs − windowSec, leftTs). Implemented by
    * time-bucketing both sides at windowSec granularity: a right row
    * can only affect left rows in its own or the next bucket, so
    * exploding the right side into those two buckets turns the range
    * predicate into an EQUI join on (key, bucket) + a residual range
    * filter. Cost is 2|R| join-input rows instead of |L|·|R|
    * compares; the shuffle key is (key, bucket) — bounded skew even
    * for hot keys, since buckets subdivide time.
    *
    * Returns (leftId, asName count), zero-filled for left rows with
    * no matches.
    */
  def rangeCount(
      left: DataFrame, right: DataFrame,
      keys: Seq[String], leftTs: String, rightTs: String,
      leftId: String, windowSec: Long, asName: String): DataFrame = {
    val lb = left.select(
      keys.map(col) ++ Seq(col(leftId).as("__lid"), col(leftTs).as("__lts"),
        floor(unix_timestamp(col(leftTs)) / windowSec).as("__b")): _*)
    val rb = right.select(
      keys.map(col) ++ Seq(col(rightTs).as("__rts"),
        floor(unix_timestamp(col(rightTs)) / windowSec).as("__rb")): _*)
      .withColumn("__b", explode(array(col("__rb"), col("__rb") + 1)))
      .drop("__rb")
    val matches = lb.join(rb, keys :+ "__b")
      .filter(col("__rts") >= col("__lts") - expr(s"INTERVAL $windowSec SECONDS") &&
        col("__rts") < col("__lts"))
      .groupBy(col("__lid"))
      .agg(count(lit(1)).as(asName))
    lb.select(col("__lid"))
      .join(matches, Seq("__lid"), "left")
      .select(col("__lid").as(leftId),
        coalesce(col(asName), lit(0L)).as(asName))
  }
}
