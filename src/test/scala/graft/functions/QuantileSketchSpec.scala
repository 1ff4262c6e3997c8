package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

class QuantileSketchSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private val qs = Seq((1L, 2L), (9L, 10L), (99L, 100L))

  /** Ground-truth lower quantile: value at sorted position ⌈q·n⌉. */
  private def truth(data: Seq[Long], num: Long, den: Long): Long = {
    val sorted = data.sorted
    val pos = math.max(1L, (num * data.length + den - 1) / den)
    sorted((pos - 1).toInt)
  }

  test("exact regime equals true order statistics, any partitioning") {
    import spark.implicits._
    // skewed multiset: heavy ties at 5, a long tail, negatives
    val data: Seq[Long] =
      Seq.fill(40)(5L) ++ (1L to 25L) ++ Seq(-7L, -7L, 1000L, 999L)
    for (parts <- Seq(1, 3, 8)) {
      val df = data.toDF("v").repartition(parts)
      val r = df.agg(QuantileSketch.exact(col("v"), data.distinct.size + 1, qs)
        .as("r")).select(col("r.q"), col("r.n"), col("r.moved")).head()
      assert(r.getSeq[Long](0).toList ==
        qs.map { case (n, d) => truth(data, n, d) }.toList)
      assert(r.getLong(1) == data.length && r.getLong(2) == 0L)
    }
  }

  test("exact mode fails loudly the moment a fold would fire") {
    import spark.implicits._
    val df = (1L to 100L).toDF("v").coalesce(1)
    val ex = intercept[Exception] {
      df.agg(QuantileSketch.exact(col("v"), 10, qs).as("r")).collect()
    }
    assert(ex.getMessage != null)
  }

  test("sketch tier: certified rank-error bound holds on adversarial data") {
    import spark.implicits._
    // geometric masses so naive folding is maximally tempting
    val data: Seq[Long] = (0 until 200).flatMap { i =>
      Seq.fill(1 + (i % 7))(i.toLong)
    }
    for (buffer <- Seq(4, 8, 16, 64); parts <- Seq(1, 5)) {
      val df = data.toDF("v").repartition(parts)
      val r = df.agg(QuantileSketch(col("v"), buffer, qs).as("r"))
        .select(col("r.q"), col("r.n"), col("r.moved")).head()
      val got = r.getSeq[Long](0).toList
      val n = r.getLong(1)
      val moved = r.getLong(2)
      assert(n == data.length)
      assert(moved > 0L, s"buffer $buffer should have folded")
      val sorted = data.sorted
      for (((num, den), v) <- qs.zip(got)) {
        val pos = math.max(1L, (num * n + den - 1) / den)
        // the returned value's true rank interval, widened by the
        // certified bound, must contain the target position
        val lo = sorted.count(_ < v).toLong + 1
        val hi = sorted.count(_ <= v).toLong
        assert(lo - moved <= pos && pos <= hi + moved,
          s"buffer=$buffer q=$num/$den: v=$v rank[$lo,$hi] ± $moved ∌ $pos")
      }
    }
  }

  test("tighter buffers never certify a smaller bound than they earned") {
    import spark.implicits._
    val data: Seq[Long] = (1L to 500L)
    val moved = Seq(4, 16, 128).map { buffer =>
      data.toDF("v").coalesce(1)
        .agg(QuantileSketch(col("v"), buffer, qs).as("r"))
        .select(col("r.moved")).head().getLong(0)
    }
    assert(moved == moved.sorted.reverse, s"moved not monotone: $moved")
  }

  test("autoBuffer = max per-group cardinality + 1") {
    import spark.implicits._
    val df = Seq(("a", 1L), ("a", 2L), ("a", 2L), ("b", 5L), ("b", 6L),
      ("b", 7L), ("b", 7L)).toDF("k", "v")
    assert(QuantileSketch.autoBuffer(df, Seq(col("k")), col("v")) == 4)
  }
}
