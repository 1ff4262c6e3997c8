package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

class MatMulSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  /** Deterministic pseudo-random n×m coordinate matrix (values may be
    * zero — tiles must handle absent entries). */
  private def mat(n: Int, m: Int, seed: Long) = {
    import spark.implicits._
    (for { i <- 0 until n; j <- 0 until m }
      yield (i.toLong, j.toLong, ((i * 31 + j * 17 + seed) % 13) - 6))
      .toDF("i", "j", "v")
      // drop explicit zeros: coordinate matrices are sparse
      .filter(col("v") =!= 0)
  }

  private def local(df: org.apache.spark.sql.DataFrame): Map[(Long, Long), Long] =
    df.collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap

  test("blocked matmul equals coordinate matmul (12x12, bs=4 and bs=5)") {
    val a = mat(12, 12, 3)
    val b = mat(12, 12, 8)
    val coord = local(MatMul.coordinate(a, b))
    for (bs <- Seq(4, 5)) {
      val blk = local(MatMul.blocked(a, b, bs, 12, 12))
      // blocked emits the full grid incl. exact zeros; coordinate emits
      // only joined support — compare on the union with 0 default
      for (i <- 0L until 12L; j <- 0L until 12L)
        assert(blk.getOrElse((i, j), 0L) == coord.getOrElse((i, j), 0L),
          s"C[$i,$j] bs=$bs")
    }
  }

  test("non-square shapes: (6x9) x (9x4)") {
    val a = mat(6, 9, 1)
    val b = mat(9, 4, 2)
    val coord = local(MatMul.coordinate(a, b))
    val blk = local(MatMul.blocked(a, b, 4, 6, 4))
    for (i <- 0L until 6L; j <- 0L until 4L)
      assert(blk.getOrElse((i, j), 0L) == coord.getOrElse((i, j), 0L), s"C[$i,$j]")
    // no coordinates outside the result shape
    assert(blk.keys.forall { case (i, j) => i < 6 && j < 4 })
  }

  test("result is partitioning-invariant") {
    val a = mat(10, 10, 5)
    val b = mat(10, 10, 6)
    val one = local(MatMul.blocked(a.coalesce(1), b.coalesce(1), 4, 10, 10))
    val many = local(MatMul.blocked(a.repartition(16), b.repartition(16), 4, 10, 10))
    assert(one == many)
  }
}
