package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** One (i, j, v) coordinate entry of an integer matrix (public: the
  * Dataset encoder's generated code must construct it). */
final case class MatEntry(i: Long, j: Long, v: Long)

/** One bs×bs dense tile at block position (r, c), row-major values
  * (zero-padded where the matrix has no entry). */
final case class MatTile(r: Long, c: Long, a: Array[Long])

private[operators] final case class TileKey(r: Long, c: Long)

/** Distributed integer matrix multiplication in coordinate form — the
  * Spark rebuild of the Metis matrix-multiply demo (reference:
  * app/matrix_mult.cc:45-114 + app/mm.hh — a shared-memory blocked
  * C[i,j] += A[i,k]·B[k,j] loop scheduled per map task).
  *
  * Two shapes:
  *
  *  - [[coordinate]]: C = A·B as a join on the shared index k followed
  *    by groupBy(i, j) + sum. Fully declarative — Catalyst plans two
  *    shuffles (on k, then on (i, j)) with map-side partial sums.
  *    Right for sparse matrices; degenerates when one k is dense on
  *    both sides (the join materializes |A_k|·|B_k| rows per k before
  *    any aggregation can shrink them).
  *
  *  - [[blocked]]: SUMMA-style tile algebra — the reference's own
  *    per-map-task blocking, distributed. Entries pack into bs×bs
  *    dense tiles, A-tiles join B-tiles on the shared block index,
  *    each pair multiplies in a tight local loop (no per-entry rows
  *    ever shuffle), and partial tiles reduce by (block-row,
  *    block-col) with map-side combine. Shuffle volume is
  *    (n/bs)³ tiles of bs² longs instead of per-entry join output,
  *    and the inner loop is cache-friendly — the shape that survives
  *    dense matrices at cluster scale. Tune bs so a tile pair
  *    (3·bs²·8 bytes) sits comfortably in executor memory/cache.
  *
  * All math is exact int64, so results are partition-order-independent
  * and oracle-checkable.
  */
object MatMul {

  /** Sparse/declarative form: inputs are coordinate DataFrames with
    * columns (i, j, v); returns (i, j, c) with only nonzero-support
    * coordinates (coordinates absent from the join emit nothing). */
  def coordinate(a: DataFrame, b: DataFrame): DataFrame =
    a.select(col("i"), col("j").as("k"), col("v").as("av"))
      .join(b.select(col("i").as("k"), col("j"), col("v").as("bv")), "k")
      .groupBy(col("i"), col("j"))
      .agg(sum(col("av") * col("bv")).as("c"))

  /** Pack a coordinate matrix into bs×bs dense tiles. */
  def pack(m: Dataset[MatEntry], bs: Int): Dataset[MatTile] = {
    val spark = m.sparkSession
    import spark.implicits._
    m.groupByKey(e => TileKey(e.i / bs, e.j / bs))
      .mapGroups { (k, es) =>
        val arr = new Array[Long](bs * bs)
        es.foreach(e => arr(((e.i % bs) * bs + (e.j % bs)).toInt) = e.v)
        MatTile(k.r, k.c, arr)
      }
  }

  /** Dense/blocked form: C = A·B over bs×bs tiles. Inputs are
    * coordinate DataFrames with columns (i, j, v). Every cell of
    * every PRODUCED tile is emitted (including exact zeros), which is
    * the full rows×cols grid whenever each block-row of A meets each
    * block-col of B — always true for dense inputs like the
    * reference's matrices. Block-rows/-cols with no entries at all
    * produce no tiles and therefore no output cells (sparse
    * convention: absent = zero). */
  def blocked(a: DataFrame, b: DataFrame, bs: Int,
              rows: Long, cols: Long): DataFrame = {
    val spark = a.sparkSession
    import spark.implicits._
    def entries(m: DataFrame): Dataset[MatEntry] =
      m.select(col("i").cast("long"), col("j").cast("long"),
        col("v").cast("long")).as[MatEntry]
    val ta = pack(entries(a), bs)
    val tb = pack(entries(b), bs)
    val partials = ta.joinWith(tb, ta("c") === tb("r")).map { case (x, y) =>
      val out = new Array[Long](bs * bs)
      var i = 0
      while (i < bs) {
        var k = 0
        while (k < bs) {
          val av = x.a(i * bs + k)
          if (av != 0L) {
            var j = 0
            while (j < bs) {
              out(i * bs + j) += av * y.a(k * bs + j)
              j += 1
            }
          }
          k += 1
        }
        i += 1
      }
      MatTile(x.r, y.c, out)
    }
    val reduced = partials
      .groupByKey(t => TileKey(t.r, t.c))
      .reduceGroups { (x, y) =>
        val s = new Array[Long](x.a.length)
        var i = 0
        while (i < s.length) { s(i) = x.a(i) + y.a(i); i += 1 }
        MatTile(x.r, x.c, s)
      }
      .map(_._2)
    reduced
      .flatMap { t =>
        for {
          li <- 0 until bs
          lj <- 0 until bs
          gi = t.r * bs + li
          gj = t.c * bs + lj
          if gi < rows && gj < cols
        } yield MatEntry(gi, gj, t.a(li * bs + lj))
      }
      .toDF("i", "j", "c")
  }
}
