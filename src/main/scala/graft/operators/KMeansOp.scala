package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

import graft.functions.VectorExprs.longSqDist

/** Iterative k-means over int64-scaled vectors — the full
  * assign→recenter loop of the reference's app/kmeans.cc:84-319,
  * distributed: each iteration is ONE broadcast of the k centroids
  * and ONE partial+final aggregation over the points (map-side
  * combine reduces the shuffle to k×dim longs per partition — the
  * exact shape of the reference's combiner). The driver holds only
  * the k centroids; points never leave executors.
  *
  * Deterministic: seeds are the first k vectors by id, distances are
  * exact integers (LongSqDist kernel), argmin ties break on centroid
  * id, and means are rounded HALF_UP — so results are independent of
  * partitioning, which the spec exploits.
  */
object KMeansOp {

  final case class Result(
      centroids: Array[Array[Long]],
      inertia: Seq[Double],  // per-iteration Σ min-dist², monotone ↓
      iterations: Int)

  /** @param vecs DataFrame with (idCol: long, vecCol: array<long>) */
  def fit(vecs: DataFrame, idCol: String, vecCol: String, k: Int,
          maxIter: Int = 10, tol: Double = 0.0): Result = {
    val spark = vecs.sparkSession
    val dim = vecs.select(size(col(vecCol))).head().getInt(0)
    var centroids: Array[Array[Long]] = vecs
      .orderBy(col(idCol)).limit(k)
      .select(col(vecCol)).collect()
      .map(_.getSeq[Long](0).toArray)
    val inertia = scala.collection.mutable.ArrayBuffer.empty[Double]
    var it = 0
    var done = false
    while (it < maxIter && !done) {
      val centDf = spark.createDataFrame(
        spark.sparkContext.parallelize(centroids.zipWithIndex.toSeq.map {
          case (c, i) => Row(i, c.toSeq)
        }, 1),
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("cid",
            org.apache.spark.sql.types.IntegerType),
          org.apache.spark.sql.types.StructField("cv",
            org.apache.spark.sql.types.ArrayType(
              org.apache.spark.sql.types.LongType, containsNull = false)))))
      val assigned = vecs
        .crossJoin(broadcast(centDf))
        .select(col(idCol), col(vecCol),
          struct(longSqDist(col(vecCol), col("cv")).as("d"), col("cid")).as("dc"))
        .groupBy(col(idCol), col(vecCol))
        .agg(min(col("dc")).as("best"))
        .select(col(vecCol).as("v"), col("best.cid").as("cid"),
          col("best.d").as("d"))
      // new centroid c_i = element-wise mean of members (exact int
      // sums; one aggregation, k×dim output)
      val stats = assigned
        .groupBy(col("cid"))
        .agg(count(lit(1)).as("n"),
          sum(col("d")).cast("double").as("sumd"),
          array((0 until dim).map(i =>
            sum(element_at(col("v"), i + 1))): _*).as("sums"))
        .collect()
      inertia += stats.map(_.getAs[Double]("sumd")).sum
      val next = centroids.clone()
      for (r <- stats) {
        val cid = r.getAs[Int]("cid")
        val n = r.getAs[Long]("n")
        val sums = r.getSeq[Long](r.fieldIndex("sums"))
        next(cid) = sums.map(s =>
          new java.math.BigDecimal(s).divide(new java.math.BigDecimal(n), 0,
            java.math.RoundingMode.HALF_UP).longValueExact()).toArray
      }
      val moved = centroids.zip(next).map { case (a, b) =>
        a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
      }.max
      done = moved <= tol
      centroids = next
      it += 1
    }
    Result(centroids, inertia.toSeq, it)
  }
}
