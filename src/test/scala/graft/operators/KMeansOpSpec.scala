package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.Tables
import graft.functions.ExactCols

class KMeansOpSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def vecs = Tables.t(spark, "/root/testdata/sf0.001", "embeddings")
    .select(col("vec_id"), ExactCols.iscale(col("embedding")).as("v"))

  test("inertia decreases monotonically and the loop converges") {
    val r = KMeansOp.fit(vecs, "vec_id", "v", k = 4, maxIter = 8)
    assert(r.iterations >= 2)
    assert(r.inertia.sliding(2).forall { case Seq(a, b) => b <= a + 1e-6 },
      s"inertia not monotone: ${r.inertia}")
    assert(r.centroids.length == 4 && r.centroids.forall(_.length == 64))
  }

  test("result is independent of input partitioning") {
    val a = KMeansOp.fit(vecs.repartition(3), "vec_id", "v", k = 3, maxIter = 4)
    val b = KMeansOp.fit(vecs.repartition(11), "vec_id", "v", k = 3, maxIter = 4)
    assert(a.centroids.map(_.toSeq).toSeq == b.centroids.map(_.toSeq).toSeq)
    assert(a.inertia == b.inertia)
  }
}
