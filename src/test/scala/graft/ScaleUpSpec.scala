package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.tools.ScaleUp

class ScaleUpSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("scaleTable replicates with disjoint shifted key blocks") {
    import spark.implicits._
    val df = Seq((0L, 10L, "a"), (1L, 11L, "b"), (4L, 12L, "c"))
      .toDF("k", "fk", "v")
    val scaled = ScaleUp.scaleTable(df, Seq("k", "fk"), 3)
    assert(scaled.count() == 9)
    // key blocks shift by max+1 = 5 (k) and 13 (fk): copies stay disjoint
    val ks = scaled.select(col("k")).collect().map(_.getLong(0)).sorted
    assert(ks.toSeq == Seq(0L, 1L, 4L, 5L, 6L, 9L, 10L, 11L, 14L))
    // group cardinality scales with the data (the point of shifting)
    assert(scaled.select(col("fk")).distinct().count() == 9)
    // non-key columns replicate unchanged
    assert(scaled.groupBy(col("v")).count().collect()
      .forall(_.getLong(1) == 3L))
  }
}
