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
    val scaled = ScaleUp.scaleTable(df, Seq("k" -> 5L, "fk" -> 13L), 3)
    assert(scaled.count() == 9)
    assert(scaled.select(col("k")).collect().map(_.getLong(0)).sorted.toSeq ==
      Seq(0L, 1L, 4L, 5L, 6L, 9L, 10L, 11L, 14L))
    // group cardinality scales with the data (the point of shifting)
    assert(scaled.select(col("fk")).distinct().count() == 9)
    // non-key columns replicate unchanged
    assert(scaled.groupBy(col("v")).count().collect()
      .forall(_.getLong(1) == 3L))
  }

  test("FK shifted by the REFERENCED table's step keeps joins consistent") {
    import spark.implicits._
    // dim has ids 0..4 but the fact only references 0..2: the FK must
    // shift by the dim's step (5), not by max(fk)+1 = 3
    val dim = Seq(0L, 1L, 2L, 3L, 4L).toDF("id")
    val fact = Seq((0L, 0L), (1L, 2L), (2L, 1L)).toDF("fid", "ref")
    val dimStep = 5L
    val sDim = ScaleUp.scaleTable(dim, Seq("id" -> dimStep), 4)
    val sFact = ScaleUp.scaleTable(fact, Seq("fid" -> 3L, "ref" -> dimStep), 4)
    // every scaled FK resolves, and only within its own copy's block
    val joined = sFact.join(sDim, col("ref") === col("id"))
    assert(joined.count() == sFact.count())
    assert(joined.filter(col("fid").divide(3).cast("long") =!=
      col("id").divide(5).cast("long")).count() == 0)
  }
}
