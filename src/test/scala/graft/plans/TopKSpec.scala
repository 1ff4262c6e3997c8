package graft.plans

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.Tables

class TopKSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private def aggBase = Tables.t(spark, sf, "events")
    .groupBy(col("event_type"), col("user_id"))
    .agg(Tables.dsum(col("value")).as("sum_value"))

  test("operator result equals the window formulation for several k") {
    import org.apache.spark.sql.expressions.Window
    for (k <- Seq(1, 3, 10)) {
      val w = Window.partitionBy(col("event_type"))
        .orderBy(col("sum_value").desc, col("user_id").asc)
      val viaWindow = aggBase.withColumn("rn", row_number().over(w))
        .filter(col("rn") <= k).drop("rn")
        .orderBy(col("event_type"), col("sum_value").desc, col("user_id"))
        .collect()
      val viaOp = TopK.perKey(aggBase, Seq(col("event_type")),
          Seq(col("sum_value").desc, col("user_id").asc), k)
        .orderBy(col("event_type"), col("sum_value").desc, col("user_id"))
        .collect()
      assert(viaOp.toSeq == viaWindow.toSeq, s"k=$k")
    }
  }

  test("plans as partial topk -> exchange -> final topk (no sort of the input)") {
    val df = TopK.perKey(aggBase, Seq(col("event_type")),
      Seq(col("sum_value").desc), 5)
    val p = df.queryExecution.executedPlan.toString
    assert("TopKPerKey \\[".r.findAllIn(p).size == 2, p)
    assert(p.contains("Exchange hashpartitioning(event_type"), p)
    // the window formulation would need a Sort; the operator must not
    assert(!p.contains("Sort ["), p)
  }

  test("result independent of input partitioning") {
    val a = TopK.perKey(aggBase.repartition(13), Seq(col("event_type")),
        Seq(col("sum_value").desc, col("user_id").asc), 4)
      .orderBy(col("event_type"), col("sum_value").desc, col("user_id")).collect()
    val b = TopK.perKey(aggBase.repartition(2), Seq(col("event_type")),
        Seq(col("sum_value").desc, col("user_id").asc), 4)
      .orderBy(col("event_type"), col("sum_value").desc, col("user_id")).collect()
    assert(a.toSeq == b.toSeq)
  }

  test("k larger than group size returns whole groups") {
    val n = aggBase.count()
    assert(TopK.perKey(aggBase, Seq(col("event_type")),
      Seq(col("user_id").asc), 100000).count() == n)
  }
}
