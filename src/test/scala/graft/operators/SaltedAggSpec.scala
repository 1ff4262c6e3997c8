package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

class SaltedAggSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("salted aggregation equals direct aggregation on a skewed table") {
    import spark.implicits._
    // 90% of rows share one key — the shape salting exists for
    val df = spark.range(100000)
      .select(
        when(col("id") % 10 < 9, lit("hot")).otherwise(concat(lit("k"), col("id") % 97))
          .as("k"),
        (col("id") % 1000).as("v"))
    val direct = df.groupBy(col("k"))
      .agg(count(lit(1)).as("n"), sum(col("v")).as("s"),
        min(col("v")).as("lo"), max(col("v")).as("hi"))
      .orderBy(col("k")).collect()
    val salted = SaltedAgg.aggregate(df, Seq(col("k")),
      Seq(SaltedAgg.countRows("n"), SaltedAgg.sumOf(col("v"), "s"),
        SaltedAgg.minOf(col("v"), "lo"), SaltedAgg.maxOf(col("v"), "hi")),
      buckets = 16, saltSource = Some(col("v")))
      .orderBy(col("key_0")).collect()
    assert(direct.length == salted.length)
    direct.zip(salted).foreach { case (d, s) =>
      assert(d.getString(0) == s.getString(0))
      (1 to 4).foreach(i => assert(d.getLong(i) == s.getLong(i), s"col $i of key ${d.getString(0)}"))
    }
  }

  test("partition-id salt (combiner shape) also matches") {
    import spark.implicits._
    val df = spark.range(10000).repartition(8)
      .select(lit("only").as("k"), col("id").as("v"))
    val salted = SaltedAgg.aggregate(df, Seq(col("k")),
      Seq(SaltedAgg.countRows("n"), SaltedAgg.sumOf(col("v"), "s")), buckets = 4)
      .collect()
    assert(salted.length == 1)
    assert(salted.head.getAs[Long]("n") == 10000L)
    assert(salted.head.getAs[Long]("s") == (0L until 10000L).sum)
  }
}
