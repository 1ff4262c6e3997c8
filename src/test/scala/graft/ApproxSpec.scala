package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Approximate aggregates — the sketch tier the reference lacks
  * entirely (SURVEY §2.5: "no distinct-count sketches, exact sets
  * only"). At 100 TB, exact distinct/quantiles shuffle every distinct
  * value; HLL++ (approx_count_distinct) and t-digest-style
  * (approx_percentile) sketches are fixed-size mergeable state.
  * No cross-engine oracle exists for sketches, so these are
  * tolerance-checked against exact answers. */
class ApproxSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.01"

  test("approx_count_distinct within 2% of exact") {
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
    val r = li.agg(
      countDistinct(col("l_partkey")).as("exact"),
      approx_count_distinct(col("l_partkey"), 0.01).as("approx")).head()
    val (exact, approx) = (r.getLong(0).toDouble, r.getLong(1).toDouble)
    assert(math.abs(approx - exact) / exact < 0.02, s"exact=$exact approx=$approx")
  }

  test("approx_percentile within 2 ranks of exact median") {
    val ev = Tables.t(spark, sf, "events")
    val r = ev.agg(
      expr("percentile(user_id, 0.5)").as("exact"),
      expr("approx_percentile(user_id, 0.5, 10000)").as("approx")).head()
    val exact = r.getDouble(0)
    val approx = r.getLong(1).toDouble
    assert(math.abs(approx - exact) <= 2.0, s"exact=$exact approx=$approx")
  }

  test("HLL sketches merge across groups like any monoid aggregate") {
    val ev = Tables.t(spark, sf, "events")
    // per-type sketched distincts vs global: merging per-group partials
    // happens inside partial/final HashAggregate; sanity: each group's
    // approx close to its exact
    val rows = ev.groupBy(col("event_type")).agg(
      countDistinct(col("user_id")).as("exact"),
      approx_count_distinct(col("user_id"), 0.02).as("approx")).collect()
    rows.foreach { r =>
      val e = r.getLong(1).toDouble
      val a = r.getLong(2).toDouble
      assert(math.abs(a - e) / e < 0.05, s"${r.getString(0)}: exact=$e approx=$a")
    }
  }
}
