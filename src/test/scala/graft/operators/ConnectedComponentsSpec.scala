package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

class ConnectedComponentsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def cc(edges: Seq[(Long, Long)], vertices: Seq[Long]): Map[Long, Long] = {
    import spark.implicits._
    ConnectedComponents
      .components(edges.toDF("a", "b"), vertices.toDF("id"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("chain, triangle, and singletons label to component minima") {
    // chain 1-2-3-4 (diameter 3, forces multiple rounds), triangle
    // 10-11-12, singleton 20
    val labels = cc(
      Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L), (11L, 12L), (10L, 12L)),
      (1L to 4L) ++ Seq(10L, 11L, 12L, 20L))
    assert(labels == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 20L -> 20L))
  }

  test("long chain converges (diameter >> 2)") {
    val n = 30L
    val labels = cc((1L until n).map(i => (i, i + 1)), 1L to n)
    assert(labels.values.toSet == Set(1L))
  }

  test("result is partitioning-invariant") {
    import spark.implicits._
    val edges = (1L to 50L).map(i => (i, i % 10 + 100L))
    val one = ConnectedComponents.components(
      edges.toDF("a", "b").coalesce(1), (1L to 110L).toDF("id").coalesce(1))
    val many = ConnectedComponents.components(
      edges.toDF("a", "b").repartition(13), (1L to 110L).toDF("id").repartition(7))
    assert(one.collect().map(r => (r.getLong(0), r.getLong(1))).toSet ==
      many.collect().map(r => (r.getLong(0), r.getLong(1))).toSet)
  }

  test("star method agrees with minlabel on mixed graphs") {
    import spark.implicits._
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L), (11L, 12L),
      (10L, 12L), (7L, 7L), (2L, 1L)) // self-loop + duplicate included
    val vertices = ((1L to 4L) ++ Seq(7L, 10L, 11L, 12L, 20L))
    val a = ConnectedComponents
      .components(edges.toDF("a", "b"), vertices.toDF("id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val b = ConnectedComponents
      .components(edges.toDF("a", "b"), vertices.toDF("id"), method = "star")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(a == b)
  }

  test("star converges in O(log d) rounds on a diameter-1000 chain") {
    import spark.implicits._
    val n = 1000L
    val edges = (1L until n).map(i => (i, i + 1))
    val (labels, rounds) = ConnectedComponents.componentsWithRounds(
      edges.toDF("a", "b"), (1L to n).toDF("id"), method = "star")
    assert(labels.filter(col("cid") =!= 1L).count() == 0)
    // each large/small alternation at least halves the diameter:
    // log2(1000) ≈ 10, allow slack for the fixpoint-detection round
    assert(rounds <= 25, s"star took $rounds rounds on a 1000-chain")
  }

  test("minlabel needs O(d) rounds where star needs O(log d) (same chain)") {
    import spark.implicits._
    val n = 32L
    val edges = (1L until n).map(i => (i, i + 1))
    val (ml, mlRounds) = ConnectedComponents.componentsWithRounds(
      edges.toDF("a", "b"), (1L to n).toDF("id"))
    val (st, stRounds) = ConnectedComponents.componentsWithRounds(
      edges.toDF("a", "b"), (1L to n).toDF("id"), method = "star")
    assert(ml.collect().map(r => (r.getLong(0), r.getLong(1))).toSet ==
      st.collect().map(r => (r.getLong(0), r.getLong(1))).toSet)
    // min-label moves the component min one hop per round: rounds
    // track the diameter; star stays logarithmic
    assert(mlRounds >= n - 2, s"minlabel rounds: $mlRounds")
    assert(stRounds < mlRounds / 2, s"star $stRounds vs minlabel $mlRounds")
  }

  test("deduplicate keeps exactly one representative per clone group") {
    import spark.implicits._
    // 3 clone groups of 4 + 2 unique docs (group bodies fully disjoint
    // so cross-group jaccard is 0)
    val bodies = Seq(
      "alpha beta gamma delta epsilon zeta eta theta iota kappa",
      "red orange yellow green blue indigo violet amber teal coral",
      "monday tuesday wednesday thursday friday saturday sunday week month year")
    val docs = (0 until 12).map(i => (i.toLong, bodies(i % 3))) ++ Seq(
      (100L, "a one-off document about catalyst optimizer internals"),
      (101L, "another unique text concerning shuffle partitioning"))
    val deduped = graft.queries.Dedup.deduplicate(docs.toDF("doc_id", "text"))
    val kept = deduped.select(col("doc_id")).collect().map(_.getLong(0)).toSet
    assert(kept == Set(0L, 1L, 2L, 100L, 101L))
  }
}
