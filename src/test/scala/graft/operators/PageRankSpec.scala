package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

class PageRankSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  // undirected 4-node graph: hub h — a, h — b, h — c, plus a — b;
  // passed as both directions (the q138 symmetrization)
  private val und = Seq(("h", "a"), ("h", "b"), ("h", "c"), ("a", "b"))
  private def edgesDf = {
    import spark.implicits._
    (und ++ und.map(_.swap)).toDF("src", "dst")
  }

  /** Independent JVM replay of the integer round:
    * r'(v) = base + ⌊d · Σ ⌊r(u)/deg(u)⌋ / 10⁶⌋. */
  private def replay(rounds: Int, dampingPpm: Long): Map[String, Long] = {
    val dir = und ++ und.map(_.swap)
    val deg = dir.groupBy(_._1).map { case (n, es) => n -> es.size.toLong }
    var r = deg.keys.map(_ -> 1000000L).toMap
    for (_ <- 1 to rounds) {
      val contrib = dir.groupBy(_._2).map { case (dst, es) =>
        dst -> es.map { case (src, _) => BigInt(r(src) / deg(src)) }.sum
      }
      r = contrib.map { case (n, s) =>
        n -> ((1000000L - dampingPpm) +
          (BigInt(dampingPpm) * s / 1000000).toLong)
      }
    }
    r
  }

  test("3-round integer trajectory replays exactly on a hand graph") {
    val got = PageRank.ranks(edgesDf, rounds = 3).collect()
      .map(r => r.getAs[String]("node") -> r.getAs[Long]("r")).toMap
    assert(got == replay(3, 850000L))
    // the hub must outrank every spoke, and c (degree 1) ranks last
    assert(got("h") > got("a") && got("h") > got("b") && got("h") > got("c"))
    assert(got("c") < got("a") && got("c") < got("b"))
    // every rank carries at least the undamped base mass
    assert(got.values.forall(_ >= 150000L))
  }

  test("damping knob and round count flow through exactly") {
    val got = PageRank.ranks(edgesDf, rounds = 2, dampingPpm = 500000L)
      .collect().map(r => r.getAs[String]("node") -> r.getAs[Long]("r")).toMap
    assert(got == replay(2, 500000L))
  }

  test("result is independent of input partitioning") {
    val a = PageRank.ranks(edgesDf.repartition(7), rounds = 3)
      .orderBy(col("node")).collect().map(_.toString).toSeq
    val b = PageRank.ranks(edgesDf.repartition(2), rounds = 3)
      .orderBy(col("node")).collect().map(_.toString).toSeq
    assert(a == b)
  }
}
