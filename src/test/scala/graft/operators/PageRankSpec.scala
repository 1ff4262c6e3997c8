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

  test("HITS: 2-round normalized trajectory replays exactly; hubs/authorities ordered") {
    import spark.implicits._
    // bipartite: hub side buys from authority side
    val bip = Seq(("h1", "s1"), ("h1", "s2"), ("h1", "s3"),
      ("h2", "s1"), ("h3", "s1"), ("h3", "s2"))
    val got = PageRank.hits(bip.toDF("src", "dst"), rounds = 2).collect()
      .map(r => (r.getAs[String]("node"), r.getAs[String]("role")) ->
        r.getAs[Long]("score")).toMap
    // independent JVM replay of the integer half-rounds
    def normalize(m: Map[String, Long]): Map[String, Long] = {
      val mx = m.values.max
      m.map { case (k, v) => k -> (BigInt(1000000) * v / mx).toLong }
    }
    var a = bip.map(_._2).distinct.map(_ -> 1000000L).toMap
    var h = Map.empty[String, Long]
    for (_ <- 1 to 2) {
      h = normalize(bip.groupBy(_._1).map { case (u, es) =>
        u -> es.map(e => a(e._2)).sum })
      a = normalize(bip.groupBy(_._2).map { case (v, es) =>
        v -> es.map(e => h(e._1)).sum })
    }
    for ((n, s) <- h) assert(got((n, "hub")) == s, s"hub $n")
    for ((n, s) <- a) assert(got((n, "authority")) == s, s"auth $n")
    // h1 (3 buys) tops hubs; s1 (3 buyers) tops authorities at 1e6
    assert(got(("h1", "hub")) == 1000000L)
    assert(got(("s1", "authority")) == 1000000L)
    assert(got(("h2", "hub")) < got(("h3", "hub")))
    assert(got(("s3", "authority")) < got(("s2", "authority")))
  }

  test("in-degree-0 sources keep contributing base mass on directed graphs") {
    import spark.implicits._
    // chain x → y → z: x has out-edges but no in-edges. It must stay
    // in the rank universe at base mass every round (so its out-edges
    // keep contributing), not silently drop out after round 1; z
    // (dangling, no out-edges) stays excluded by construction.
    val got = PageRank.ranks(Seq(("x", "y"), ("y", "z")).toDF("src", "dst"),
      rounds = 3).collect()
      .map(r => r.getAs[String]("node") -> r.getAs[Long]("r")).toMap
    // round 1: y = 150000 + ⌊.85·1e6⌋ = 1e6; rounds 2,3:
    // y = 150000 + ⌊850000·150000/1e6⌋ = 277500; x = base throughout
    assert(got == Map("x" -> 150000L, "y" -> 277500L))
  }

  test("result is independent of input partitioning") {
    val a = PageRank.ranks(edgesDf.repartition(7), rounds = 3)
      .orderBy(col("node")).collect().map(_.toString).toSeq
    val b = PageRank.ranks(edgesDf.repartition(2), rounds = 3)
      .orderBy(col("node")).collect().map(_.toString).toSeq
    assert(a == b)
  }

  /** PPR replay: base mass lands only on seeds, r₀ = 10⁶ on seeds. */
  private def replayPpr(seeds: Set[String], rounds: Int,
                        dampingPpm: Long): Map[String, Long] = {
    val dir = und ++ und.map(_.swap)
    val deg = dir.groupBy(_._1).map { case (n, es) => n -> es.size.toLong }
    var r = deg.keys.map(n => n -> (if (seeds(n)) 1000000L else 0L)).toMap
    for (_ <- 1 to rounds) {
      val contrib = dir.groupBy(_._2).map { case (dst, es) =>
        dst -> es.map { case (src, _) => BigInt(r(src) / deg(src)) }.sum
      }
      r = deg.keys.map { n =>
        n -> ((if (seeds(n)) 1000000L - dampingPpm else 0L) +
          (BigInt(dampingPpm) * contrib.getOrElse(n, BigInt(0)) / 1000000)
            .toLong)
      }.toMap
    }
    r
  }

  test("personalized ranks: exact seed-teleport trajectory, mass localizes") {
    import spark.implicits._
    val seeds = Seq("c").toDF("node")
    val got = PageRank.personalizedRanks(edgesDf, seeds, rounds = 3)
      .collect().map(r => r.getAs[String]("node") -> r.getAs[Long]("r")).toMap
    assert(got == replayPpr(Set("c"), 3, 850000L))
    // proximity ordering: the seed and its hub neighbor outrank the
    // 2-hop nodes; nothing is negative; non-seeds carry no base mass
    assert(got("c") > got("a") && got("c") > got("b"))
    assert(got("h") > got("a") && got("h") > got("b"))
    assert(got.values.forall(_ >= 0L))
  }

  test("personalized ranks: partition-invariant and seed-set sensitive") {
    import spark.implicits._
    val seeds = Seq("a").toDF("node")
    val p7 = PageRank.personalizedRanks(edgesDf.repartition(7), seeds, 3)
      .orderBy(col("node")).collect().map(_.toString).toSeq
    val p2 = PageRank.personalizedRanks(edgesDf.repartition(2), seeds, 3)
      .orderBy(col("node")).collect().map(_.toString).toSeq
    assert(p7 == p2)
    // a different seed produces a different proximity field
    val other = PageRank.personalizedRanks(edgesDf, Seq("c").toDF("node"), 3)
      .orderBy(col("node")).collect().map(_.toString).toSeq
    assert(p7 != other)
  }
}
