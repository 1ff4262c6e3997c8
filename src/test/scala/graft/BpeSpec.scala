package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.BpeOp

/** Semantics pins for the BPE trainer — the properties the q97
  * oracle's recursive-CTE replay relies on: position-weighted pair
  * counts, (count desc, pair asc) tie-break, greedy-leftmost merge
  * including the left==right run rule, and partition independence. */
class BpeSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def docs(texts: String*) = {
    import spark.implicits._
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
  }

  test("hand-computed trajectory: counts weight words and positions") {
    // words: "aa"×2, "ab"×1 → pairs (a,a):2, (a,b):1
    val m = BpeOp.train(docs("aa aa ab"), rounds = 2)
    assert(m.map(x => (x.round, x.left, x.right, x.pairN)) ==
      Seq((1, "a", "a", 2L), (2, "a", "b", 1L)))
    // after r1: {aa, a, b}; after r2: {aa, ab}
    assert(m.map(_.nSyms) == Seq(3L, 2L))
  }

  test("left==right run is greedy-leftmost: aaaa → [aa,aa], count 3") {
    // ONE word "aaaa": the (a,a) count is 3 (all adjacent positions,
    // the reference get_stats semantics), but the merge rewrite is
    // non-overlapping greedy → [aa, aa], so round 2 merges (aa, aa)
    val m = BpeOp.train(docs("aaaa"), rounds = 2)
    assert(m.map(x => (x.left, x.right, x.pairN, x.nSyms)) ==
      Seq(("a", "a", 3L, 1L), ("aa", "aa", 1L, 1L)))
    // and an odd run keeps its tail: "aaa" → [aa, a]
    val o = BpeOp.train(docs("aaa"), rounds = 1)
    assert(o.map(x => (x.left, x.right, x.pairN, x.nSyms)) ==
      Seq(("a", "a", 2L, 2L)))
  }

  test("equal counts break ties lexicographically on (left, right)") {
    val m = BpeOp.train(docs("cd ab"), rounds = 1)
    assert((m.head.left, m.head.right) == ("a", "b"))
  }

  test("merged symbols participate in later rounds (m+er composition)") {
    val m = BpeOp.train(
      Tables.t(spark, "/root/testdata/sf0.001", "documents"), rounds = 8)
    // non-increasing argmax counts (a merge can only shrink pair mass)
    val counts = m.map(_.pairN)
    assert(counts.zip(counts.tail).forall { case (a, b) => a >= b },
      s"pair counts not monotone: ${counts.mkString(",")}")
    // at least one rule consumes an earlier round's merged symbol
    val made = m.map(x => x.left + x.right).toSet
    assert(m.exists(x => made.contains(x.left) || made.contains(x.right)),
      s"no composed merge in ${m.map(x => s"${x.left}+${x.right}").mkString(",")}")
  }

  test("trajectory is partition-independent") {
    val base = Tables.t(spark, "/root/testdata/sf0.001", "documents")
    val a = BpeOp.train(base, rounds = 4)
    val b = BpeOp.train(base.repartition(7), rounds = 4)
    assert(a == b)
  }

  test("exhausted corpus fails loudly, not with a short vocabulary") {
    val e = intercept[IllegalArgumentException] {
      BpeOp.train(docs("ab"), rounds = 3) // 1 pair, then nothing
    }
    assert(e.getMessage.contains("no adjacent pairs left"))
  }
}
