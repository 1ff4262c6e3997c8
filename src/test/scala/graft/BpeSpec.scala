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

  test("encode: hand-computed fertility under full and partial merges") {
    val corpus = docs("aa aa ab")
    // full trajectory [(a,a),(a,b)]: aa→[aa], ab→[ab] → 3 subtokens
    val full = BpeOp.encode(corpus,
      BpeOp.train(corpus, 2).map(m => (m.left, m.right))).collect()
    assert(full.map(r => (r.getAs[Long]("ntok"), r.getAs[Long]("n_subtok"),
      r.getAs[Double]("fertility"))).toSeq == Seq((3L, 3L, 1.0)))
    // one merge [(a,a)]: aa→[aa] k=1, ab→[a,b] k=2 → 1+1+2 = 4
    val part = BpeOp.encode(corpus,
      BpeOp.train(corpus, 1).map(m => (m.left, m.right))).collect()
    assert(part.map(r => (r.getAs[Long]("ntok"), r.getAs[Long]("n_subtok")))
      .toSeq == Seq((3L, 4L)))
  }

  test("encode generalizes to unseen words (rules fold in learned order)") {
    // learn (a,a) then (aa,b) from "aab"-heavy text; apply to "aaab":
    // [a,a,a,b] → (a,a) greedy-leftmost → [aa,a,b] → (aa,b) no adjacent
    // aa,b? positions [aa, a, b] — not adjacent, so k = 3
    val m = BpeOp.train(docs("aab aab"), rounds = 2)
      .map(x => (x.left, x.right))
    assert(m == Seq(("a", "a"), ("aa", "b")))
    val r = BpeOp.encode(docs("aaab"), m).collect()
    assert(r.map(_.getAs[Long]("n_subtok")).toSeq == Seq(3L))
    // while "aab" itself reaches the fully-merged single symbol
    val r2 = BpeOp.encode(docs("aab"), m).collect()
    assert(r2.map(_.getAs[Long]("n_subtok")).toSeq == Seq(1L))
  }

  test("encode audit is partition-independent on the fixture corpus") {
    val base = Tables.t(spark, "/root/testdata/sf0.001", "documents")
    val m = BpeOp.train(base, rounds = 8).map(x => (x.left, x.right))
    val a = BpeOp.encode(base, m).orderBy("doc_id").collect()
    val b = BpeOp.encode(base.repartition(7), m).orderBy("doc_id").collect()
    assert(a.map(_.toString).toSeq == b.map(_.toString).toSeq)
    // fertility > 1 somewhere: 8 merges cannot collapse every word
    assert(a.exists(_.getAs[Double]("fertility") > 1.0))
  }
}
