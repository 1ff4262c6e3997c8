package graft.functions

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Native text kernels vs their declarative reference forms — the
  * kernels exist for speed only, so equivalence is the entire
  * contract (incl. duplicates, unicode, empties, nulls). */
class TextExprsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("SetHitCount == size(filter(lambda)) incl. duplicates and misses") {
    import spark.implicits._
    val words = Seq("the", "a", "of")
    val df = Seq(
      "the cat of the house",      // the×2, of×1 → 3
      "a a a",                     // 3
      "none here",                 // 0
      "",                          // 0
      "thé the θ"                  // unicode near-miss: only "the" → 1
    ).toDF("text").withColumn("toks", ExactCols.tokens(col("text")))
    val got = df.select(TextExprs.setHitCount(col("toks"), words)).collect().map(_.getLong(0))
    val ref = df.select(size(filter(col("toks"),
      t => words.map(w => t === w).reduce(_ || _))).cast(LongType))
      .collect().map(_.getLong(0))
    assert(got.toSeq == ref.toSeq)
    assert(got.toSeq == Seq(3L, 3L, 0L, 0L, 1L))
  }

  test("SetHitCount: null input is null") {
    import spark.implicits._
    val df = Seq(Some("x y"), None).toDF("text")
      .withColumn("toks", when(col("text").isNotNull, ExactCols.tokens(col("text"))))
    val rows = df.select(TextExprs.setHitCount(col("toks"), Seq("x"))).collect()
    assert(rows(0).getLong(0) == 1L)
    assert(rows(1).isNullAt(0))
  }

  test("TermCounts == per-term size(filter(lambda)) incl. duplicates/unicode/null") {
    import spark.implicits._
    val words = Seq("the", "a", "of")
    val df = Seq(
      Some("the cat of the house"),   // (2, 0, 1)
      Some("a a a"),                  // (0, 3, 0)
      Some("none here"),              // (0, 0, 0)
      Some(""),                       // (0, 0, 0)
      Some("thé the θ a"),            // unicode near-miss → (1, 1, 0)
      None                            // null → null
    ).toDF("text")
      .withColumn("toks", when(col("text").isNotNull, ExactCols.tokens(col("text"))))
    val got = df.select(TextExprs.termCounts(col("toks"), words)).collect()
      .map(r => if (r.isNullAt(0)) null else r.getSeq[Long](0))
    val ref = df.select(array(words.map(w =>
      size(filter(col("toks"), t => t === w)).cast(LongType)): _*))
      .collect()
      // the declarative form yields array(null,null,null) for null toks
      .map(r => if (r.isNullAt(0) || r.getSeq[Any](0).contains(null)) null
                else r.getSeq[Long](0))
    assert(got.toSeq == ref.toSeq)
    assert(got(0) == Seq(2L, 0L, 1L) && got(4) == Seq(1L, 1L, 0L) && got(5) == null)
  }

  test("BlockHash == transform(sequence) declarative form incl. unicode/short/null") {
    import spark.implicits._
    val b = 3
    val df = Seq(
      Some("a b c d e f g"),          // 2 blocks, tail dropped
      Some("a b c"),                  // exactly 1 block
      Some("a b"),                    // < b → empty
      Some(""),                       // empty tokens → empty
      Some("thé θ x y z w"),          // multi-byte utf-8 in the md5 bytes
      None                            // null → null
    ).toDF("text")
      .withColumn("toks", when(col("text").isNotNull, ExactCols.tokens(col("text"))))
    val got = df.select(TextExprs.blockHash(col("toks"), b)).collect()
      .map(r => if (r.isNullAt(0)) null else r.getSeq[Long](0))
    val nblocks = floor(size(col("toks")) / lit(b)).cast("int")
    val ref = df.select(when(col("toks").isNotNull,
      when(nblocks >= 1,
        transform(sequence(lit(1), nblocks), j =>
          ExactCols.hmod(array_join(
            slice(col("toks"), (j - lit(1)) * lit(b) + lit(1), lit(b)), " "))))
      .otherwise(array().cast("array<bigint>")))).collect()
      .map(r => if (r.isNullAt(0)) null else r.getSeq[Long](0))
    assert(got.toSeq == ref.toSeq)
    assert(got(0).size == 2 && got(1).size == 1 && got(2) == Seq() && got(5) == null)
  }

  test("AlnumCount == length(regexp_replace('[^A-Za-z0-9]')) incl. unicode") {
    import spark.implicits._
    val df = Seq(
      "abc 123 XYZ!", "", "...---...",
      "héllo wörld 42",      // multi-byte chars contribute 0
      "日本語 a1"             // CJK contributes 0; 'a','1' count
    ).toDF("text")
    val got = df.select(TextExprs.alnumCount(col("text"))).collect().map(_.getLong(0))
    val ref = df.select(
      length(regexp_replace(col("text"), "[^A-Za-z0-9]", "")).cast(LongType))
      .collect().map(_.getLong(0))
    assert(got.toSeq == ref.toSeq)
    assert(got.toSeq == Seq(9L, 0L, 0L, 10L, 2L))
  }

  test("WinnowFingerprint kernel == posexplode/window formulation") {
    import org.apache.spark.sql.expressions.Window
    import spark.implicits._
    import ExactCols._
    val W = 4
    val M = 1L << 20
    // short docs (< w windows), exact-w docs, long docs, hash-tie
    // pressure via repeated shingles, and an empty doc
    val docs = Seq(
      (0L, "a b c"),                                  // 1 shingle
      (1L, "a b c d"),                                // 2 shingles < w
      (2L, "a b c d e f"),                            // exactly w windows
      (3L, (1 to 40).map(i => s"t${i % 7}").mkString(" ")), // repeats → ties
      (4L, ""),                                       // empty
      (5L, (1 to 100).map(i => s"w$i").mkString(" "))
    ).toDF("doc_id", "text")
    val sh = shingles(tokens(col("text")), 3, distinct = false)
    val kernel = docs
      .select(col("doc_id"), TextExprs.winnowFingerprint(sh, W).as("wf"))
      .select(col("doc_id"), col("wf.n_fp").as("n_fp"), col("wf.fp").as("fp"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // the reference formulation the kernel replaced
    val ex = docs.select(col("doc_id"), posexplode(sh))
      .select(col("doc_id"), col("pos"), hmod(col("col")).as("h"))
    val frame = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
      .rowsBetween(Window.currentRow, W - 1)
    val whole = Window.partitionBy(col("doc_id"))
    val agg = ex
      .withColumn("enc", min(col("h") * M + (lit(M) - (col("pos") + 1))).over(frame))
      .withColumn("m", count(lit(1)).over(whole))
      .filter(col("pos") <= greatest(col("m") - W, lit(0)))
      .select(col("doc_id"), expr(s"enc div $M").as("sh")).distinct()
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_fp"), (sum(col("sh")) % P).as("fp"))
    val windowed = docs.select(col("doc_id")).join(agg, Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("n_fp"), lit(0L)), coalesce(col("fp"), lit(0L)))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(kernel == windowed)
    assert(kernel.exists { case (id, n, _) => id == 4L && n == 0L }) // empty doc → 0
  }

  test("tokens (array_remove form) == filter-lambda form") {
    import spark.implicits._
    val df = Seq("  a  b ", "", " ", "x", "a b  c").toDF("text")
    val a = df.select(ExactCols.tokens(col("text"))).collect().map(_.getSeq[String](0))
    val b = df.select(filter(split(col("text"), " "), t => t =!= ""))
      .collect().map(_.getSeq[String](0))
    assert(a.toSeq == b.toSeq)
  }

  test("CommonAffix == scala reference on edge-case pairs") {
    import spark.implicits._
    def ref(a: Seq[String], b: Seq[String]): (Long, Long) = {
      val n = math.min(a.length, b.length)
      val p = (0 until n).takeWhile(i => a(i) == b(i)).length.toLong
      val sfx = (0 until n)
        .takeWhile(i => a(a.length - 1 - i) == b(b.length - 1 - i)).length.toLong
      (p, sfx)
    }
    val cases: Seq[(Seq[String], Seq[String])] = Seq(
      (Seq("a", "b", "c"), Seq("a", "b", "c")),       // identical → (3,3)
      (Seq("a", "b", "c"), Seq("a", "b")),            // prefix containment
      (Seq("x", "b", "c"), Seq("a", "b", "c")),       // shared tail only
      (Seq("a", "b", "c", "d"), Seq("a", "x", "c", "d")),
      (Seq.empty[String], Seq("a")),                  // empty side → (0,0)
      (Seq.empty[String], Seq.empty[String]),
      (Seq("a"), Seq("b")),
      (Seq("thé", "θ"), Seq("thé", "x")),             // unicode tokens
      (Seq("a", "a", "a"), Seq("a", "a"))             // overlap both ends
    )
    val df = cases.toDF("a", "b")
    val got = df.select(TextExprs.commonAffix(col("a"), col("b")).as("af"))
      .select(col("af.prefix"), col("af.suffix"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSeq == cases.map { case (a, b) => ref(a, b) })
  }

  test("CommonAffix: null input is null") {
    import spark.implicits._
    val df = Seq((Some(Seq("a")), None: Option[Seq[String]]))
      .toDF("a", "b")
    val rows = df.select(TextExprs.commonAffix(col("a"), col("b"))).collect()
    assert(rows(0).isNullAt(0))
  }
}
