package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.ExactCols._

/** Invariant checks for the corpus-preparation operators (q71–q76).
  * The DuckDB oracle pins exact values; these tests pin the
  * PROPERTIES that make each operator correct — redaction totality,
  * funnel monotonicity, packing accounting identities, argmax
  * equivalence against an independent window formulation, and
  * containment bounds — so a future refactor cannot silently keep the
  * oracle green while breaking the semantics. */
class PipelineSpec extends AnyFunSuite {
  private val sf = "/root/testdata/sf0.001"
  private lazy val spark = SparkTestSession.spark

  test("q71: redaction is total — no digit-run survives the rewrite") {
    val red = Tables.t(spark, sf, "customer")
      .select(regexp_replace(col("c_name"), "[0-9]{4,}", "<ID>").as("r"))
    val leftover = red.filter(regexp_count(col("r"), lit("[0-9]{4,}")) > 0).count()
    assert(leftover == 0L)
    // and the audit counts cover every customer (all names carry an ID run)
    val agg = SparkEntry.queries("q71_pii_redact")(spark, sf).collect()
    assert(agg.map(_.getAs[Long]("n_hits")).sum ==
      agg.map(_.getAs[Long]("n")).sum)
  }

  test("q72: funnel retention is monotonically non-increasing") {
    val rows = SparkEntry.queries("q72_filter_funnel")(spark, sf)
      .orderBy("stage").collect()
    assert(rows.length == 6)
    val docs = rows.map(_.getAs[Long]("docs"))
    val toks = rows.map(_.getAs[Long]("toks_kept"))
    assert(docs.zip(docs.tail).forall { case (a, b) => a >= b },
      s"docs not monotone: ${docs.mkString(",")}")
    assert(toks.zip(toks.tail).forall { case (a, b) => a >= b },
      s"tokens not monotone: ${toks.mkString(",")}")
    assert(docs.head > docs.last, "funnel filtered nothing — thresholds dead")
  }

  test("q73: packing accounting identities hold per shard") {
    val rows = SparkEntry.queries("q73_seq_packing")(spark, sf).collect()
    assert(rows.length > 1)
    for (r <- rows) {
      val total = r.getAs[Long]("total_tokens")
      val nSeqs = r.getAs[Long]("n_seqs")
      val docs = r.getAs[Long]("docs")
      val spanning = r.getAs[Long]("n_spanning")
      assert(nSeqs == (total + 255) / 256, s"shard ${r.get(0)}: seq count")
      assert(spanning <= docs && spanning <= nSeqs,
        s"shard ${r.get(0)}: $spanning spanning docs vs $docs docs / $nSeqs seqs")
    }
    val allDocs = Tables.t(spark, sf, "documents")
      .filter(size(tokens(col("text"))) > 0).count()
    assert(rows.map(_.getAs[Long]("docs")).sum == allDocs)
  }

  test("q74: struct-min argmax equals the window row_number formulation") {
    val viaOperator = SparkEntry.queries("q74_tfidf_top1")(spark, sf)
      .select("doc_id", "top_term", "score")
    val docs = Tables.t(spark, sf, "documents")
    val ex = docs.select(col("doc_id"), explode(tokens(col("text"))).as("term"))
    val tf = ex.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val dfc = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val n = docs.count().toDouble
    val scored = tf.join(dfc, "term")
      .withColumn("score", col("tf").cast("double") *
        ((lit(n) - col("df").cast("double") + lit(0.5)) /
          (col("df").cast("double") + lit(0.5))))
    val w = Window.partitionBy("doc_id").orderBy(col("score").desc, col("term"))
    val viaWindow = scored.withColumn("rk", row_number().over(w))
      .filter(col("rk") === 1)
      .select(col("doc_id"), col("term").as("top_term"), col("score"))
    assert(viaOperator.exceptAll(viaWindow).isEmpty &&
      viaWindow.exceptAll(viaOperator).isEmpty)
  }

  test("q75: duplicate blocks exist and per-doc counts stay bounded") {
    val rows = SparkEntry.queries("q75_block_dedup")(spark, sf).collect()
    assert(rows.forall(r => r.getAs[Long]("n_dup") <= r.getAs[Long]("n_blocks")))
    // the corpus plants near-dup pairs sharing ≥8-token runs
    assert(rows.map(_.getAs[Long]("n_dup")).sum > 0)
  }

  test("q76: contamination counts match a brute shingle-set intersection") {
    val got = SparkEntry.queries("q76_decontaminate")(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_contaminated")).toMap
    val docs = Tables.t(spark, sf, "documents")
      .select(col("doc_id"),
        (hmod(col("doc_id").cast("string")) % 100).as("bucket"),
        shingles(tokens(col("text")), 5, distinct = true).as("sg"))
      .collect()
    val train = docs.filter(_.getAs[Long]("bucket") < 80)
      .flatMap(_.getAs[scala.collection.Seq[String]]("sg")).toSet
    val brute = docs.filter(_.getAs[Long]("bucket") >= 90)
      .map(r => r.getAs[Long]("doc_id") ->
        r.getAs[scala.collection.Seq[String]]("sg").count(train.contains).toLong).toMap
    assert(got == brute)
    assert(got.values.sum > 0, "no contamination found — split or shingles broken")
  }
}
