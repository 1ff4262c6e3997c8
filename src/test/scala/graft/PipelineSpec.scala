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

  test("q82: bloom-prefiltered decontamination equals the q76 shuffled form") {
    val a = SparkEntry.queries("q76_decontaminate")(spark, sf).collect()
    val b = SparkEntry.queries("q82_decontaminate_bloom")(spark, sf).collect()
    assert(a.map(_.toString).toSeq == b.map(_.toString).toSeq,
      "bloom path diverged from the exact form — FP leak or lost hit")
    // and the train side really is pruned by the probe, in the plan
    val plan = SparkEntry.queries("q82_decontaminate_bloom")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("bloom_might_contain"), "train scan not Bloom-pruned")
  }

  test("q79: sampling is per-stratum, membership-checksummed, and hash-pure") {
    val rows = SparkEntry.queries("q79_stratified_sample")(spark, sf).collect()
    assert(rows.length == 5)
    // en is downsampled (rate 250‰) vs everything else (600‰)
    val frac = rows.map(r => r.getAs[String]("lang") ->
      r.getAs[Long]("n_kept").toDouble / r.getAs[Long]("n_total")).toMap
    val (enF, restF) = (frac("en"), (frac - "en").values)
    assert(restF.forall(enF < _),
      s"en $enF should be sampled below every other stratum $frac")
    // the checksum is the sum-of-id-hashes of the kept set — recompute
    // membership independently from the documented rule
    val docs = Tables.t(spark, sf, "documents")
      .select(col("doc_id"), col("lang")).collect()
    def h(s: String): Long =
      BigInt(java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
        .take(15), 16).toLong
    val expect = docs.groupBy(_.getAs[String]("lang")).map { case (lang, ds) =>
      val kept = ds.filter { r =>
        val id = r.getAs[Long]("doc_id")
        h(s"sample:$id") % P % 1000 < (if (lang == "en") 250 else 600)
      }
      lang -> (kept.map(r => h(r.getAs[Long]("doc_id").toString) % P).sum % P)
    }
    val got = rows.map(r =>
      r.getAs[String]("lang") -> r.getAs[Long]("kept_checksum")).toMap
    assert(got == expect)
  }

  test("q80: importance weights are exact rationals favoring the target lang") {
    val rows = SparkEntry.queries("q80_importance_weights")(spark, sf).collect()
    assert(rows.length == 25)
    // weight is literally num/den (one IEEE division, no accumulation)
    assert(rows.forall { r =>
      r.getAs[Double]("weight") ==
        r.getAs[Long]("num").toDouble / r.getAs[Long]("den")
    })
    // importance ranking must ENRICH the target distribution: the
    // target-lang share of the top-25 exceeds its corpus base rate
    // (hashed 128-bucket features mix languages, so dominance is not
    // expected — enrichment is the property DSIR actually claims)
    val langOf = Tables.t(spark, sf, "documents")
      .select(col("doc_id"), col("lang")).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("lang")).toMap
    val nEn = rows.count(r => langOf(r.getAs[Long]("doc_id")) == "en")
    val baseRate = langOf.values.count(_ == "en").toDouble / langOf.size
    assert(nEn.toDouble / 25 > baseRate,
      s"top-25 en share ${nEn / 25.0} does not beat base rate $baseRate")
    // decision is partition-pure: the same weights come back when the
    // input is actually scattered across a different partitioning
    // (int64 sums + one final division — no accumulation-order float)
    val ex = graft.queries.Pipeline.dsirFeatures(
      Tables.t(spark, sf, "documents").repartition(7))
    val again = graft.queries.Pipeline
      .dsirWeights(ex, graft.queries.Pipeline.dsirBuckets(ex))
      .orderBy(col("weight").desc, col("doc_id")).limit(25).collect()
    assert(rows.map(_.toString).toSeq == again.map(_.toString).toSeq)
  }

  test("q85: mix rates are exact integer division, the cap fires, audits reconcile") {
    val rows = SparkEntry.queries("q85_source_mix")(spark, sf).collect()
    assert(rows.length == 20)
    for (r <- rows) {
      val share = r.getAs[String]("source") match {
        case "src0" => 200L; case "src1" => 150L; case _ => 30L
      }
      // rate replays the integer floor division, capped at 1000 ‰
      assert(r.getAs[Long]("rate") ==
        math.min(1000L, 8000L * share / r.getAs[Long]("src_tokens")))
      assert(r.getAs[Long]("n_kept") <= r.getAs[Long]("n_total"))
      assert(r.getAs[Long]("kept_tokens") <= r.getAs[Long]("src_tokens"))
    }
    // the boosted src0 share exceeds its token mass → cap fires →
    // EVERY src0 doc kept; the default share genuinely downsamples
    val bySrc = rows.map(r => r.getAs[String]("source") -> r).toMap
    assert(bySrc("src0").getAs[Long]("rate") == 1000L)
    assert(bySrc("src0").getAs[Long]("n_kept") == bySrc("src0").getAs[Long]("n_total"))
    assert(rows.count(r => r.getAs[Long]("n_kept") < r.getAs[Long]("n_total")) >= 15)
    // decision is partition-pure: identical audit from a scattered scan
    val again = graft.queries.Pipeline.sourceMixSample(
      Tables.t(spark, sf, "documents").repartition(7),
      8000L, Map("src0" -> 200L, "src1" -> 150L), 30L)
      .orderBy(col("source")).collect()
    assert(rows.map(_.toString).toSeq == again.map(_.toString).toSeq)
  }

  test("q87: shard audit partitions the corpus and pins a stable permutation") {
    val rows = SparkEntry.queries("q87_shard_shuffle")(spark, sf).collect()
    val total = Tables.t(spark, sf, "documents").count()
    assert(rows.map(_.getAs[Long]("n_docs")).sum == total)
    assert(rows.length == 32 && rows.forall(_.getAs[Long]("n_docs") > 0))
    // hash sharding balances: no shard above 3× the mean at n=500
    val max = rows.map(_.getAs[Long]("n_docs")).max
    assert(max <= 3 * total / 32, s"shard skew: max $max of $total")
    // the permutation (not just membership) is partition-independent:
    // same order checksums from a scattered scan
    val again = graft.queries.Pipeline.shardAudit(
      Tables.t(spark, sf, "documents").repartition(7))
      .orderBy(col("shard")).collect()
    assert(rows.map(_.toString).toSeq == again.map(_.toString).toSeq)
    // and the checksum is genuinely order-sensitive: reversing the
    // intra-shard sort direction changes it (membership identical)
    val rev = {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("shard"))
        .orderBy(col("skey").desc, col("doc_id").desc)
      Tables.t(spark, sf, "documents")
        .select(col("doc_id"),
          (hmod(concat(lit("shard:"), col("doc_id").cast("string"))) % 32).as("shard"),
          hmod(concat(lit("pos:"), col("doc_id").cast("string"))).as("skey"))
        .withColumn("pos", row_number().over(w).cast("long"))
        .groupBy(col("shard"))
        .agg((sum((col("pos") * (hmod(col("doc_id").cast("string")) % 1000000L)) % P) % P)
          .as("order_checksum"))
        .collect().map(r => r.getAs[Long]("shard") -> r.getAs[Long]("order_checksum")).toMap
    }
    val fwd = rows.map(r => r.getAs[Long]("shard") -> r.getAs[Long]("order_checksum")).toMap
    assert(rev != fwd, "checksum failed to distinguish shard orderings")
  }

  test("q88: classifier score is the exact mean of int64 bucket weights; keep ≡ score ≥ 0") {
    val rows = SparkEntry.queries("q88_quality_classifier")(spark, sf).collect()
    val docs = Tables.t(spark, sf, "documents")
    assert(rows.length == docs.count())
    for (r <- rows) {
      val ntok = r.getAs[Long]("ntok")
      val num = r.getAs[Long]("score_num")
      assert(ntok > 0) // corpus has no empty docs
      // score is EXACTLY num/ntok (one IEEE division of exact ints)
      assert(r.getAs[Double]("score") == num.toDouble / ntok)
      assert(r.getAs[Boolean]("keep") == (num >= 0L))
    }
    // threshold 0 over ~uniform[-1000,1000] weights splits the corpus
    // (the score actually discriminates — not all-keep/all-drop)
    val nKeep = rows.count(_.getAs[Boolean]("keep"))
    assert(nKeep > 0 && nKeep < rows.length, s"degenerate keep: $nKeep")
    // ntok matches the independent token count
    val ntoks = docs.select(col("doc_id"), size(tokens(col("text"))).cast("long").as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    for (r <- rows)
      assert(r.getAs[Long]("ntok") == ntoks(r.getAs[Long]("doc_id")))
    // decision is partition-pure: identical rows from a scattered scan
    val w = spark.range(512).select(col("id").as("bucket"),
      (hmod(concat(lit("w:"), col("id").cast("string"))) % 2001L - 1000L).as("w"))
    val again = graft.queries.Pipeline.classifierScore(docs.repartition(7), w)
      .orderBy(col("doc_id")).collect()
    assert(rows.map(_.toString).toSeq == again.map(_.toString).toSeq)
    // clone-collapse pin: on a corpus where every text appears twice
    // (shifted ids), each clone scores identically to its original —
    // the collapsed plan is result-identical to the per-doc formula
    val shift = docs.count()
    val cloned = docs.select(col("doc_id"), col("text"))
      .union(docs.select((col("doc_id") + shift).as("doc_id"), col("text")))
    val cscores = graft.queries.Pipeline.classifierScore(cloned, w)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("ntok"), r.getAs[Long]("score_num"),
          r.getAs[Double]("score"), r.getAs[Boolean]("keep")))).toMap
    assert(cscores.size == 2 * rows.length)
    for (r <- rows) {
      val id = r.getAs[Long]("doc_id")
      val expect = (r.getAs[Long]("ntok"), r.getAs[Long]("score_num"),
        r.getAs[Double]("score"), r.getAs[Boolean]("keep"))
      assert(cscores(id) == expect)
      assert(cscores(id + shift) == expect)
    }
  }

  test("q90: vocab membership is total-ordered and OOV accounting closes") {
    val docs = Tables.t(spark, sf, "documents")
    val rows = graft.queries.Pipeline.vocabOovAudit(docs).collect()
    assert(rows.length == docs.count())
    // accounting: n_oov <= ntok, rate consistent, keep matches the integers
    for (r <- rows) {
      val (ntok, noov) = (r.getAs[Long]("ntok"), r.getAs[Long]("n_oov"))
      assert(noov <= ntok)
      if (ntok > 0)
        assert(r.getAs[Double]("oov_rate") == noov.toDouble / ntok)
      assert(r.getAs[Boolean]("keep") == (ntok > 0 && noov * 1000 <= ntok * 450))
    }
    assert(rows.exists(_.getAs[Boolean]("keep")) &&
      rows.exists(!_.getAs[Boolean]("keep")), "thresholds dead")
    // determinism: same result from a repartitioned scan (vocab ties
    // at the cut are broken by the total (count desc, token) order)
    val again = graft.queries.Pipeline.vocabOovAudit(docs.repartition(7))
      .orderBy(col("doc_id")).collect()
    assert(rows.sortBy(_.getAs[Long]("doc_id")).map(_.toString).toSeq ==
      again.map(_.toString).toSeq)
    // clone invariance: doubling the corpus scales every vocab count
    // uniformly, so the top-V set — and every original doc's row —
    // is unchanged, and each clone matches its original
    val shift = docs.count()
    val cloned = docs.select(col("doc_id"), col("text"))
      .union(docs.select((col("doc_id") + shift).as("doc_id"), col("text")))
    val cv = graft.queries.Pipeline.vocabOovAudit(cloned)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("ntok"), r.getAs[Long]("n_oov"),
          r.getAs[Boolean]("keep")))).toMap
    assert(cv.size == 2 * rows.length)
    for (r <- rows) {
      val id = r.getAs[Long]("doc_id")
      val expect = (r.getAs[Long]("ntok"), r.getAs[Long]("n_oov"),
        r.getAs[Boolean]("keep"))
      assert(cv(id) == expect && cv(id + shift) == expect)
    }
  }

  test("q91: collapsed commonness equals the direct uncollapsed formula") {
    val docs = Tables.t(spark, sf, "documents")
    val got = graft.queries.Pipeline.commonnessScore(docs, threshold = 900L)
      .orderBy(col("doc_id")).collect()
    // independent uncollapsed reference: explode all docs, join freq
    val ex = docs.select(col("doc_id"), explode(tokens(col("text"))).as("tok"))
    val freq = ex.groupBy(col("tok")).agg(count(lit(1)).as("cnt"))
    val ref = ex.join(freq, "tok").groupBy(col("doc_id"))
      .agg(count(lit(1)).as("ntok"), sum(col("cnt")).as("num"))
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("ntok"), r.getAs[Long]("num")))).toMap
    assert(got.length == docs.count())
    for (r <- got; if r.getAs[Long]("ntok") > 0) {
      val (ntok, num) = ref(r.getAs[Long]("doc_id"))
      assert(r.getAs[Long]("ntok") == ntok && r.getAs[Long]("num") == num)
      assert(r.getAs[Double]("score") == num.toDouble / ntok)
      assert(r.getAs[Boolean]("keep") == (num >= 900L * ntok))
    }
    // and on a corpus with exact clones, a clone scores as its original
    val shift = docs.count()
    val cloned = docs.select(col("doc_id"), col("text"))
      .union(docs.select((col("doc_id") + shift).as("doc_id"), col("text")))
    val cs = graft.queries.Pipeline.commonnessScore(cloned)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("ntok"), r.getAs[Long]("num")))).toMap
    assert(cs.size == 2 * shift)
    for ((id, v) <- cs; if id < shift) assert(cs(id + shift) == v)
  }

  test("q92: source cap keeps min(k, total) per source, deterministically") {
    val docs = Tables.t(spark, sf, "documents")
    val rows = graft.queries.Pipeline.sourceCapAudit(docs, k = 10).collect()
    val totals = docs.groupBy(col("source")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows.length == totals.size)
    for (r <- rows) {
      val src = r.getAs[String]("source")
      assert(r.getAs[Long]("n_total") == totals(src))
      assert(r.getAs[Long]("n_kept") == math.min(10L, totals(src)))
    }
    // the checksum (membership, not just count) survives repartitioning
    val again = graft.queries.Pipeline.sourceCapAudit(docs.repartition(7), k = 10)
      .orderBy(col("source")).collect()
    assert(rows.sortBy(_.getAs[String]("source")).map(_.toString).toSeq ==
      again.map(_.toString).toSeq)
  }

  test("gopherKeep predicate ≡ the funnel's cumulative stage 5 (no drift)") {
    val docs = Tables.t(spark, sf, "documents")
    val viaPredicate = docs
      .filter(graft.queries.Pipeline.gopherKeep(col("text"))).count()
    val stage5 = graft.queries.Pipeline
      .funnelTable(graft.queries.Pipeline.funnelStats(docs, "text"))
      .filter(col("stage") === "5_repetition").collect()(0)
    assert(viaPredicate == stage5.getAs[Long]("docs"))
  }

  test("q94: end-to-end prep audit reconciles with its composed stages") {
    val docs = Tables.t(spark, sf, "documents")
    val kept = graft.queries.Dedup.deduplicate(docs)
      .filter(graft.queries.Pipeline.gopherKeep(col("text")))
      .filter((hmod(concat(lit("sample:"), col("doc_id").cast("string"))) % 1000) <
        when(col("lang") === "en", 250L).otherwise(600L))
    val nKept = kept.count()
    val audit = SparkEntry.queries("q94_corpus_prep_e2e")(spark, sf).collect()
    assert(audit.map(_.getAs[Long]("n_docs")).sum == nKept)
    assert(nKept > 0 && nKept < docs.count(),
      "composition filtered nothing (or everything) — stages dead")
    // and the per-shard audit is exactly shardAudit of the kept set
    val direct = graft.queries.Pipeline.shardAudit(kept, numShards = 8)
      .orderBy(col("shard")).collect()
    assert(audit.map(_.toString).toSeq == direct.map(_.toString).toSeq)
  }

  test("q95: drop reasons partition the corpus; 0_kept ≡ q94's shard total") {
    val docs = Tables.t(spark, sf, "documents")
    val rows = SparkEntry.queries("q95_drop_reasons")(spark, sf).collect()
      .map(r => r.getAs[String]("reason") ->
        ((r.getAs[Long]("n"), r.getAs[Long]("docs_checksum")))).toMap
    assert(rows.values.map(_._1).sum == docs.count(), "reasons do not partition")
    assert(rows.size == 4, s"degenerate stage among ${rows.keySet}")
    val keptViaQ94 = SparkEntry.queries("q94_corpus_prep_e2e")(spark, sf)
      .collect().map(_.getAs[Long]("n_docs")).sum
    assert(rows("0_kept")._1 == keptViaQ94)
  }

  test("q96: span dedup keeps exactly one occurrence per distinct block") {
    val docs = Tables.t(spark, sf, "documents")
    val rows = graft.queries.Pipeline.spanDedupAudit(docs).collect()
    // accounting identity: removals = block instances − distinct hashes
    // (first-occurrence keep ⇒ one survivor per distinct block hash)
    val ex = docs.select(explode(
      graft.functions.TextExprs.blockHash(tokens(col("text")), 8)).as("h"))
    val total = ex.count()
    val distinct = ex.distinct().count()
    assert(rows.map(_.getAs[Long]("n_blocks")).sum == total)
    assert(rows.map(_.getAs[Long]("n_removed")).sum == total - distinct)
    // rewritten length: kept_tokens = ntok − 8·n_removed, tail kept
    val ntoks = docs.select(col("doc_id"),
      size(tokens(col("text"))).cast("long").as("ntok"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    for (r <- rows)
      assert(r.getAs[Long]("kept_tokens") ==
        ntoks(r.getAs[Long]("doc_id")) - 8 * r.getAs[Long]("n_removed"))
    // membership checksum (not just counts) survives repartitioning
    val again = graft.queries.Pipeline.spanDedupAudit(docs.repartition(7))
      .orderBy(col("doc_id")).collect()
    assert(rows.sortBy(_.getAs[Long]("doc_id")).map(_.toString).toSeq ==
      again.map(_.toString).toSeq)
  }

  test("q99: epoch plan replays the integer arithmetic; all regimes live") {
    val docs = Tables.t(spark, sf, "documents")
    val rows = graft.queries.Pipeline.epochPlan(docs, 40000L,
      Map("src0" -> 100L, "src1" -> 50L), 10L).collect()
    val share = Map("src0" -> 100L, "src1" -> 50L).withDefaultValue(10L)
    for (r <- rows) {
      val src = r.getAs[String]("source")
      val tok = r.getAs[Long]("src_tokens")
      val budget = 40000L * share(src) / 1000L
      assert(r.getAs[Long]("epochs") == budget / tok, s"$src epochs")
      assert(r.getAs[Long]("rem_rate") == (budget % tok) * 1000L / tok,
        s"$src rem_rate")
      // planned = full passes + the sampled remainder (never exceeds
      // budget by more than one remainder pass of whole docs)
      assert(r.getAs[Long]("planned_tokens") >=
        r.getAs[Long]("epochs") * tok, s"$src planned")
    }
    // the corpus exercises repeat (≥2), exactly-one, and sub-epoch
    val eps = rows.map(_.getAs[Long]("epochs")).toSet
    assert(eps.contains(0L) && eps.contains(1L) && eps.exists(_ >= 2L),
      s"regimes missing: $eps")
    // membership checksum survives repartitioning
    val again = graft.queries.Pipeline.epochPlan(docs.repartition(7), 40000L,
      Map("src0" -> 100L, "src1" -> 50L), 10L)
      .orderBy(col("source")).collect()
    assert(rows.sortBy(_.getAs[String]("source")).map(_.toString).toSeq ==
      again.map(_.toString).toSeq)
  }

  test("q100: subtoken packing reconciles with q98's encode totals") {
    val pack = SparkEntry.queries("q100_bpe_pack")(spark, sf).collect()
    val enc = SparkEntry.queries("q98_bpe_encode")(spark, sf).collect()
    // every subtoken the encoder produced lands in exactly one shard
    assert(pack.map(_.getAs[Long]("total_subtok")).sum ==
      enc.map(_.getAs[Long]("n_subtok")).sum)
    assert(pack.map(_.getAs[Long]("docs")).sum ==
      enc.count(_.getAs[Long]("n_subtok") > 0))
    // per shard: the sequence count is the ceil of its subtoken total
    for (r <- pack)
      assert(r.getAs[Long]("n_seqs") ==
        (r.getAs[Long]("total_subtok") + 255) / 256, s"shard ${r.get(0)}")
    assert(pack.length == 8)
  }

  test("q101: ensemble votes are exactly the member gates' decisions") {
    val rows = SparkEntry.queries("q101_quality_ensemble")(spark, sf)
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    // each vote column reproduces its source gate bit-for-bit
    for (r <- SparkEntry.queries("q88_quality_classifier")(spark, sf).collect())
      assert(rows(r.getAs[Long]("doc_id")).getAs[Boolean]("v_classifier") ==
        r.getAs[Boolean]("keep"))
    for (r <- SparkEntry.queries("q90_vocab_oov")(spark, sf).collect())
      assert(rows(r.getAs[Long]("doc_id")).getAs[Boolean]("v_oov") ==
        r.getAs[Boolean]("keep"))
    for (r <- SparkEntry.queries("q91_commonness")(spark, sf).collect())
      assert(rows(r.getAs[Long]("doc_id")).getAs[Boolean]("v_common") ==
        r.getAs[Boolean]("keep"))
    val gopherCount = rows.values.count(_.getAs[Boolean]("v_gopher"))
    val stage5 = graft.queries.Pipeline.funnelTable(
      graft.queries.Pipeline.funnelStats(
        Tables.t(spark, sf, "documents"), "text"))
      .filter(col("stage") === "5_repetition").collect()(0).getAs[Long]("docs")
    assert(gopherCount.toLong == stage5)
    // majority semantics + a live disagreement spectrum
    for (r <- rows.values)
      assert(r.getAs[Boolean]("keep") == (r.getAs[Long]("n_votes") >= 3L))
    val dist = rows.values.groupBy(_.getAs[Long]("n_votes")).keySet
    assert(dist.size >= 3, s"vote spectrum degenerate: $dist")
  }

  test("qualityEnsemble (shared token table) ≡ the 4-operator composition, column for column") {
    import graft.queries.Pipeline
    val docs = Tables.t(spark, sf, "documents")
    val w = spark.range(512).select(col("id").as("bucket"),
      (hmod(concat(lit("w:"), col("id").cast("string"))) % 2001L - 1000L)
        .as("w"))
    // the composition exactly as the r7 q101 gate wired it
    val g = docs.select(col("doc_id"),
      Pipeline.gopherKeep(col("text")).as("v_gopher"))
    val c = Pipeline.classifierScore(docs, w)
      .select(col("doc_id"), col("keep").as("v_classifier"))
    val o = Pipeline.vocabOovAudit(docs)
      .select(col("doc_id"), col("keep").as("v_oov"))
    val m = Pipeline.commonnessScore(docs, threshold = 900L)
      .select(col("doc_id"), col("keep").as("v_common"))
    val nv = Seq("v_gopher", "v_classifier", "v_oov", "v_common")
      .map(v => when(col(v), 1L).otherwise(0L)).reduce(_ + _)
    val comp = g.join(c, "doc_id").join(o, "doc_id").join(m, "doc_id")
      .withColumn("n_votes", nv)
      .withColumn("keep", col("n_votes") >= 3)
    val ens = Pipeline.qualityEnsemble(docs, w, commonThreshold = 900L)
    assert(ens.columns.toSeq == comp.columns.toSeq)
    assert(ens.collect().map(_.toString).toSet ==
      comp.collect().map(_.toString).toSet)
    // and a tokenless doc flows through with every vote false
    import spark.implicits._
    val edge = Seq((1L, "the quick brown fox jumps over a lazy dog today ok"),
      (2L, ""), (3L, "   ")).toDF("doc_id", "text")
    val er = Pipeline.qualityEnsemble(edge, w).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(er.size == 3)
    for (id <- Seq(2L, 3L); vc <- Seq("v_classifier", "v_oov", "v_common"))
      assert(!er(id).getAs[Boolean](vc), s"doc $id vote $vc")
  }

  test("q96: the survivor is the corpus-wide FIRST occurrence") {
    import spark.implicits._
    // doc 1 = A...A (intra-doc dup at j=2), doc 2 repeats doc 1's
    // block A, doc 3 is clean; 8-token blocks, tails < 8 always kept
    val a = (1 to 8).map(i => s"a$i").mkString(" ")
    val c = (1 to 8).map(i => s"c$i").mkString(" ")
    val docs = Seq(
      (1L, s"$a $a tail1 tail2"),     // blocks: A@1, A@2 → keep j=1 only
      (2L, s"$a extra"),              // block A@1 → removed (doc 1 first)
      (3L, c)                         // block C@1 → kept
    ).toDF("doc_id", "text")
    val r = graft.queries.Pipeline.spanDedupAudit(docs)
      .orderBy(col("doc_id")).collect()
    assert(r.map(x => (x.getAs[Long]("doc_id"), x.getAs[Long]("n_blocks"),
      x.getAs[Long]("n_removed"), x.getAs[Long]("kept_tokens"))).toSeq ==
      Seq((1L, 2L, 1L, 10L), (2L, 1L, 1L, 1L), (3L, 1L, 0L, 8L)))
    // doc 2's block is removed, doc 1's j=1 copy survives — so doc 1's
    // checksum carries h·1 and doc 2's is zero
    assert(r(1).getAs[Long]("kept_checksum") == 0L)
    assert(r(0).getAs[Long]("kept_checksum") > 0L)
  }

  test("q103: sliding spans are shift-invariant where blocked hashing is not") {
    import spark.implicits._
    // doc 2 repeats doc 1's 10-token run OFFSET BY ONE token — no
    // 8-token BLOCK boundary aligns, so q75 sees zero duplicate
    // blocks, while every sliding window inside the run repeats
    val run = (1 to 10).map(i => s"r$i").mkString(" ")
    val docs = Seq(
      (1L, s"$run x1 x2 x3 x4 x5 x6"),   // run at pos 1..10
      (2L, s"shift $run y1 y2 y3 y4 y5") // run at pos 2..11
    ).toDF("doc_id", "text")
    val bh = docs.select(col("doc_id"),
      explode(graft.functions.TextExprs.blockHash(tokens(col("text")), 8)).as("h"))
    val blockDups = bh.groupBy(col("h")).agg(count(lit(1)).as("c"))
      .filter(col("c") > 1).count()
    val r = graft.queries.Pipeline.repeatedSpanAudit(docs)
      .orderBy(col("doc_id")).collect()
      .map(x => x.getAs[Long]("doc_id") ->
        (x.getAs[Long]("n_spans"), x.getAs[Long]("dup_tokens"))).toMap
    // the shared 10-token run has 3 sliding 8-grams (starts 1..3 /
    // 2..4) each duplicated; they merge into ONE maximal span
    // covering exactly the 10 run tokens in each doc
    assert(r(1L) == (1L, 10L) && r(2L) == (1L, 10L))
    assert(blockDups == 0L,
      "blocked hashing unexpectedly caught the misaligned run")
  }

  test("q103: adjacent islands merge, separated islands do not") {
    import spark.implicits._
    val a = (1 to 8).map(i => s"a$i").mkString(" ")
    val b = (1 to 8).map(i => s"b$i").mkString(" ")
    val docs = Seq(
      (1L, s"$a gap1 gap2 gap3 $b"), // two dup runs split by a 3-token gap
      (2L, s"$a $b"),                // the same runs ADJACENT → one span?
      (3L, s"$a $b")                 // clone of doc 2 (dup source)
    ).toDF("doc_id", "text")
    val r = graft.queries.Pipeline.repeatedSpanAudit(docs)
      .orderBy(col("doc_id")).collect()
      .map(x => x.getAs[Long]("doc_id") ->
        (x.getAs[Long]("n_spans"), x.getAs[Long]("dup_tokens"))).toMap
    // doc 1: windows containing gap tokens are unique, so the a-run
    // and b-run stay two separate 8-token spans
    assert(r(1L) == (2L, 16L), s"doc1 got ${r(1L)}")
    // docs 2/3 are clones: EVERY window duplicates → one 16-token span
    assert(r(2L) == (1L, 16L) && r(3L) == (1L, 16L))
  }

  test("q104: CDC kernel matches the hmod reference; insertions re-align") {
    import spark.implicits._
    def refChunks(ts: Seq[String]): Seq[Long] = {
      val out = scala.collection.mutable.ArrayBuffer.empty[Long]
      var cur = List.empty[String]
      for ((t, i) <- ts.zipWithIndex) {
        cur = t :: cur
        if (hmodJvm(t) % 16 == 0 || i == ts.length - 1) {
          out += hmodJvm(cur.reverse.mkString(" ")); cur = Nil
        }
      }
      out.toSeq
    }
    val toksA = (1 to 200).map(i => s"t$i")
    // a non-boundary prefix token, so only B's FIRST chunk absorbs it
    val ins = (1 to 100).map(i => s"ins$i")
      .find(t => hmodJvm(t) % 16 != 0).get
    val toksB = ins +: toksA
    val docs = Seq((1L, toksA.mkString(" ")), (2L, toksB.mkString(" ")))
      .toDF("doc_id", "text")
    val got = docs.select(col("doc_id"),
        graft.functions.TextExprs.cdcChunkHash(tokens(col("text")), 16).as("chs"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toList).toMap
    assert(got(1L) == refChunks(toksA).toList)
    assert(got(2L) == refChunks(toksB).toList)
    val k = got(1L).size
    assert(k > 3, "no content boundaries hit — corpus too short")
    // content-defined boundaries re-align after the insertion: every
    // chunk but the first is shared between the two docs
    assert(got(2L).size == k && got(2L).tail == got(1L).tail)
    // ...which fixed 8-token blocks cannot do (shift by one token)
    val bh = docs.select(
      explode(graft.functions.TextExprs.blockHash(tokens(col("text")), 8)).as("h"))
    assert(bh.groupBy(col("h")).agg(count(lit(1)).as("c"))
      .filter(col("c") > 1).count() == 0L)
    // and the audit counts exactly the k−1 re-aligned chunks per doc
    val audit = graft.queries.Pipeline.cdcChunkAudit(docs)
      .orderBy(col("doc_id")).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_chunks"), r.getAs[Long]("n_dup"))).toMap
    assert(audit(1L) == (k.toLong, k.toLong - 1L))
    assert(audit(2L) == (k.toLong, k.toLong - 1L))
  }

  test("q103: clone-collapsed counts are exact on a replicated corpus") {
    import spark.implicits._
    // two clones of one doc + one unique doc: EVERY window of the
    // cloned text is corpus-duplicated (weighted count 2), so each
    // clone reports one maximal span covering all its tokens; the
    // unique doc shares no window and reports zero spans
    val a = (1 to 12).map(i => s"a$i").mkString(" ")
    val u = (1 to 12).map(i => s"u$i").mkString(" ")
    val docs = Seq((1L, a), (2L, a), (3L, u)).toDF("doc_id", "text")
    val r = graft.queries.Pipeline.repeatedSpanAudit(docs)
      .orderBy(col("doc_id")).collect()
      .map(x => x.getAs[Long]("doc_id") ->
        ((x.getAs[Long]("n_spans"), x.getAs[Long]("dup_tokens"),
          x.getAs[Long]("span_checksum")))).toMap
    assert(r(1L) == ((1L, 12L, (1L * 4096L + 12L) % P)))
    assert(r(1L) == r(2L), "clones must report identical spans")
    assert(r(3L) == ((0L, 0L, 0L)))
  }

  test("q103/q104: audits are partition-pure (same rows from a 7-way scatter)") {
    val docs = Tables.t(spark, sf, "documents")
    for (op <- Seq[org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame](
      graft.queries.Pipeline.repeatedSpanAudit(_),
      graft.queries.Pipeline.cdcChunkAudit(_))) {
      val base = op(docs).orderBy(col("doc_id")).collect()
      val scattered = op(docs.repartition(7)).orderBy(col("doc_id")).collect()
      assert(base.map(_.toString).toSeq == scattered.map(_.toString).toSeq)
      assert(base.nonEmpty)
    }
  }

  test("q147: backoff LM — train-slice docs fully seen, backoff live elsewhere, clones invariant") {
    val docs = Tables.t(spark, sf, "documents")
    val rows = graft.queries.Pipeline.backoffLmScore(docs, "src0")
      .orderBy(col("doc_id")).collect()
    val srcOf = docs.select("doc_id", "source").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(rows.length == srcOf.size)
    var unseenElsewhere = 0L
    for (r <- rows) {
      val id = r.getAs[Long]("doc_id")
      val unseen = r.getAs[Long]("n_unseen")
      assert(unseen >= 0 && unseen <= r.getAs[Long]("nbg"))
      assert(r.getAs[Long]("num") >= 0)
      // the training slice's own bigrams are all in the model
      if (srcOf(id) == "src0") assert(unseen == 0L, s"train doc $id")
      else unseenElsewhere += unseen
    }
    assert(unseenElsewhere > 0L, "backoff path never fired")
    // clone invariance: duplicating a non-train doc must not move any
    // score (the model sees only src0; scoring is text-pure)
    val other = docs.filter(col("source") =!= "src0").limit(1)
    val cloned = docs.unionByName(
      other.withColumn("doc_id", col("doc_id") + 1000000L))
    val again = graft.queries.Pipeline.backoffLmScore(cloned, "src0")
      .filter(col("doc_id") < 1000000L).orderBy(col("doc_id")).collect()
    assert(rows.map(_.toString).toSeq == again.map(_.toString).toSeq)
  }

  test("q109: collapsed bigram score ≡ direct uncollapsed formula; clones invariant") {
    val docs = Tables.t(spark, sf, "documents")
    val got = graft.queries.Pipeline.bigramLmScore(docs, threshold = 34500L)
      .orderBy(col("doc_id")).collect()
    // independent uncollapsed reference: explode bigram instances,
    // corpus counts, marginal by prefix, floor-ratio join-back
    val ex = docs.select(col("doc_id"),
      explode(shingles(tokens(col("text")), 2, distinct = false)).as("bg"))
    val c2 = ex.groupBy(col("bg")).agg(count(lit(1)).as("c2"))
      .withColumn("pr", substring_index(col("bg"), " ", 1))
    val c1 = c2.groupBy(col("pr")).agg(sum(col("c2")).as("c1"))
    val ref = ex.join(c2.join(c1, "pr")
        .select(col("bg"), expr("(1000000 * c2) div c1").as("r")), "bg")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("nbg"), sum(col("r")).as("num"))
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("nbg"), r.getAs[Long]("num")))).toMap
    assert(got.length == docs.count())
    var kept = 0
    for (r <- got; if r.getAs[Long]("nbg") > 0) {
      val (nbg, num) = ref(r.getAs[Long]("doc_id"))
      assert(r.getAs[Long]("nbg") == nbg && r.getAs[Long]("num") == num)
      assert(r.getAs[Double]("score") == num.toDouble / nbg)
      assert(r.getAs[Boolean]("keep") == (num >= 34500L * nbg))
      if (r.getAs[Boolean]("keep")) kept += 1
    }
    assert(kept > 0 && kept < got.length, s"degenerate keep split: $kept")
    // clone invariance: doubling the corpus scales c2 and c1 uniformly,
    // so the ratio table — hence every doc's score — is unchanged, and
    // each clone scores exactly as its original
    val shift = docs.count()
    val cloned = docs.select(col("doc_id"), col("text"))
      .union(docs.select((col("doc_id") + shift).as("doc_id"), col("text")))
    val cs = graft.queries.Pipeline.bigramLmScore(cloned)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("nbg"), r.getAs[Long]("num")))).toMap
    assert(cs.size == 2 * shift)
    for ((id, v) <- cs; if id < shift) {
      assert(cs(id + shift) == v, s"clone of $id diverges")
      assert(v == ref(id), s"cloned corpus shifts doc $id's score")
    }
  }

  test("q110: temperature rates replay ⌊√tokens⌋ arithmetic; audits reconcile") {
    val docs = Tables.t(spark, sf, "documents")
    val totals = graft.queries.Pipeline.sourceTokenTotals(docs)
      .collect().map(r => r.getAs[String]("source") ->
        r.getAs[Long]("src_tokens")).toMap
    val w = totals.map { case (s, t) => s -> math.sqrt(t.toDouble).floor.toLong }
    val sumw = w.values.sum
    val rows = SparkEntry.queries("q110_temperature_mix")(spark, sf).collect()
    assert(rows.length == totals.size)
    for (r <- rows) {
      val src = r.getAs[String]("source")
      val ws = w(src)
      val share = ws * 1000L / sumw
      val rate = math.min(1000L, 25000L * share / totals(src))
      assert(r.getAs[Long]("w") == ws)
      assert(r.getAs[Long]("rate") == rate, s"$src rate mismatch")
      assert(r.getAs[Long]("n_kept") <= r.getAs[Long]("n_total"))
      assert(r.getAs[Long]("kept_tokens") <= r.getAs[Long]("src_tokens"))
    }
    // τ = 1/2 flattens: the per-mille rate SPREAD must be strictly
    // narrower than linear (τ = 1) weighting would produce on the same
    // budget scale — the whole point of temperature mixing
    val rates = rows.map(_.getAs[Long]("rate"))
    assert(rates.distinct.length > 1, "degenerate: all rates equal")
  }

  test("q114: worst window localizes a garbled span; accounting + clone invariance") {
    val docs = Tables.t(spark, sf, "documents")
    val rows = SparkEntry.queries("q114_noise_spans")(spark, sf).collect()
    assert(rows.length == docs.count())
    var flags = 0
    for (r <- rows) {
      val nbg = r.getAs[Long]("nbg")
      assert(r.getAs[Long]("n_windows") == math.max(0L, nbg - 7),
        s"doc ${r.getAs[Long]("doc_id")}: window count broken")
      assert(r.getAs[Boolean]("flag") ==
        (r.getAs[Long]("n_windows") > 0 && r.getAs[Long]("worst_sum") < 232000L))
      if (r.getAs[Boolean]("flag")) flags += 1
    }
    assert(flags > 0 && flags < rows.length, s"degenerate flag split: $flags")
    // engineered localization: fluent docs alternate 'a b'; the
    // garbled doc carries a run of a→a transitions (common prefix,
    // rare transition — the unsmoothed-bigram noise signature). Its
    // worst window must be strictly below every fluent doc's and sit
    // at the run's first all-anomalous window (pos 9, tie-break asc)
    import spark.implicits._
    val fluent = (1L to 10L).map(i => (i, Seq.fill(12)("a b").mkString(" ")))
    val garbled = (11L,
      (Seq.fill(4)("a b") ++ Seq.fill(10)("a") ++ Seq.fill(4)("a b")).mkString(" "))
    val fix = (fluent :+ garbled).toDF("doc_id", "text")
    val out = graft.queries.Pipeline.noiseSpanAudit(fix).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    val g = out(11L)
    assert(fluent.forall { case (i, _) =>
      out(i).getAs[Long]("worst_sum") > g.getAs[Long]("worst_sum") })
    assert(g.getAs[Long]("worst_pos") == 9L,
      s"worst_pos ${g.getAs[Long]("worst_pos")} missed the garbled run")
    // clone invariance: uniform cloning scales c2 and c1 together, so
    // every ratio — hence every window sum and argmin — is unchanged
    val shift = docs.count()
    val cloned = docs.select(col("doc_id"), col("text"))
      .union(docs.select((col("doc_id") + shift).as("doc_id"), col("text")))
    def key(r: org.apache.spark.sql.Row) =
      (r.getAs[Long]("nbg"), r.getAs[Long]("n_windows"),
        r.getAs[Long]("worst_sum"), r.getAs[Long]("worst_pos"))
    val cs = graft.queries.Pipeline.noiseSpanAudit(cloned).collect()
      .map(r => r.getAs[Long]("doc_id") -> key(r)).toMap
    for (r <- rows) {
      val id = r.getAs[Long]("doc_id")
      assert(cs(id) == key(r), s"cloned corpus shifts doc $id")
      assert(cs(id + shift) == key(r), s"clone of $id diverges")
    }
  }

  test("q111: chunk accounting closes — Σ window tokens = ntok + overlap mass") {
    val docs = Tables.t(spark, sf, "documents")
    val rows = SparkEntry.queries("q111_context_chunks")(spark, sf).collect()
    assert(rows.length == docs.count())
    for (r <- rows) {
      val n = r.getAs[Long]("ntok")
      val m = r.getAs[Long]("n_chunks")
      val expectM = if (n <= 16) 1L else (n - 16 + 11) / 12 + 1
      assert(m == expectM, s"doc ${r.getAs[Long]("doc_id")}: m=$m != $expectM")
      // full windows are 16, the last is n − (m−1)·12: the identity
      assert(r.getAs[Long]("chunk_tokens") == n + (m - 1) * 4,
        s"doc ${r.getAs[Long]("doc_id")}: overlap accounting broken")
    }
    // partition purity: scan-stage kernel → same rows from any scatter
    val base = graft.queries.Pipeline.chunkAudit(docs)
      .orderBy(col("doc_id")).collect()
    val scattered = graft.queries.Pipeline.chunkAudit(docs.repartition(7))
      .orderBy(col("doc_id")).collect()
    assert(base.map(_.toString).toSeq == scattered.map(_.toString).toSeq)
  }

  test("q120: span extents exact on an engineered leak; flags ≡ q76 membership") {
    import spark.implicits._
    // ids chosen by the SPLIT RULE itself (hmod(id)%100): 2,3 train
    // (<80); 1,4 eval (≥90) — verified constants, the q76 buckets
    val run = (1 to 10).map(i => s"leak$i").mkString(" ")
    val docs = Seq(
      (2L, s"filler1 $run filler2"),        // train doc carrying the leak
      (3L, "other train words only here"),  // train noise
      (1L, s"x1 x2 $run y1 y2"),            // eval: leak at tokens 3..12
      (4L, "c1 c2 c3 c4 c5 c6 clean")       // eval: no overlap
    ).toDF("doc_id", "text")
    val r = graft.queries.Pipeline.contaminationSpanAudit(docs)
      .orderBy(col("doc_id")).collect()
      .map(x => x.getAs[Long]("doc_id") ->
        (x.getAs[Long]("n_hits"), x.getAs[Long]("n_spans"),
          x.getAs[Long]("max_span_tokens"), x.getAs[Long]("flagged_tokens"),
          x.getAs[Long]("span_checksum"))).toMap
    assert(r.keySet == Set(1L, 4L)) // eval docs only
    // 10-token run at positions 3..12 → six 5-gram hits (p=3..8),
    // one merged span [3,12] → checksum (3·4096+12) % P
    assert(r(1L) == (6L, 1L, 10L, 10L, 3L * 4096L + 12L), s"got ${r(1L)}")
    assert(r(4L) == (0L, 0L, 0L, 0L, 0L))
    // anti-drift vs q76 on the real corpus: a doc has a positional hit
    // iff it has a distinct-shingle hit (same k, same split rule)
    val real = Tables.t(spark, sf, "documents")
    val spanFlagged = graft.queries.Pipeline.contaminationSpanAudit(real)
      .filter(col("n_hits") > 0).select("doc_id").collect()
      .map(_.getLong(0)).toSet
    val q76 = real.select(col("doc_id"),
        (hmod(col("doc_id").cast("string")) % 100).as("bucket"),
        shingles(tokens(col("text")), 5, distinct = true).as("sg"))
    val train = q76.filter(col("bucket") < 80)
      .select(explode(col("sg")).as("sh"))
      .select(hmod(col("sh")).as("h")).distinct()
    val membershipFlagged = q76.filter(col("bucket") >= 90)
      .select(col("doc_id"), explode(col("sg")).as("sh"))
      .select(col("doc_id"), hmod(col("sh")).as("h"))
      .join(train, Seq("h"), "leftsemi")
      .select("doc_id").distinct().collect().map(_.getLong(0)).toSet
    assert(spanFlagged == membershipFlagged)
  }

  test("q121: next-fit fold exact (order-sensitive), accounting identities hold") {
    import spark.implicits._
    // one shard, budget 10, doc sizes 6,5,4,3,2 — hash order vs
    // size-desc order genuinely differ in next-fit seq count, and a
    // 23-token doc exercises the dedicated ⌈ntok/budget⌉ rule
    val sizes = Map(1L -> 6, 2L -> 5, 3L -> 4, 4L -> 3, 5L -> 2, 6L -> 23)
    val docs = sizes.toSeq.map { case (id, n) =>
      (id, (1 to n).map(i => s"w$i").mkString(" "))
    }.toDF("doc_id", "text")
    val r = graft.queries.Pipeline
      .packingEfficiencyAudit(docs, budget = 10L, numShards = 1)
      .collect()
      .map(x => x.getAs[String]("strategy") ->
        (x.getAs[Long]("n_seqs"), x.getAs[Long]("total_tokens"),
          x.getAs[Long]("pad_tokens"), x.getAs[Long]("util_ppm"))).toMap
    val total = sizes.values.sum.toLong
    // independent JVM replay of the fold in BOTH orders
    def fold(order: Seq[Long]): Long = {
      var nseq = 0L; var fill = 0L
      order.map(sizes(_).toLong).foreach { n =>
        if (n >= 10L) { if (fill > 0) { nseq += 1; fill = 0 }; nseq += (n + 9) / 10 }
        else if (fill + n <= 10L) fill += n
        else { nseq += 1; fill = n }
      }
      nseq + (if (fill > 0) 1L else 0L)
    }
    def hj(s: String) = hmodJvm(s)
    val byHash = sizes.keys.toSeq.sortBy(id => (hj(s"pack:$id"), id))
    val byLen = sizes.keys.toSeq
      .sortBy(id => (-sizes(id), hj(s"pack:$id"), id))
    assert(r("b_nextfit")._1 == fold(byHash))
    assert(r("c_nextfit_sorted")._1 == fold(byLen))
    // next-fit IS order-sensitive (the reason b and c are separate
    // strategies): interleaved 5,6,5,6 wastes a seq that grouped
    // 5,5,6,6 does not
    def foldSizes(ns: Seq[Long]): Long = {
      var nseq = 0L; var fill = 0L
      ns.foreach { n =>
        if (fill + n <= 10L) fill += n else { nseq += 1; fill = n }
      }
      nseq + (if (fill > 0) 1L else 0L)
    }
    assert(foldSizes(Seq(5L, 6L, 5L, 6L)) == 4L)
    assert(foldSizes(Seq(5L, 5L, 6L, 6L)) == 3L)
    assert(r("a_pad_each")._1 ==
      sizes.values.map(n => (n + 9L) / 10L).sum)
    assert(r("d_concat")._1 == (total + 9) / 10)
    // identities: pad = capacity − tokens; util = floor(1e6·t/cap)
    r.values.foreach { case (n, t, p, u) =>
      assert(t == total)
      assert(p == n * 10L - t)
      assert(u == 1000000L * t / (n * 10L))
    }
    // packing dominance: any packer beats pad-each; concat is optimal
    assert(r("b_nextfit")._1 <= r("a_pad_each")._1)
    assert(r("d_concat")._1 <= r("b_nextfit")._1 &&
      r("d_concat")._1 <= r("c_nextfit_sorted")._1)
  }
}
