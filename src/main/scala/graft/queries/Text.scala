package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType, LongType}

import graft.Checkpoints._
import graft.Tables._
import graft.functions.ExactCols._

/** Text-analysis operators for a training-data pipeline: language
  * identification (marker-token scoring), quality scoring, token
  * counting (regex "BPE-ish" estimate), and document fingerprinting
  * (position-weighted rolling hash).
  *
  * Every operator is a pure per-row expression followed by a single
  * keyed aggregation — the cheapest possible distributed shape: the
  * scoring pipelines inside the scan stage, and the only shuffle is
  * the final small groupBy. Ratios are derived from exact integer
  * sums AFTER aggregation (never averaged as floats), so results are
  * partition-order-independent.
  */
object Text {

  /** Marker vocabularies for the language-ID heuristic. On real
    * corpora these are per-language stopwords; scoring = marker-hit
    * count with multiplicity, argmax with alphabetical tiebreak. */
  private val markers: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("join", "customer", "column"),
    "en" -> Seq("hash", "order", "window"),
    "es" -> Seq("slow", "agg", "merge"),
    "fr" -> Seq("scan", "data", "query"),
    "zh" -> Seq("small", "the", "row"))

  private val stopwords = Seq("the", "a", "of", "and", "to", "in")

  private def hitCount(toks: Column, words: Seq[String]): Column =
    // native codegen set-membership counter — the filter-lambda form
    // evaluates |words| interpreted equality checks per token and
    // dominated the q30/q31 scan at 100× (35× wall for 100× data)
    graft.functions.TextExprs.setHitCount(toks, words)

  val entries: Vector[Q] = Vector(

    // language-ID: marker scoring, argmax with alphabetical tiebreak,
    // reported as an actual×predicted confusion matrix
    Q("q30_lang_id", (s, d) => {
      val toks = tokens(col("text"))
      val scored = t(s, d, "documents")
        .select(col("lang") +:
          markers.map { case (l, ws) => hitCount(toks, ws).as(s"s_$l") }: _*)
      val langs = markers.map(_._1)
      val predicted = langs.foldRight(lit(langs.last)) { (l, els) =>
        val ge = langs.filter(_ != l).map(o => col(s"s_$l") >= col(s"s_$o")).reduce(_ && _)
        when(ge, lit(l)).otherwise(els)
      }
      scored.select(col("lang"), predicted.as("predicted"))
        .groupBy(col("lang"), col("predicted"))
        .agg(count(lit(1)).as("docs"))
        .orderBy(col("lang"), col("predicted"))
    }, Some {
      val scores = markers.map { case (l, ws) =>
        val set = ws.map(w => s"'$w'").mkString("[", ",", "]")
        s"CAST(len(list_filter(tk, t -> list_contains($set, t))) AS BIGINT) s_$l"
      }.mkString(", ")
      val langs = markers.map(_._1)
      val cases = langs.map { l =>
        val ge = langs.filter(_ != l).map(o => s"s_$l >= s_$o").mkString(" AND ")
        s"WHEN $ge THEN '$l'"
      }.mkString(" ")
      s"""
      WITH tk AS (
        SELECT lang, list_filter(string_split(text,' '), x->x<>'') tk FROM documents),
      sc AS (SELECT lang, $scores FROM tk)
      SELECT lang, CASE $cases ELSE '${langs.last}' END AS predicted,
             count(*) AS docs
      FROM sc GROUP BY 1, 2 ORDER BY 1, 2"""
    }),

    // quality scoring: per-doc integer metrics, bucketed stopword
    // ratio, ratios derived from int sums post-aggregation
    Q("q31_quality_score", (s, d) => {
      val toks = tokens(col("text"))
      val perDoc = t(s, d, "documents")
        .select(col("lang"),
          size(toks).cast(LongType).as("ntok"),
          hitCount(toks, stopwords).as("nstop"),
          graft.functions.TextExprs.alnumCount(col("text")).as("nalpha"),
          length(col("text")).cast(LongType).as("nch"))
        .withColumn("q_bucket",
          when(col("ntok") === 0, lit(-1L))
            .otherwise(floor(lit(10) * col("nstop") / col("ntok")).cast(LongType)))
      perDoc.groupBy(col("lang"), col("q_bucket"))
        .agg(count(lit(1)).as("docs"),
          sum(col("ntok")).as("sum_tokens"),
          sum(col("nstop")).as("sum_stop"),
          sum(col("nalpha")).as("sum_alpha"),
          sum(col("nch")).as("sum_chars"))
        .withColumn("stop_ratio",
          col("sum_stop").cast(DoubleType) / col("sum_tokens"))
        .withColumn("alpha_ratio",
          col("sum_alpha").cast(DoubleType) / col("sum_chars"))
        .orderBy(col("lang"), col("q_bucket"))
    }, Some {
      val stopSet = stopwords.map(w => s"'$w'").mkString("[", ",", "]")
      s"""
      WITH pd AS (
        SELECT lang,
          CAST(len(tk) AS BIGINT) ntok,
          CAST(len(list_filter(tk, t -> list_contains($stopSet, t))) AS BIGINT) nstop,
          CAST(length(regexp_replace(text, '[^A-Za-z0-9]', '', 'g')) AS BIGINT) nalpha,
          CAST(length(text) AS BIGINT) nch
        FROM (SELECT lang, text, list_filter(string_split(text,' '), x->x<>'') tk
              FROM documents)),
      pb AS (
        SELECT *, CASE WHEN ntok = 0 THEN -1
                       ELSE CAST(floor(10 * nstop / ntok) AS BIGINT) END q_bucket
        FROM pd)
      SELECT lang, q_bucket, count(*) AS docs,
             CAST(SUM(ntok) AS BIGINT) AS sum_tokens,
             CAST(SUM(nstop) AS BIGINT) AS sum_stop,
             CAST(SUM(nalpha) AS BIGINT) AS sum_alpha,
             CAST(SUM(nch) AS BIGINT) AS sum_chars,
             CAST(SUM(nstop) AS DOUBLE) / SUM(ntok) AS stop_ratio,
             CAST(SUM(nalpha) AS DOUBLE) / SUM(nch) AS alpha_ratio
      FROM pb GROUP BY 1, 2 ORDER BY 1, 2"""
    }),

    // token counting: regex word/punct tokens + a BPE-ish piece
    // estimate (ceil(len/4) pieces per whitespace token) — both
    // counts from ONE pass of the TokenStats kernel (the regex form
    // materialized every match into an array just to take its size;
    // PropertiesSpec fuzzes the kernel against the regex reference)
    Q("q32_token_bpe", (s, d) => {
      t(s, d, "documents")
        .select(col("lang"),
          graft.functions.TextExprs.tokenStats(col("text")).as("ts"))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("docs"),
          sum(col("ts.rtok")).as("regex_tokens"),
          sum(col("ts.pieces")).as("bpe_pieces"))
        .orderBy(col("lang"))
    }, Some("""
      SELECT lang, count(*) AS docs,
        CAST(SUM(len(regexp_extract_all(text, '[A-Za-z0-9]+|[^A-Za-z0-9 ]'))) AS BIGINT)
          AS regex_tokens,
        CAST(SUM(CAST(COALESCE(list_sum(
          list_transform(list_filter(string_split(text,' '), x->x<>''),
                         t -> (length(t)+3)//4)), 0) AS BIGINT)) AS BIGINT) AS bpe_pieces
      FROM documents GROUP BY 1 ORDER BY 1""")),

    // document fingerprint: position-weighted rolling hash over
    // md5-hashed tokens (cycle-16 positional weights), mod P — one
    // native kernel per row (the zip_with + aggregate formulation
    // re-entered the md5 expression through interpreted lambdas per
    // token; PropertiesSpec fuzzes the kernel against it)
    Q("q33_fingerprint", (s, d) => {
      t(s, d, "documents")
        .select(col("doc_id"),
          graft.functions.TextExprs.positionalFingerprint(
            tokens(col("text"))).as("fp"))
        .orderBy(col("doc_id"))
    }, Some(s"""
      SELECT doc_id,
        CAST(COALESCE(list_sum(list_transform(generate_series(1, len(tk)),
          i -> (('0x'||substring(md5(tk[i]),1,15))::BIGINT % $P) * (((i-1)%16)+1))), 0)
          AS BIGINT) % $P AS fp
      FROM (SELECT doc_id, list_filter(string_split(text,' '), x->x<>'') tk
            FROM documents)
      ORDER BY doc_id""")),

    // BM25 retrieval scoring for a fixed 3-term query, in RATIONAL
    // form (the idf uses the raw odds ratio, no log): every input to
    // the score is an exact integer (tf, df, dl, N), avgdl is one
    // deterministic division, and the per-term scores combine in
    // fixed order — bit-reproducible cross-engine, unlike the ln()
    // formulation (libm vs java.lang.Math differ in the last ulp).
    // Shape: per-row tf expressions in the scan stage, one global
    // stats aggregate broadcast back, top-k by score. At 100 TB the
    // final top-k runs through TopKPerKey instead of a global sort.
    Q("q57_bm25_topk", (s, d) => {
      val terms = Seq("spark", "hash", "window")
      // per-term tf via the TermCounts kernel: ONE hash-probe scan of
      // the token array for all three terms (the per-term
      // filter-lambda form ran an interpreted closure per token per
      // term — the q31 hot-loop class)
      val wtf = t(s, d, "documents")
        .select(col("doc_id"), tokens(col("text")).as("tk"))
        .select(col("doc_id"), size(col("tk")).cast(LongType).as("dl"),
          graft.functions.TextExprs.termCounts(col("tk"), terms).as("tfs"))
        .select(col("doc_id") +: col("dl") +:
          terms.indices.map(i => col("tfs").getItem(i).as(s"tf$i")): _*)
      val aggCols =
        count(lit(1)).as("n") +:
          (sum(col("dl")).cast(DoubleType) / count(lit(1))).as("avgdl") +:
          terms.indices.map(i =>
            sum(when(col(s"tf$i") > 0, 1L).otherwise(0L)).as(s"df$i"))
      val stats = wtf.agg(aggCols.head, aggCols.tail: _*)
      // literals written identically in the SQL oracle (1.2 + 1
      // computed in double would NOT equal the literal 2.2)
      def termScore(i: Int): Column = {
        val tf = col(s"tf$i").cast(DoubleType)
        val df = col(s"df$i").cast(DoubleType)
        (tf * lit(2.2)) /
          (tf + lit(1.2) * (lit(0.25) + lit(0.75) *
            (col("dl").cast(DoubleType) / col("avgdl")))) *
          ((col("n").cast(DoubleType) - df + lit(0.5)) / (df + lit(0.5)))
      }
      wtf.crossJoin(broadcast(stats))
        .select(col("doc_id"),
          (termScore(0) + termScore(1) + termScore(2)).as("score"))
        .filter(col("score") > 0)
        .orderBy(col("score").desc, col("doc_id"))
        .limit(20)
    }, Some("""
      WITH tk AS (SELECT doc_id, list_filter(string_split(text,' '), x->x<>'') tk
                  FROM documents),
      wtf AS (SELECT doc_id, len(tk) dl,
                len(list_filter(tk, x -> x = 'spark'))  tf0,
                len(list_filter(tk, x -> x = 'hash'))   tf1,
                len(list_filter(tk, x -> x = 'window')) tf2
              FROM tk),
      stats AS (SELECT count(*) n, CAST(SUM(dl) AS DOUBLE)/count(*) avgdl,
                  SUM(CASE WHEN tf0>0 THEN 1 ELSE 0 END) df0,
                  SUM(CASE WHEN tf1>0 THEN 1 ELSE 0 END) df1,
                  SUM(CASE WHEN tf2>0 THEN 1 ELSE 0 END) df2
                FROM wtf)
      SELECT doc_id, score FROM (
        SELECT doc_id,
          (CAST(tf0 AS DOUBLE) * 2.2::DOUBLE)
            / (CAST(tf0 AS DOUBLE) + 1.2::DOUBLE * (0.25::DOUBLE + 0.75::DOUBLE
               * (CAST(dl AS DOUBLE) / avgdl)))
            * ((CAST(n AS DOUBLE) - CAST(df0 AS DOUBLE) + 0.5::DOUBLE)
               / (CAST(df0 AS DOUBLE) + 0.5::DOUBLE))
          + (CAST(tf1 AS DOUBLE) * 2.2::DOUBLE)
            / (CAST(tf1 AS DOUBLE) + 1.2::DOUBLE * (0.25::DOUBLE + 0.75::DOUBLE
               * (CAST(dl AS DOUBLE) / avgdl)))
            * ((CAST(n AS DOUBLE) - CAST(df1 AS DOUBLE) + 0.5::DOUBLE)
               / (CAST(df1 AS DOUBLE) + 0.5::DOUBLE))
          + (CAST(tf2 AS DOUBLE) * 2.2::DOUBLE)
            / (CAST(tf2 AS DOUBLE) + 1.2::DOUBLE * (0.25::DOUBLE + 0.75::DOUBLE
               * (CAST(dl AS DOUBLE) / avgdl)))
            * ((CAST(n AS DOUBLE) - CAST(df2 AS DOUBLE) + 0.5::DOUBLE)
               / (CAST(df2 AS DOUBLE) + 0.5::DOUBLE)) AS score
        FROM wtf, stats)
      WHERE score > 0 ORDER BY score DESC, doc_id LIMIT 20""")),

    // deterministic hash-based train/valid/test split (80/10/10):
    // the split decision is a pure function of the id via the shared
    // md5 folding, so it is stable under repartitioning, re-runs, and
    // engine choice — the property a reproducible pipeline needs
    Q("q58_train_split", (s, d) => {
      val bucket = hmod(col("doc_id").cast("string")) % 100
      t(s, d, "documents")
        .withColumn("split",
          when(bucket < 80, "train").when(bucket < 90, "valid").otherwise("test"))
        .groupBy(col("split"))
        .agg(count(lit(1)).as("n"),
          sum(col("doc_id")).as("id_sum"),
          sum(col("n_chars")).as("chars"))
        .orderBy(col("split"))
    }, Some(s"""
      SELECT CASE
               WHEN ('0x'||substring(md5(CAST(doc_id AS VARCHAR)),1,15))::BIGINT
                    % $P % 100 < 80 THEN 'train'
               WHEN ('0x'||substring(md5(CAST(doc_id AS VARCHAR)),1,15))::BIGINT
                    % $P % 100 < 90 THEN 'valid'
               ELSE 'test' END AS split,
             count(*) AS n,
             CAST(SUM(doc_id) AS BIGINT) AS id_sum,
             CAST(SUM(n_chars) AS BIGINT) AS chars
      FROM documents GROUP BY 1 ORDER BY 1""")),

    // winnowing fingerprint (Schleimer, Wilkerson, Aiken: "Winnowing:
    // Local Algorithms for Document Fingerprinting"): per window of
    // w=4 consecutive shingle hashes select the min (rightmost on
    // ties), fingerprint = distinct selected hashes. The guarantee:
    // any shared run ≥ w+k-1 tokens yields a shared fingerprint hash,
    // making it the robust MOSS-style dedup/similarity signature.
    // Spark shape: ONE scan-stage projection — winnowing has no
    // cross-row dependency, so the whole selection (md5-fold, encoded
    // rightmost-min windows, distinct fold) runs inside the native
    // WinnowFingerprint kernel per document. The earlier posexplode →
    // doc_id-shuffle → frame-window formulation sorted 100 M
    // (doc,pos,hash) rows at sf10 (19 s) to compute per-row-local
    // work; the kernel needs no shuffle at all (2.5 s, same oracle).
    Q("q60_winnow_fingerprint", (s, d) => {
      t(s, d, "documents")
        .select(col("doc_id"),
          graft.functions.TextExprs.winnowFingerprint(
            shingles(tokens(col("text")), 3, distinct = false), 4).as("wf"))
        .select(col("doc_id"), col("wf.n_fp").as("n_fp"), col("wf.fp").as("fp"))
        .orderBy(col("doc_id"))
    }, Some(s"""
      WITH tk AS (SELECT doc_id, list_filter(string_split(text,' '), x->x<>'') tk
                  FROM documents),
      shm AS (SELECT doc_id,
                CASE WHEN len(tk)>=3 THEN [tk[i]||' '||tk[i+1]||' '||tk[i+2]
                                           for i in generate_series(1,len(tk)-2)]
                     ELSE [] END sg
              FROM tk),
      hs AS (SELECT doc_id,
               [('0x'||substring(md5(s),1,15))::BIGINT % $P for s in sg] h
             FROM shm),
      win AS (SELECT doc_id,
                [list_min([h[j]*1048576 + (1048576 - j)
                           for j in generate_series(i, LEAST(i+3, len(h)))])
                 for i in generate_series(1, GREATEST(len(h)-3, 1))] encs
              FROM hs WHERE len(h) > 0),
      sel AS (SELECT doc_id, list_distinct([e // 1048576 for e in encs]) sels FROM win)
      SELECT d.doc_id,
             CAST(COALESCE(len(s.sels), 0) AS BIGINT) AS n_fp,
             CAST(COALESCE(list_sum(s.sels) % $P, 0) AS BIGINT) AS fp
      FROM documents d LEFT JOIN sel s USING (doc_id)
      ORDER BY doc_id""")),

    // Gopher-style quality filtering (Rae et al. 2021 §A1.1): per doc
    // the rule inputs — token count, words-with-alpha count (native
    // AlphaWordCount kernel), total word length (= chars after space
    // removal, an exact identity that avoids a per-token sum), and
    // stopword hits — then the pass rule entirely in INTEGER
    // arithmetic (mean word length in [3,10] ⇔ 3·ntok ≤ wlen ≤
    // 10·ntok; alpha fraction ≥ 0.8 ⇔ 5·nalpha ≥ 4·ntok), so both
    // engines agree exactly with no float thresholds.
    Q("q69_gopher_quality", (s, d) => {
      val toks = tokens(col("text"))
      t(s, d, "documents").select(
          col("lang"),
          size(toks).cast(LongType).as("ntok"),
          graft.functions.TextExprs.alphaWordCount(toks).as("nalpha"),
          length(translate(col("text"), " ", "")).cast(LongType).as("wlen"),
          hitCount(toks, stopwords).as("nstop"))
        .withColumn("pass",
          col("ntok") >= 10 && col("wlen") >= col("ntok") * 3 &&
            col("wlen") <= col("ntok") * 10 &&
            col("nalpha") * 5 >= col("ntok") * 4 && col("nstop") >= 2)
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("docs"),
          sum(when(col("pass"), 1L).otherwise(0L)).as("n_pass"),
          sum(col("ntok")).as("sum_tokens"),
          sum(col("nalpha")).as("sum_alpha_words"),
          sum(col("nstop")).as("sum_stop_hits"))
        .orderBy(col("lang"))
    }, Some {
      val stopSet = stopwords.map(w => s"'$w'").mkString("[", ",", "]")
      s"""
      WITH pd AS (
        SELECT lang,
          CAST(len(tk) AS BIGINT) ntok,
          CAST(len(list_filter(tk, t -> regexp_matches(t, '[A-Za-z]'))) AS BIGINT) nalpha,
          CAST(length(replace(text, ' ', '')) AS BIGINT) wlen,
          CAST(len(list_filter(tk, t -> list_contains($stopSet, t))) AS BIGINT) nstop
        FROM (SELECT lang, text, list_filter(string_split(text,' '), x->x<>'') tk
              FROM documents))
      SELECT lang, count(*) AS docs,
             CAST(SUM(CASE WHEN ntok >= 10 AND wlen >= ntok*3 AND wlen <= ntok*10
                            AND nalpha*5 >= ntok*4 AND nstop >= 2
                           THEN 1 ELSE 0 END) AS BIGINT) AS n_pass,
             CAST(SUM(ntok) AS BIGINT) AS sum_tokens,
             CAST(SUM(nalpha) AS BIGINT) AS sum_alpha_words,
             CAST(SUM(nstop) AS BIGINT) AS sum_stop_hits
      FROM pd GROUP BY 1 ORDER BY 1"""
    }),

    // repetition detection (the Gopher duplicate-n-gram filter): per
    // doc the fraction of duplicate word-3-grams (1 − distinct/total),
    // bucketed ×10 — repeated boilerplate pushes docs into high
    // buckets. Scan-stage only: shingle + distinct per row, one tiny
    // groupBy on the bucket; the double division is the same exact
    // ints on both engines.
    Q("q70_repeat_ngram", (s, d) => {
      val sg = shingles(tokens(col("text")), 3, distinct = false)
      t(s, d, "documents").select(
          size(sg).cast(LongType).as("ntotal"),
          size(array_distinct(sg)).cast(LongType).as("ndist"))
        .withColumn("dup_bucket",
          when(col("ntotal") === 0, lit(-1L))
            .otherwise(floor(lit(10) * (col("ntotal") - col("ndist")) / col("ntotal"))
              .cast(LongType)))
        .groupBy(col("dup_bucket"))
        .agg(count(lit(1)).as("docs"),
          sum(col("ntotal")).as("sum_ngrams"),
          sum(col("ntotal") - col("ndist")).as("sum_dups"))
        .orderBy(col("dup_bucket"))
    }, Some("""
      WITH tk AS (SELECT list_filter(string_split(text,' '), x->x<>'') tk
                  FROM documents),
      sg AS (SELECT CASE WHEN len(tk) >= 3
                         THEN [tk[i]||' '||tk[i+1]||' '||tk[i+2]
                               for i in generate_series(1, len(tk)-2)]
                         ELSE [] END sg
             FROM tk),
      pd AS (SELECT CAST(len(sg) AS BIGINT) ntotal,
                    CAST(len(list_distinct(sg)) AS BIGINT) ndist
             FROM sg)
      SELECT CASE WHEN ntotal = 0 THEN -1
                  ELSE CAST(floor(10*(ntotal-ndist)/ntotal) AS BIGINT) END AS dup_bucket,
             count(*) AS docs,
             CAST(SUM(ntotal) AS BIGINT) AS sum_ngrams,
             CAST(SUM(ntotal-ndist) AS BIGINT) AS sum_dups
      FROM pd GROUP BY 1 ORDER BY 1""")),

    // Good–Turing frequency-of-frequencies: how many word types occur
    // exactly c times, plus that stratum's token mass — the corpus-
    // linguistics card behind smoothing estimators (hapax legomena =
    // the c=1 row) and vocabulary-growth planning. Pure counts: one
    // token-count shuffle, one count-of-counts rollup; output rows
    // bounded by distinct frequency VALUES (≈√mass)
    Q("q126_freq_spectrum", (s, d) => {
      t(s, d, "documents")
        .select(explode(tokens(col("text"))).as("tok"))
        .groupBy(col("tok")).agg(count(lit(1)).as("c"))
        .groupBy(col("c"))
        .agg(count(lit(1)).as("n_types"),
          sum(col("c")).as("token_mass"),
          (sum(hmod(col("tok"))) % P).as("type_checksum"))
        .select(col("c").as("freq"), col("n_types"), col("token_mass"),
          col("type_checksum"))
        .orderBy(col("freq"))
    }, Some(s"""
      WITH ex AS (SELECT unnest(list_filter(string_split(text,' '), x->x<>'')) tok
                  FROM documents),
      tc AS (SELECT tok, CAST(count(*) AS BIGINT) c FROM ex GROUP BY 1)
      SELECT c AS freq, CAST(count(*) AS BIGINT) AS n_types,
        CAST(SUM(c) AS BIGINT) AS token_mass,
        CAST(SUM(${sql.hmod("tok")}) % ${P} AS BIGINT) AS type_checksum
      FROM tc GROUP BY 1 ORDER BY 1""")),

    // per-source vocabulary card: token mass, type count, types
    // EXCLUSIVE to the source (df-over-sources = 1 — the q55 df idea
    // at source granularity), and the integer type-token ratio — the
    // lexical-diversity row a corpus card prints per provenance
    Q("q127_vocab_by_source", (s, d) => {
      val ex = t(s, d, "documents")
        .select(col("source"), explode(tokens(col("text"))).as("tok"))
      val tc = ex.groupBy(col("source"), col("tok"))
        .agg(count(lit(1)).as("c"))
        .cut() // feeds the df-over-sources rollup and the per-source card
      val df = tc.groupBy(col("tok"))
        .agg(count(lit(1)).as("nsrc"))
      tc.join(df, "tok")
        .groupBy(col("source"))
        .agg(sum(col("c")).as("n_tokens"),
          count(lit(1)).as("n_types"),
          sum(when(col("nsrc") === 1, 1L).otherwise(0L)).as("n_exclusive"),
          (sum(hmod(col("tok"))) % P).as("type_checksum"))
        .withColumn("ttr_ppm", expr("(1000000 * n_types) div n_tokens"))
        .orderBy(col("source"))
    }, Some(s"""
      WITH ex AS (SELECT source,
                    unnest(list_filter(string_split(text,' '), x->x<>'')) tok
                  FROM documents),
      tc AS (SELECT source, tok, CAST(count(*) AS BIGINT) c
             FROM ex GROUP BY 1, 2),
      df AS (SELECT tok, CAST(count(*) AS BIGINT) nsrc FROM tc GROUP BY 1)
      SELECT source,
        CAST(SUM(c) AS BIGINT) AS n_tokens,
        CAST(count(*) AS BIGINT) AS n_types,
        CAST(SUM(CASE WHEN nsrc = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_exclusive,
        CAST(SUM(${sql.hmod("tok")}) % ${P} AS BIGINT) AS type_checksum,
        CAST((1000000 * count(*)) // SUM(c) AS BIGINT) AS ttr_ppm
      FROM tc JOIN df USING (tok) GROUP BY 1 ORDER BY 1""")),

    // Zipf rank-frequency card (Zipf 1949; the corpus-statistics row
    // next to q126's Good–Turing spectrum): top-40 token types by
    // corpus frequency with rank, rank·frequency (Zipf predicts ≈
    // constant) and cumulative corpus share ppm. Scale shape: the
    // top-40 is orderBy+limit — Spark's TakeOrderedAndProject, a
    // distributed per-partition top-k + driver merge, NEVER a
    // single-partition sort of the vocabulary; rank/cumsum windows
    // then run on the bounded 40-row table. The corpus token total is
    // one scalar to the driver (the q62 contract) re-entering as a
    // literal — not a 1-row cross join (the PlanSpec rule q121
    // documents). Ties rank deterministically by (freq desc, token)
    Q("q134_zipf_card", (s, d) => {
      val tc = t(s, d, "documents")
        .select(explode(tokens(col("text"))).as("tok"))
        .groupBy(col("tok")).agg(count(lit(1)).as("f"))
        .cut() // feeds the total scalar and the top-40
      val total = tc.agg(sum(col("f"))).first().getLong(0)
      val w = Window.orderBy(col("f").desc, col("tok").asc)
      tc.orderBy(col("f").desc, col("tok").asc).limit(40)
        .withColumn("rank", row_number().over(w).cast(LongType))
        .withColumn("rf", col("rank") * col("f"))
        .withColumn("cum_share_ppm",
          expr(s"(1000000 * sum(f) OVER (ORDER BY f DESC, tok ASC " +
            s"ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) div ${total}L"))
        .select(col("rank"), col("tok"), col("f"), col("rf"),
          col("cum_share_ppm"))
        .orderBy(col("rank"))
    }, Some(s"""
      WITH ex AS (SELECT unnest(list_filter(string_split(text,' '), x->x<>'')) tok
                  FROM documents),
      c AS (SELECT tok, CAST(count(*) AS BIGINT) f FROM ex GROUP BY 1),
      tot AS (SELECT CAST(SUM(f) AS BIGINT) total FROM c),
      rk AS (SELECT tok, f,
               CAST(row_number() OVER (ORDER BY f DESC, tok ASC) AS BIGINT) rank,
               CAST(SUM(f) OVER (ORDER BY f DESC, tok ASC
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) cum
             FROM c)
      SELECT rank, tok, f, rank * f AS rf,
        CAST((1000000 * cum) // total AS BIGINT) AS cum_share_ppm
      FROM rk, tot WHERE rank <= 40 ORDER BY rank""")),

    // collocation detection (Church & Hanks 1990 PMI, in the exact-
    // integer regime): top-20 adjacent bigrams with count ≥ 5 ranked
    // by the independence-lift ratio ⌊10⁶·c_ab·N/(c_a·c_b)⌋ — PMI's
    // monotone integer surrogate (log is monotone, so the ranking is
    // identical and no transcendental crosses the oracle). N = one
    // driver scalar; the c_a/c_b lookups are token equi-joins against
    // the unigram count table; selection is TakeOrderedAndProject;
    // products ride DECIMAL(38,0)/HUGEINT (10⁶·c_ab·N exceeds int64
    // on large corpora)
    Q("q153_collocations", (s, d) => {
      val tk = t(s, d, "documents")
        .select(col("doc_id"), tokens(col("text")).as("tk"))
      val c2 = tk
        .select(explode(shingles(col("tk"), 2, distinct = false)).as("bg"))
        .groupBy(col("bg")).agg(count(lit(1)).as("c_ab"))
        .cut() // feeds the N scalar and the ranked surface
      val n = c2.agg(sum(col("c_ab"))).head.getLong(0)
      val cu = tk.select(explode(col("tk")).as("tok"))
        .groupBy(col("tok")).agg(count(lit(1)).as("c"))
      val p = c2.filter(col("c_ab") >= 5L)
        .withColumn("wa", substring_index(col("bg"), " ", 1))
        .withColumn("wb", substring_index(col("bg"), " ", -1))
        .join(cu.select(col("tok").as("wa"), col("c").as("c_a")), "wa")
        .join(cu.select(col("tok").as("wb"), col("c").as("c_b")), "wb")
        .withColumn("lift_ppm",
          expr(s"(CAST(1000000 AS DECIMAL(38,0)) * c_ab * ${n}L) div (c_a * c_b)")
            .cast(LongType))
      val w = Window.orderBy(col("lift_ppm").desc, col("bg").asc)
      p.orderBy(col("lift_ppm").desc, col("bg").asc).limit(20)
        .withColumn("rank", row_number().over(w).cast(LongType))
        .select(col("rank"), col("bg"), col("c_ab"), col("c_a"), col("c_b"),
          col("lift_ppm"))
        .orderBy(col("rank"))
    }, Some("""
      WITH tk AS (SELECT doc_id, list_filter(string_split(text,' '), x->x<>'') tk
                  FROM documents),
      bgl AS (SELECT unnest(CASE WHEN len(tk) >= 2
                THEN [tk[i]||' '||tk[i+1] for i in generate_series(1, len(tk)-1)]
                ELSE [] END) bg FROM tk),
      c2 AS (SELECT bg, CAST(count(*) AS BIGINT) c_ab FROM bgl GROUP BY 1),
      nn AS (SELECT CAST(SUM(c_ab) AS BIGINT) n FROM c2),
      cu AS (SELECT tok, CAST(count(*) AS BIGINT) c
             FROM (SELECT unnest(tk) tok FROM tk) GROUP BY 1),
      p AS (SELECT bg, c_ab, a.c c_a, b.c c_b,
              CAST((1000000 * CAST(c_ab AS HUGEINT) * nn.n)
                   // (a.c * b.c) AS BIGINT) lift_ppm
            FROM c2
              JOIN cu a ON a.tok = split_part(c2.bg,' ',1)
              JOIN cu b ON b.tok = split_part(c2.bg,' ',2)
              CROSS JOIN nn
            WHERE c_ab >= 5)
      SELECT rank, bg, c_ab, c_a, c_b, lift_ppm FROM (
        SELECT bg, c_ab, c_a, c_b, lift_ppm,
          CAST(row_number() OVER (ORDER BY lift_ppm DESC, bg ASC) AS BIGINT) rank
        FROM p)
      WHERE rank <= 20 ORDER BY rank""")),

    // Simpson lexical-concentration index per source (Simpson 1949 —
    // the diversity member of the corpus-statistics family next to
    // q126's spectrum and q127's TTR card): the probability two
    // random token instances are the SAME type, λ = Σ n_i·(n_i−1) /
    // (N·(N−1)) — the diversity measure that stays RATIONAL (Shannon
    // entropy is logs, the q57 transcendental rule), reported in ppm
    // by floor division with the Σ n_i² mass riding DECIMAL/HUGEINT.
    // r12 BOUND (the q208 audit rule): Σn_i(n_i−1) ≤ N² ≤ 10²⁴ at
    // 10¹² tokens/source and the 10⁶ ppm factor tops out at 10³⁰ —
    // inside DECIMAL(38,0); the `pairs` OUTPUT column is int64-safe
    // to N ≈ 3·10⁹ tokens per source (past that read simpson_ppm;
    // the ANSI Long cast is the loud guard).
    // One map-side-combined (source, token) groupBy + |sources| rollup
    Q("q167_simpson_diversity", (s, d) => {
      val dec = DecimalType(38, 0)
      val tc = t(s, d, "documents")
        .select(col("source"), explode(tokens(col("text"))).as("tok"))
        .groupBy(col("source"), col("tok"))
        .agg(count(lit(1)).as("c"))
      tc.groupBy(col("source"))
        .agg(sum(col("c")).as("n_tokens"),
          count(lit(1)).as("n_types"),
          sum(col("c").cast(dec) * (col("c").cast(dec) - lit(1).cast(dec)))
            .as("pairs"))
        .withColumn("simpson_ppm", expr(
          "CAST((CAST(1000000 AS DECIMAL(38,0)) * pairs) div " +
            "(CAST(n_tokens AS DECIMAL(38,0)) * (n_tokens - 1L)) AS BIGINT)"))
        .select(col("source"), col("n_tokens"), col("n_types"),
          col("pairs").cast(LongType).as("pairs"), col("simpson_ppm"))
        .orderBy(col("source"))
    }, Some("""
      WITH ex AS (SELECT source,
                    unnest(list_filter(string_split(text,' '), x->x<>'')) tok
                  FROM documents),
      tc AS (SELECT source, tok, CAST(count(*) AS BIGINT) c
             FROM ex GROUP BY 1, 2),
      a AS (SELECT source, CAST(SUM(c) AS BIGINT) n_tokens,
              CAST(count(*) AS BIGINT) n_types,
              SUM(CAST(c AS HUGEINT) * (c - 1)) pairs
            FROM tc GROUP BY 1)
      SELECT source, n_tokens, n_types, CAST(pairs AS BIGINT) AS pairs,
        CAST((1000000 * pairs) // (CAST(n_tokens AS HUGEINT) * (n_tokens - 1))
             AS BIGINT) AS simpson_ppm
      FROM a ORDER BY source""")),

    // inter-source drift matrix (q163's TVD turned pairwise — the
    // corpus-mixing diagnostic: which provenances speak the same
    // language?): for every source pair, the total-variation distance
    // between unigram distributions, via the inner-join + exclusive-
    // mass identity Σ|c_a·N_b − c_b·N_a| = Σ_shared |…| +
    // (N_a − S_a)·N_b + (N_b − S_b)·N_a — so ONE vocab-bounded token
    // equi-join covers the whole matrix, no per-pair rescans, the
    // q115 matrix family shape. Products ride DECIMAL/HUGEINT; pairs
    // sharing zero tokens (TVD exactly 1) are omitted by construction
    // on both engines. |sources|²-bounded output. r12 BOUND (the q208
    // audit rule): |c_a·N_b − c_b·N_a| ≤ N_a·N_b ≤ 10²⁴ at 10¹²
    // tokens/source; the 10⁶ ppm factor tops out at 10³⁰ < 10³⁸
    Q("q168_source_drift_matrix", (s, d) => {
      val dec = DecimalType(38, 0)
      val tc = t(s, d, "documents")
        .select(col("source"), explode(tokens(col("text"))).as("tok"))
        .groupBy(col("source"), col("tok")).agg(count(lit(1)).as("c"))
        .cut() // both sides of the token self-join and the totals
      val tot = tc.groupBy(col("source")).agg(sum(col("c")).as("n"))
      tc.select(col("source").as("sa"), col("tok"), col("c").as("ca"))
        .join(tc.select(col("source").as("sb"), col("tok"), col("c").as("cb")),
          "tok")
        .filter(col("sa") < col("sb"))
        .join(broadcast(tot.select(col("source").as("sa"), col("n").as("na"))),
          "sa")
        .join(broadcast(tot.select(col("source").as("sb"), col("n").as("nb"))),
          "sb")
        .groupBy(col("sa"), col("sb"), col("na"), col("nb"))
        .agg(sum(abs(col("ca").cast(dec) * col("nb").cast(dec) -
          col("cb").cast(dec) * col("na").cast(dec))).as("inner_abs"),
          sum(col("ca")).as("sha"), sum(col("cb")).as("shb"))
        .withColumn("tvd_num", col("inner_abs") +
          (col("na").cast(dec) - col("sha").cast(dec)) * col("nb").cast(dec) +
          (col("nb").cast(dec) - col("shb").cast(dec)) * col("na").cast(dec))
        .withColumn("tvd_ppm", expr(
          "CAST((CAST(1000000 AS DECIMAL(38,0)) * tvd_num) div " +
            "(CAST(2 AS DECIMAL(38,0)) * na * nb) AS BIGINT)"))
        .select(col("sa"), col("sb"), col("na"), col("nb"), col("tvd_ppm"))
        .orderBy(col("sa"), col("sb"))
    }, Some("""
      WITH ex AS (SELECT source,
                    unnest(list_filter(string_split(text,' '), x->x<>'')) tok
                  FROM documents),
      tc AS (SELECT source, tok, CAST(count(*) AS BIGINT) c
             FROM ex GROUP BY 1, 2),
      tot AS (SELECT source, CAST(SUM(c) AS BIGINT) n FROM tc GROUP BY 1),
      sh AS (SELECT a.source sa, b.source sb, ta.n na, tb.n nb,
               SUM(abs(CAST(a.c AS HUGEINT)*tb.n - CAST(b.c AS HUGEINT)*ta.n))
                 inner_abs,
               CAST(SUM(a.c) AS BIGINT) sha, CAST(SUM(b.c) AS BIGINT) shb
             FROM tc a JOIN tc b ON a.tok = b.tok AND a.source < b.source
               JOIN tot ta ON ta.source = a.source
               JOIN tot tb ON tb.source = b.source
             GROUP BY 1, 2, 3, 4)
      SELECT sa, sb, na, nb,
        CAST((1000000 * (inner_abs + CAST(na - sha AS HUGEINT)*nb
                         + CAST(nb - shb AS HUGEINT)*na))
             // (2 * CAST(na AS HUGEINT) * nb) AS BIGINT) AS tvd_ppm
      FROM sh ORDER BY sa, sb"""))
  ,

    // power-of-2 document-length spectrum per language (the corpus
    // shape card a data curator reads before setting sequence
    // lengths): bucket = ⌊log2(n_chars)⌋ computed EXACTLY as
    // length(bin(n_chars)) − 1 — the binary-representation length, an
    // integer identity on both engines, never a transcendental log
    // (the q172/q133 doctrine). Scan-stage bucketing + one keyed
    // groupBy; output bounded by |langs| × 64 buckets at any scale
    Q("q183_length_spectrum", (s, d) => {
      t(s, d, "documents")
        .select(col("lang"), col("n_chars").cast(LongType).as("nc"))
        .withColumn("bucket",
          when(col("nc") <= 0L, lit(-1L))
            .otherwise((length(bin(col("nc"))) - 1).cast(LongType)))
        .groupBy(col("lang"), col("bucket"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("nc")).as("sum_chars"),
          min(col("nc")).as("min_chars"),
          max(col("nc")).as("max_chars"))
        .orderBy(col("lang"), col("bucket"))
    }, Some("""
      WITH b AS (SELECT lang, CAST(n_chars AS BIGINT) nc,
                   CASE WHEN n_chars <= 0 THEN -1
                        ELSE CAST(length(bin(CAST(n_chars AS BIGINT))) - 1
                          AS BIGINT) END AS bucket
                 FROM documents)
      SELECT lang, bucket, CAST(count(*) AS BIGINT) AS n_docs,
        CAST(SUM(nc) AS BIGINT) AS sum_chars,
        CAST(MIN(nc) AS BIGINT) AS min_chars,
        CAST(MAX(nc) AS BIGINT) AS max_chars
      FROM b GROUP BY 1, 2 ORDER BY 1, 2""")),

    // vocabulary coverage curve (the subword-tokenizer sizing card:
    // what corpus share do the top-K token types cover?): the K
    // targets (1/10/100/1000) read off the ranked frequency table —
    // ranked surface = TakeOrderedAndProject limit 1000 (distributed
    // per-partition top-k, the q134 rule: never a vocabulary sort),
    // rank/cumsum windows on that bounded table, corpus total and
    // vocab size as driver scalars. k beyond the vocabulary clamps to
    // the full-vocab row (LEAST(k, V) — both engines)
    Q("q187_vocab_coverage", (s, d) => {
      val tc = t(s, d, "documents")
        .select(explode(tokens(col("text"))).as("tok"))
        .groupBy(col("tok")).agg(count(lit(1)).as("f"))
        .cut() // feeds the scalars and the ranked top
      val row = tc.agg(sum(col("f")), count(lit(1))).head
      val total = if (row.isNullAt(0)) 0L else row.getLong(0)
      val v = row.getLong(1)
      val w = Window.orderBy(col("f").desc, col("tok").asc)
      val ranked = tc.orderBy(col("f").desc, col("tok").asc).limit(1000)
        .withColumn("rank", row_number().over(w).cast(LongType))
        .withColumn("covered", expr(
          "sum(f) OVER (ORDER BY f DESC, tok ASC " +
            "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)"))
      import s.implicits._
      val ks = Seq(1L, 10L, 100L, 1000L)
        .map(k => (k, math.min(k, math.max(v, 1L)))).toDF("k", "rank")
      ks.join(ranked, "rank")
        .select(col("k"), col("rank").as("types"), col("covered"),
          (if (total == 0L) lit(-1L)
           else expr(s"(1000000L * covered) div ${total}L")).as("coverage_ppm"))
        .orderBy(col("k"))
    }, Some("""
      WITH ex AS (SELECT unnest(list_filter(string_split(text,' '), x->x<>'')) tok
                  FROM documents),
      c AS (SELECT tok, CAST(count(*) AS BIGINT) f FROM ex GROUP BY 1),
      tot AS (SELECT CAST(SUM(f) AS BIGINT) total,
                CAST(count(*) AS BIGINT) v FROM c),
      rk AS (SELECT tok, f,
               CAST(row_number() OVER (ORDER BY f DESC, tok ASC) AS BIGINT)
                 rank,
               CAST(SUM(f) OVER (ORDER BY f DESC, tok ASC
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
                 covered
             FROM c),
      ks AS (SELECT CAST(unnest([1,10,100,1000]) AS BIGINT) AS k)
      SELECT k, rank AS types, covered,
        CAST(CASE WHEN total = 0 THEN -1
             ELSE (1000000 * covered) // total END AS BIGINT)
          AS coverage_ppm
      FROM ks JOIN tot ON true
        JOIN rk ON rk.rank = LEAST(k, GREATEST(v, 1))
      ORDER BY k""")),

    // vocabulary-attribution card (which source contributes the NOVEL
    // vocabulary — the provenance complement of q127's per-source
    // vocab size): every token type is credited to the source of the
    // doc where it FIRST occurs (min doc_id — deterministic, ingestion
    // order), then per source: types present, types first-seen there,
    // share of the whole vocabulary and of the source's own types as
    // nonneg floor ratios. Inverted-index shape: one (tok → min
    // doc_id) groupBy over per-doc-distinct token rows, a vocab-
    // bounded join back to doc sources, two bounded rollups; total
    // vocab = one driver scalar (the q134 rule)
    Q("q191_vocab_attribution", (s, d) => {
      val docs = t(s, d, "documents")
      val tv = docs
        .select(col("doc_id"), col("source"),
          explode(array_distinct(tokens(col("text")))).as("tok"))
        .cut() // feeds first-seen argmin, presence rollup, vocab scalar
      val first = tv.groupBy(col("tok")).agg(min(col("doc_id")).as("first_doc"))
      val nv = math.max(first.count(), 1L)
      val fs = first
        .join(docs.select(col("doc_id").as("first_doc"), col("source")),
          "first_doc")
        .groupBy(col("source")).agg(count(lit(1)).as("n_first"))
      val pres = tv.select(col("source"), col("tok")).distinct()
        .groupBy(col("source")).agg(count(lit(1)).as("n_types"))
      pres.join(fs, Seq("source"), "left")
        .select(col("source"), col("n_types"),
          coalesce(col("n_first"), lit(0L)).as("n_first"))
        .withColumn("vocab_share_ppm",
          expr(s"(1000000L * n_first) div ${nv}L"))
        .withColumn("novelty_ppm", expr("(1000000L * n_first) div n_types"))
        .orderBy(col("source"))
    }, Some("""
      WITH tv AS (SELECT doc_id, source,
                    unnest(list_distinct(list_filter(string_split(text,' '),
                                                     x->x<>''))) tok
                  FROM documents),
      fd AS (SELECT tok, MIN(doc_id) first_doc FROM tv GROUP BY 1),
      v AS (SELECT GREATEST(CAST(count(*) AS BIGINT), 1) nv FROM fd),
      fs AS (SELECT d.source, CAST(count(*) AS BIGINT) n_first
             FROM fd JOIN documents d ON fd.first_doc = d.doc_id
             GROUP BY 1),
      pres AS (SELECT source, CAST(count(DISTINCT tok) AS BIGINT) n_types
               FROM tv GROUP BY 1)
      SELECT p.source, p.n_types,
        CAST(COALESCE(fs.n_first, 0) AS BIGINT) AS n_first,
        CAST((1000000 * COALESCE(fs.n_first, 0)) // v.nv AS BIGINT)
          AS vocab_share_ppm,
        CAST((1000000 * COALESCE(fs.n_first, 0)) // p.n_types AS BIGINT)
          AS novelty_ppm
      FROM pres p LEFT JOIN fs ON p.source = fs.source, v
      ORDER BY p.source""")),

    // token-dispersion card (collection frequency vs document
    // frequency — the repetition/boilerplate indicator: cf ≫ df means
    // a token concentrates inside few docs, the spam/template smell
    // q74 commonness can't see because it scores DOCS): per token cf
    // and df from ONE two-level map-side-combined groupBy chain
    // ((tok, doc) → tok), df ≥ 3 floor, burst_milli = ⌊1000·cf/df⌋
    // (≥ 1000 by construction), top-20 via TakeOrderedAndProject +
    // a 20-row rank window (the q134 shape; certified in PlanSpec's
    // bounded-window sweep)
    Q("q192_token_dispersion", (s, d) => {
      val td = t(s, d, "documents")
        .select(col("doc_id"), explode(tokens(col("text"))).as("tok"))
        .groupBy(col("tok"), col("doc_id")).agg(count(lit(1)).as("c"))
        .groupBy(col("tok"))
        .agg(sum(col("c")).as("cf"), count(lit(1)).as("df"))
        .filter(col("df") >= 3L)
        .withColumn("burst_milli", expr("(1000L * cf) div df"))
      val w = Window.orderBy(col("burst_milli").desc, col("tok").asc)
      td.orderBy(col("burst_milli").desc, col("tok").asc).limit(20)
        .withColumn("rank", row_number().over(w).cast(LongType))
        .select(col("rank"), col("tok"), col("cf"), col("df"),
          col("burst_milli"))
        .orderBy(col("rank"))
    }, Some("""
      WITH ex AS (SELECT doc_id,
                    unnest(list_filter(string_split(text,' '), x->x<>'')) tok
                  FROM documents),
      dc AS (SELECT tok, doc_id, CAST(count(*) AS BIGINT) c
             FROM ex GROUP BY 1, 2),
      c AS (SELECT tok, CAST(SUM(c) AS BIGINT) cf,
              CAST(count(*) AS BIGINT) df
            FROM dc GROUP BY 1 HAVING count(*) >= 3),
      r AS (SELECT tok, cf, df, (1000 * cf) // df AS burst_milli FROM c)
      SELECT rank, tok, cf, df, CAST(burst_milli AS BIGINT) AS burst_milli
      FROM (SELECT tok, cf, df, burst_milli,
              CAST(row_number() OVER (ORDER BY burst_milli DESC, tok ASC)
                   AS BIGINT) rank
            FROM r)
      WHERE rank <= 20 ORDER BY rank""")),

    // Heaps'-law vocabulary-growth card (Heaps 1978: V(n) ≈ K·n^β —
    // the tokenizer-budget planning curve q187 sizes statically): at
    // fixed doc-count checkpoints, the running vocabulary size and
    // token total over the first k docs in doc_id (ingestion) order.
    // The exponent is a plot, not a gate — the card reports the exact
    // (tokens_total, vocab_types) pairs plus the type/token floor
    // ratio. Scale shape: checkpoint thresholds come off ONE
    // TakeOrdered limit(5000) pass (a fixed constant — driver holds
    // ≤ 5000 ids, the KMeansOp scalar contract); V(k)/T(k) are then
    // conditional sums in a SINGLE aggregate over the union of the
    // first-occurrence table (q191's inverted index) and per-doc
    // token counts — no window, no join, one shuffle
    Q("q194_heaps_curve", (s, d) => {
      val docs = t(s, d, "documents")
      val maxK = 5000
      val ids = docs.select(col("doc_id")).orderBy(col("doc_id"))
        .limit(maxK).collect().map(_.getLong(0))
      val ks = Seq(10, 50, 100, 250, 500, 1000, 2500, 5000)
        .filter(_ <= ids.length)
      if (ks.isEmpty) {
        import s.implicits._
        Seq.empty[(Long, Long, Long, Long, Long)]
          .toDF("k", "threshold_doc", "vocab_types", "tokens_total", "ttr_ppm")
      } else {
        val tagged = docs
          .select(col("doc_id"), explode(array_distinct(tokens(col("text")))).as("tok"))
          .groupBy(col("tok")).agg(min(col("doc_id")).as("id"))
          .select(col("id"), lit(1L).as("v"), lit("v").as("kind"))
          .unionByName(docs.select(col("doc_id").as("id"),
            size(tokens(col("text"))).cast(LongType).as("v"), lit("t").as("kind")))
        val sums = ks.flatMap { k =>
          val thr = ids(k - 1)
          Seq(
            sum(when(col("kind") === "v" && col("id") <= thr, col("v"))
              .otherwise(0L)).as(s"v$k"),
            sum(when(col("kind") === "t" && col("id") <= thr, col("v"))
              .otherwise(0L)).as(s"t$k"))
        }
        val stackArgs = ks
          .map(k => s"${k}L, ${ids(k - 1)}L, v$k, t$k").mkString(", ")
        tagged.agg(sums.head, sums.tail: _*)
          .selectExpr(s"stack(${ks.length}, $stackArgs) " +
            "AS (k, threshold_doc, vocab_types, tokens_total)")
          .withColumn("ttr_ppm", expr(
            "CASE WHEN tokens_total = 0L THEN -1L " +
              "ELSE (1000000L * vocab_types) div tokens_total END"))
          .orderBy(col("k"))
      }
    }, Some("""
      WITH ids AS (SELECT doc_id, row_number() OVER (ORDER BY doc_id) rn
                   FROM documents),
      ks AS (SELECT CAST(unnest([10,50,100,250,500,1000,2500,5000]) AS BIGINT)
               AS k),
      th AS (SELECT k, doc_id thr FROM ks JOIN ids ON ids.rn = k),
      tk AS (SELECT doc_id,
               CAST(len(list_filter(string_split(text,' '), x->x<>''))
                    AS BIGINT) ntok
             FROM documents),
      fd AS (SELECT tok, MIN(doc_id) fdoc FROM (
               SELECT doc_id,
                 unnest(list_distinct(list_filter(string_split(text,' '),
                                                  x->x<>''))) tok
               FROM documents) GROUP BY 1)
      SELECT k, CAST(thr AS BIGINT) AS threshold_doc,
        (SELECT CAST(count(*) AS BIGINT) FROM fd WHERE fdoc <= thr)
          AS vocab_types,
        (SELECT CAST(COALESCE(SUM(ntok), 0) AS BIGINT) FROM tk
         WHERE doc_id <= thr) AS tokens_total,
        CAST(CASE WHEN (SELECT COALESCE(SUM(ntok), 0) FROM tk
                        WHERE doc_id <= thr) = 0 THEN -1
             ELSE (1000000 * (SELECT count(*) FROM fd WHERE fdoc <= thr))
                  // (SELECT SUM(ntok) FROM tk WHERE doc_id <= thr) END
             AS BIGINT) AS ttr_ppm
      FROM th ORDER BY k""")),

    // cross-source n-gram novelty (the training-mix diversity card:
    // how much of a source's 3-gram type inventory appears NOWHERE
    // else — boilerplate-heavy or mirrored sources score low, genuinely
    // novel sources high; the type-level complement of q168's
    // frequency drift and q115's near-dup leakage): per source the
    // distinct shingle-type count, the count exclusive to it, and the
    // exclusivity floor ratio. Inverted-index shape (the q75 pattern —
    // never a window over the shingle key): distinct (source, shingle)
    // pairs → per-shingle source count → equi-join back → per-source
    // rollup; cut() because the pair table feeds both sides
    Q("q195_source_ngram_novelty", (s, d) => {
      val sv = t(s, d, "documents")
        .select(col("source"),
          explode(shingles(tokens(col("text")), 3, distinct = true)).as("sh"))
        .distinct().cut() // feeds the per-shingle counts AND the rollup join
      val c = sv.groupBy(col("sh")).agg(count(lit(1)).as("ns"))
      sv.join(c, "sh")
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_types"),
          sum(when(col("ns") === 1L, 1L).otherwise(0L)).as("n_exclusive"))
        .withColumn("novelty_ppm",
          expr("(1000000L * n_exclusive) div n_types"))
        .orderBy(col("source"))
    }, Some("""
      WITH sv AS (SELECT DISTINCT source,
                    unnest(CASE WHEN len(tk)>=3
                           THEN list_distinct([tk[i]||' '||tk[i+1]||' '||tk[i+2]
                                               for i in generate_series(1,len(tk)-2)])
                           ELSE [] END) sh
                  FROM (SELECT source,
                          list_filter(string_split(text,' '), x->x<>'') tk
                        FROM documents)),
      c AS (SELECT sh, CAST(count(*) AS BIGINT) ns FROM sv GROUP BY 1)
      SELECT source, CAST(count(*) AS BIGINT) AS n_types,
        CAST(SUM(CASE WHEN ns = 1 THEN 1 ELSE 0 END) AS BIGINT)
          AS n_exclusive,
        CAST((1000000 * SUM(CASE WHEN ns = 1 THEN 1 ELSE 0 END)) // count(*)
             AS BIGINT) AS novelty_ppm
      FROM sv JOIN c USING (sh) GROUP BY source ORDER BY source""")),

    // bytes-per-token card per source — the tokenizer cost metric
    // every training-budget estimate runs on (chars per whitespace
    // token ≈ the compression a subword tokenizer must beat; q110's
    // ⌊√tokens⌋ mixing weights and q187's coverage curve both assume
    // it's known): Σ token chars computed WITHOUT an explode —
    // Σ len(token) over split-on-space with empties dropped is
    // exactly length(replace(text, ' ', '')), an identity on both
    // engines — so the whole card is one scan-stage projection plus
    // a |sources|-bounded groupBy; ratio as a milli floor
    Q("q205_bytes_per_token", (s, d) => {
      t(s, d, "documents")
        .select(col("source"),
          expr("CAST(length(replace(text, ' ', '')) AS LONG)")
            .as("tok_chars"),
          size(tokens(col("text"))).cast(LongType).as("ntok"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("tok_chars")).as("token_chars"),
          sum(col("ntok")).as("n_tokens"))
        .withColumn("bytes_per_token_milli", expr(
          "CASE WHEN n_tokens = 0L THEN -1L " +
            "ELSE (1000L * token_chars) div n_tokens END"))
        .orderBy(col("source"))
    }, Some("""
      WITH c AS (SELECT source,
                   CAST(length(replace(text, ' ', '')) AS BIGINT) tok_chars,
                   CAST(len(list_filter(string_split(text,' '), x->x<>''))
                        AS BIGINT) ntok
                 FROM documents)
      SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        CAST(SUM(tok_chars) AS BIGINT) AS token_chars,
        CAST(SUM(ntok) AS BIGINT) AS n_tokens,
        CAST(CASE WHEN SUM(ntok) = 0 THEN -1
             ELSE (1000 * SUM(tok_chars)) // SUM(ntok) END AS BIGINT)
          AS bytes_per_token_milli
      FROM c GROUP BY source ORDER BY source""")),

    // character-class profile per language (the byte-level quality
    // signal under q31's token-level scoring: digit-heavy text is
    // tables/logs, space-light text is code/minified — both are
    // filter inputs a corpus audit wants per language). Counts are
    // exact string identities on both engines: digits =
    // length(regexp_replace(text,'[^0-9]','')), spaces =
    // length(text) − length(replace(text,' ','')) (the q205
    // replace identity), alnum via the codegen kernel. Pure
    // scan-stage projections + one |langs|-bounded groupBy
    Q("q219_char_profile", (s, d) => {
      t(s, d, "documents")
        .select(col("lang"),
          length(col("text")).cast(LongType).as("nch"),
          graft.functions.TextExprs.alnumCount(col("text")).as("nalnum"),
          length(regexp_replace(col("text"), "[0-9]", "")).cast(LongType)
            .as("nondigit"),
          length(regexp_replace(col("text"), " ", "")).cast(LongType)
            .as("nonspace"))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("nch")).as("n_chars"),
          sum(col("nalnum")).as("n_alnum"),
          sum(col("nch") - col("nondigit")).as("n_digits"),
          sum(col("nch") - col("nonspace")).as("n_spaces"))
        .withColumn("alnum_milli", expr(
          "CASE WHEN n_chars = 0L THEN -1L " +
            "ELSE (1000L * n_alnum) div n_chars END"))
        .withColumn("digit_milli", expr(
          "CASE WHEN n_chars = 0L THEN -1L " +
            "ELSE (1000L * n_digits) div n_chars END"))
        .withColumn("space_milli", expr(
          "CASE WHEN n_chars = 0L THEN -1L " +
            "ELSE (1000L * n_spaces) div n_chars END"))
        .orderBy(col("lang"))
    }, Some("""
      WITH c AS (SELECT lang,
               CAST(length(text) AS BIGINT) nch,
               CAST(length(regexp_replace(text, '[^A-Za-z0-9]', '', 'g'))
                    AS BIGINT) nalnum,
               CAST(length(text)
                    - length(regexp_replace(text, '[0-9]', '', 'g'))
                    AS BIGINT) ndig,
               CAST(length(text) - length(replace(text, ' ', ''))
                    AS BIGINT) nsp
             FROM documents),
      a AS (SELECT lang, CAST(count(*) AS BIGINT) n_docs,
              CAST(SUM(nch) AS BIGINT) n_chars,
              CAST(SUM(nalnum) AS BIGINT) n_alnum,
              CAST(SUM(ndig) AS BIGINT) n_digits,
              CAST(SUM(nsp) AS BIGINT) n_spaces
            FROM c GROUP BY 1)
      SELECT lang, n_docs, n_chars, n_alnum, n_digits, n_spaces,
        CAST(CASE WHEN n_chars = 0 THEN -1
             ELSE (1000 * n_alnum) // n_chars END AS BIGINT) AS alnum_milli,
        CAST(CASE WHEN n_chars = 0 THEN -1
             ELSE (1000 * n_digits) // n_chars END AS BIGINT) AS digit_milli,
        CAST(CASE WHEN n_chars = 0 THEN -1
             ELSE (1000 * n_spaces) // n_chars END AS BIGINT) AS space_milli
      FROM a ORDER BY lang""")),

    // doc-length Gini concentration per source (is a source's token
    // budget spread evenly or dominated by a few giant documents —
    // the inequality card next to q174 HHI and q152 Pareto, at DOC
    // granularity): population Gini via the mean-absolute-difference
    // identity G = D/(n·S), D = Σ over unordered pairs |len_i−len_j|,
    // computed WITHOUT pairs — sort-free grouped form: per distinct
    // (source, len) cell with count c, docs-below cb and mass-below
    // sb (cumulative windows over the CELL table, partitioned by
    // source), the cell contributes c·(cb·len − sb) to D. Everything
    // integer; products ≤ n²·maxlen ≈ 10²⁸ at 10¹² docs → inside
    // DECIMAL(38,0) (documented bound, the q179 audit rule — and the
    // OUTPUT is the bounded gini_ppm ≤ 10⁶, never a raw magnitude).
    // The windows partition by source and run over distinct-length
    // cells (≤ |len domain| rows per source), never the corpus
    Q("q208_length_gini", (s, d) => {
      val dec = DecimalType(38, 0)
      val cells = t(s, d, "documents")
        .groupBy(col("source"), col("n_chars").cast(LongType).as("len"))
        .agg(count(lit(1)).as("c"))
        .withColumn("xs", col("len") * col("c"))
      val below = Window.partitionBy(col("source")).orderBy(col("len"))
        .rowsBetween(Window.unboundedPreceding, -1)
      cells
        .withColumn("cb", coalesce(sum(col("c")).over(below), lit(0L)))
        .withColumn("sb", coalesce(sum(col("xs")).over(below), lit(0L)))
        .withColumn("dpart",
          col("c").cast(dec) *
            (col("cb").cast(dec) * col("len").cast(dec) - col("sb").cast(dec)))
        .groupBy(col("source"))
        .agg(sum(col("c")).as("n_docs"), sum(col("xs")).as("sum_chars"),
          sum(col("dpart")).as("dd"))
        .withColumn("gini_ppm", expr(
          "CASE WHEN sum_chars = 0L THEN -1L ELSE " +
            "(CAST(1000000 AS DECIMAL(38,0)) * dd) div " +
            "(CAST(n_docs AS DECIMAL(38,0)) * sum_chars) END"))
        .select(col("source"), col("n_docs"), col("sum_chars"),
          col("gini_ppm"))
        .orderBy(col("source"))
    }, Some("""
      WITH cells0 AS (SELECT source, CAST(n_chars AS BIGINT) len,
               CAST(count(*) AS BIGINT) c
             FROM documents GROUP BY 1, 2),
      cells AS (SELECT source, len, c, len * c xs FROM cells0),
      w AS (SELECT source, len, c, xs,
              COALESCE(SUM(c) OVER (PARTITION BY source ORDER BY len
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) cb,
              COALESCE(SUM(xs) OVER (PARTITION BY source ORDER BY len
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) sb
            FROM cells),
      a AS (SELECT source, CAST(SUM(c) AS BIGINT) n_docs,
              CAST(SUM(xs) AS BIGINT) sum_chars,
              SUM(CAST(c AS HUGEINT) * (CAST(cb AS HUGEINT)*len - sb)) dd
            FROM w GROUP BY 1)
      SELECT source, n_docs, sum_chars,
        CAST(CASE WHEN sum_chars = 0 THEN -1
             ELSE (1000000 * dd) // (CAST(n_docs AS HUGEINT) * sum_chars)
             END AS BIGINT) AS gini_ppm
      FROM a ORDER BY source""")),

    // vocabulary coverage-at-k (the tokenizer-design curve next to
    // q134's Zipf card and q194's Heaps growth: what fraction of
    // corpus token VOLUME do the top-k types cover? — the question
    // that sizes a vocab before BPE training): coverage at three
    // FIXED ks (2/8/32 — calibrated to the synthetic 31-type vocab so
    // every gate row carries signal, the q133 literal doctrine; the
    // k=32 row saturating at 10⁶ ppm is the honest "vocab exhausted"
    // verdict). Top-k membership has the TOTAL deterministic order
    // (count desc, token asc — the q90 vocab rule).
    // 100 TB shape: the type count is a map-side-combined
    // groupBy(token) (shuffle = O(distinct types)); top-k is a
    // bounded TakeOrdered (partial heaps, never a corpus sort) whose
    // ≤ 32 rows collect to the driver (the q194 bounded-top-k scalar
    // contract); coverage sums and the ppm division run on the
    // driver — in BigInt, because 10⁶·covered bursts int64 at 10¹⁴
    // corpus tokens (the q179 rule; covered/total themselves are
    // linear counts and stay emitted).
    Q("q227_vocab_coverage", (s, d) => {
      val ks = Seq(2, 8, 32)
      val counts = t(s, d, "documents")
        .select(explode(tokens(col("text"))).as("tok"))
        .groupBy(col("tok")).agg(count(lit(1)).as("c"))
        .cut() // feeds the total scalar and the top-k pass
      val totRow = counts.agg(sum(col("c"))).head()
      val total = if (totRow.isNullAt(0)) 0L else totRow.getLong(0)
      val top = counts.orderBy(col("c").desc, col("tok"))
        .limit(ks.max).select(col("c")).collect().map(_.getLong(0))
      import s.implicits._
      ks.map { k =>
        val covered = top.take(k).sum
        val ppm =
          if (total == 0L) -1L
          else (BigInt(1000000) * covered / total).toLong
        (k.toLong, covered, total, ppm)
      }.toDF("k", "covered", "total", "coverage_ppm").orderBy(col("k"))
    }, Some("""
      WITH tk AS (SELECT list_filter(string_split(text,' '), x->x<>'') tk
                  FROM documents),
      ex AS (SELECT unnest(tk) tok FROM tk),
      c AS (SELECT tok, CAST(count(*) AS BIGINT) c FROM ex GROUP BY 1),
      tot AS (SELECT CAST(COALESCE(SUM(c), 0) AS BIGINT) total FROM c),
      rk AS (SELECT c, row_number() OVER (ORDER BY c DESC, tok) rn FROM c),
      ks(k) AS (VALUES (2), (8), (32)),
      cov AS (SELECT ks.k,
                CAST(COALESCE(SUM(CASE WHEN rk.rn <= ks.k THEN rk.c END), 0)
                  AS BIGINT) covered
              FROM ks, rk GROUP BY 1)
      SELECT CAST(k AS BIGINT) AS k, covered, tot.total AS total,
        CAST(CASE WHEN tot.total = 0 THEN -1
             ELSE (1000000 * CAST(covered AS HUGEINT)) // tot.total
             END AS BIGINT) AS coverage_ppm
      FROM cov, tot ORDER BY k"""))
  )
}
