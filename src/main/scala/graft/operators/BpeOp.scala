package graft.operators

import graft.Checkpoints._

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.ExactCols.tokens

/** BPE merge-rule learning (Sennrich et al. 2016 "Neural Machine
  * Translation of Rare Words with Subword Units" §3.2) — the
  * tokenizer-TRAINING stage of a data pipeline, next to the vocab
  * construction (q90) and BPE-style segmentation (q32) that consume
  * its output: count corpus words once, then iterate argmax-pair →
  * merge over the distinct-word table.
  *
  * Distribution is the industrial trainer shape: the ONE corpus-wide
  * shuffle is the map-side-combined word count (same as q90's vocab
  * count); every round after that runs over the |vocab|-row word
  * table — an explode of adjacent symbol pairs, a partial+final
  * groupBy(pair) weighted count, and a scan-stage merge rewrite. The
  * driver holds one argmax row per round (the KMeansOp centroid
  * contract); segmentations never leave executors, and each round
  * localCheckpoints the word table so lineage stays flat (the
  * ConnectedComponents rule).
  *
  * Exactness: a word's segmentation is kept as a single string with
  * U+001F double-separators (`␟␟sym␟␟…`), so applying a merge is ONE
  * sequential left-to-right non-overlapping `replace` of
  * `␟a␟␟b␟` with `␟ab␟` — byte-identical semantics in Spark
  * (UTF8String.replace) and DuckDB (q97's oracle replays the whole
  * trajectory in a recursive CTE with the same replace), including
  * the greedy-leftmost overlap rule for left==right runs
  * (`aaa → [aa, a]`; BpeSpec pins it). Pair counts weight every
  * adjacent position by word frequency (the reference get_stats
  * semantics: `aaa` contributes (a,a) twice); ties break
  * (count desc, left asc, right asc). All counts are int64; nothing
  * floats.
  */
object BpeOp {

  /** Symbol separator — outside every token alphabet (tokens are
    * whitespace-split, so they cannot contain a control char). */
  val Sep = "\u001f"
  private val Sep2 = Sep + Sep

  final case class Merge(round: Int, left: String, right: String,
                         pairN: Long, nSyms: Long)

  /** Learn `rounds` merge rules from the documents' `text` column.
    * Returns one Merge per round: the rule, its weighted pair count,
    * and the corpus-wide distinct-symbol count AFTER applying it.
    * Fails loudly (require) if a round has no adjacent pair left —
    * the q66 exact-regime doctrine, not a silent short vocabulary. */
  def train(docs: DataFrame, rounds: Int): Seq[Merge] = {
    val words = docs
      .select(explode(tokens(col("text"))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("n"))
    // (?s): a token CAN carry \n/\r (tokens() splits on spaces only)
    // and the oracle's word[i] char indexing sees every char — the
    // dot must too, or the two segmentations diverge off-corpus
    var seg = words.select(col("word"), col("n"),
      concat(lit(Sep2),
        array_join(regexp_extract_all(col("word"), lit("(?s)(.)"), lit(1)), Sep2),
        lit(Sep2)).as("t"))
      .cut()
    val sy = array_remove(split(col("t"), Sep), "")
    // round r's argmax and round r−1's post-merge symbol count both
    // scan seg_{r−1}, so they ride ONE union + ONE collect (the lazy
    // checkpoint materializes in the same job): rounds+1 jobs total
    // where the eager-cut + two-collect shape paid 3 per round.
    def bothAggs(s: DataFrame) = {
      val mx = s
        .select(col("n"), sy.as("sy"))
        .select(col("n"), explode(arrays_zip(
          slice(col("sy"), lit(1), size(col("sy")) - 1),
          slice(col("sy"), lit(2), size(col("sy")) - 1))).as("p"))
        .select(col("n"), col("p.0").as("pa"), col("p.1").as("pb"))
        .groupBy("pa", "pb").agg(sum("n").as("cnt"))
        .orderBy(desc("cnt"), asc("pa"), asc("pb")).limit(1)
        .select(lit("mx").as("k"), col("pa"), col("pb"), col("cnt"))
      val ns = s.select(explode(sy).as("s"))
        .agg(count_distinct(col("s")).as("cnt"))
        .select(lit("ns").as("k"), lit(null).cast("string").as("pa"),
          lit(null).cast("string").as("pb"), col("cnt"))
      mx.unionByName(ns).collect()
        .map(r => r.getString(0) -> r).toMap
    }
    def nSymsOnly(s: DataFrame): Long = s.select(explode(sy).as("s"))
      .agg(count_distinct(col("s"))).collect()(0).getLong(0)
    val out = Seq.newBuilder[Merge]
    // the merge picked in round r completes (gets its nSyms) one
    // action later — round r+1's fused collect, or the final one
    var lastMerge: Option[(Int, String, String, Long)] = None
    for (r <- 1 to rounds) {
      val aggs = bothAggs(seg)
      lastMerge.foreach { case (r0, pa0, pb0, cnt0) =>
        out += Merge(r0, pa0, pb0, cnt0, aggs("ns").getLong(3))
      }
      val best = aggs.get("mx")
      require(best.nonEmpty,
        s"BPE round $r: no adjacent pairs left — corpus fully merged; " +
          s"lower `rounds` below $rounds")
      val (pa, pb, cnt) =
        (best.get.getString(1), best.get.getString(2), best.get.getLong(3))
      seg = seg.withColumn("t",
        replace(col("t"), lit(Sep + pa + Sep2 + pb + Sep),
          lit(Sep + pa + pb + Sep)))
        .cut()
      lastMerge = Some((r, pa, pb, cnt))
    }
    lastMerge.foreach { case (r0, pa0, pb0, cnt0) =>
      out += Merge(r0, pa0, pb0, cnt0, nSymsOnly(seg))
    }
    out.result()
  }

  /** Apply learned merges — Sennrich's apply_bpe rule: fold the rules
    * over each word IN LEARNED ORDER, each application the same
    * sequential greedy-leftmost replace as training (so encoding the
    * training corpus reproduces the training-final segmentation
    * exactly; BpeSpec pins it). Returns the per-doc audit: token and
    * subtoken counts, fertility (ONE IEEE division of two int64s),
    * and an order-independent segmentation checksum (Σ hmod(seg
    * string) over token instances, mod P).
    *
    * 100 TB shape: the whole merge fold is ONE scan-stage projection
    * over the DISTINCT-word table (R nested codegen replaces — no
    * loop actions, no driver traffic, the exact-clone-collapse
    * doctrine applied at word granularity), then an explode + word
    * equi-join (broadcast when the vocab is small, AQE otherwise)
    * and a map-side-combined per-doc monoid aggregation. */
  def encode(docs: DataFrame,
             merges: Seq[(String, String)]): DataFrame = {
    import graft.functions.ExactCols.{hmod, P}
    val t0 = concat(lit(Sep2),
      array_join(regexp_extract_all(col("tok"), lit("(?s)(.)"), lit(1)), Sep2),
      lit(Sep2))
    val tFinal = merges.foldLeft(t0) { case (t, (a, b)) =>
      replace(t, lit(Sep + a + Sep2 + b + Sep), lit(Sep + a + b + Sep))
    }
    val wk = docs.select(explode(tokens(col("text"))).as("tok"))
      .distinct()
      .select(col("tok"), tFinal.as("t"))
      .select(col("tok"),
        size(array_remove(split(col("t"), Sep), "")).cast("long").as("k"),
        hmod(col("t")).as("h"))
    val per = docs
      .select(col("doc_id"), explode(tokens(col("text"))).as("tok"))
      .join(wk, "tok")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("ntok"),
        sum(col("k")).as("n_subtok"),
        (sum(col("h")) % P).as("subtok_checksum"))
    docs.select(col("doc_id")).join(per, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("ntok"), lit(0L)).as("ntok"),
        coalesce(col("n_subtok"), lit(0L)).as("n_subtok"),
        when(coalesce(col("ntok"), lit(0L)) > 0,
          col("n_subtok").cast("double") / col("ntok"))
          .otherwise(lit(0.0)).as("fertility"),
        coalesce(col("subtok_checksum"), lit(0L)).as("subtok_checksum"))
  }
}
