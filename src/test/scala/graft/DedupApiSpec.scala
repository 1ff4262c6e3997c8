package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.{Dedup, Similarity}
import graft.queries.Dedup.LshConfig

/** Front-door routing + skew-guard behavior:
  *  - default near-dup paths must plan as bucketed equi-joins (no
  *    nested-loop/cartesian anywhere in the plan);
  *  - the bucket cap must bound a degenerate mega-bucket's pair count
  *    at C(cap, 2) instead of going quadratic;
  *  - the brute baselines stay available behind brute = true only. */
class DedupApiSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def noNestedLoop(df: DataFrame): Unit = {
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoop") && !plan.contains("CartesianProduct"),
      s"nested-loop join in a default-routed plan:\n$plan")
  }

  /** n docs all sharing identical text — every band/block collides
    * into one mega-bucket (the LSH worst case). */
  private def identicalDocs(n: Int): DataFrame = {
    import spark.implicits._
    (0 until n).map(i => (i.toLong, "alpha beta gamma delta epsilon zeta eta theta"))
      .toDF("doc_id", "text")
  }

  private def variedDocs: DataFrame = {
    import spark.implicits._
    // two planted near-dup pairs + noise docs
    Seq(
      (0L, "the quick brown fox jumps over the lazy dog today"),
      (1L, "the quick brown fox jumps over the lazy dog tonight"),
      (2L, "entirely different content about spark catalyst plans"),
      (3L, "entirely different content about spark catalyst rules"),
      (4L, "unrelated text one two three four five six seven"),
      (5L, "lorem ipsum dolor sit amet consectetur adipiscing elit")
    ).toDF("doc_id", "text")
  }

  test("default nearDupPairs plans without nested-loop joins; brute does not") {
    noNestedLoop(Dedup.nearDupPairs(variedDocs))
    val brutePlan = Dedup.nearDupPairs(variedDocs, brute = true)
      .queryExecution.executedPlan.toString
    assert(brutePlan.contains("BroadcastNestedLoop") || brutePlan.contains("CartesianProduct"))
  }

  test("LSH route is a sound subset of brute, with no false positives") {
    def pairs(df: DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = pairs(Dedup.nearDupPairs(variedDocs))
    val brute = pairs(Dedup.nearDupPairs(variedDocs, brute = true))
    // brute is exhaustive ground truth; LSH verifies candidates with
    // exact jaccard so it can only miss (per-pair recall is
    // probabilistic — gate q24 pins 100% recall on the calibrated
    // corpus), never fabricate
    assert(brute == Set((0L, 1L), (2L, 3L)))
    assert(lsh.subsetOf(brute))
    assert(lsh.contains((2L, 3L)))
  }

  test("mega-bucket pair count is bounded at C(cap,2) by the skew guard") {
    val docs = identicalDocs(300) // uncapped would be C(300,2) = 44 850 pairs
    val c10 = Dedup.nearDupPairs(docs, LshConfig(maxBucketSize = 10)).count()
    val c50 = Dedup.nearDupPairs(docs, LshConfig(maxBucketSize = 50)).count()
    assert(c10 == 45L)   // C(10,2)
    assert(c50 == 1225L) // C(50,2)
  }

  test("ngramJaccardPairs: count and prefix-filter modes agree exactly") {
    import org.apache.spark.sql.functions.round
    def pairs(mode: String) =
      Dedup.ngramJaccardPairs(variedDocs, 0.3, mode = mode)
        .withColumn("jaccard", round(org.apache.spark.sql.functions.col("jaccard"), 9))
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val count = pairs("count")
    val pf = pairs("prefix")
    assert(count.nonEmpty)
    assert(count == pf)
    // and on a clone-heavy corpus (every pair is a near-dup)
    def clonePairs(mode: String) =
      Dedup.ngramJaccardPairs(identicalDocs(20), 0.3, mode = mode).count()
    assert(clonePairs("count") == 190L && clonePairs("prefix") == 190L) // C(20,2)
  }

  test("auto mode flips on corpus shape: count on mixed, prefix on clone-heavy") {
    // mixed corpus: shingle df ~ 1-2 → co-occurrence counting
    assert(Dedup.jaccardMode(variedDocs) == "count")
    // clone corpus: every shingle's df = clone-group size (20) →
    // co-occurrence rows = |shingles| x distinct pairs → prefix filter
    assert(Dedup.jaccardMode(identicalDocs(20)) == "prefix")
    // auto produces the same exact pairs as either forced mode
    val auto = Dedup.ngramJaccardPairs(identicalDocs(20), 0.3).count()
    assert(auto == 190L)
  }

  test("simhash mega-bucket is capped the same way") {
    val docs = identicalDocs(200)
    val n = Dedup.simhashPairs(docs, LshConfig(maxBucketSize = 10)).count()
    assert(n == 45L)
    noNestedLoop(Dedup.simhashPairs(variedDocs))
  }

  test("cosinePairs default routes to sign-LSH buckets and matches brute") {
    import spark.implicits._
    // two antipodal clusters around ±e1: in-cluster cosine ≈ 1,
    // cross-cluster ≈ −1 (different sign buckets anyway)
    val vecs = (0 until 10).map { i =>
      val s = if (i < 5) 1.0f else -1.0f
      (i.toLong, Seq(s, 0.01f * i, 0.02f, 0.03f, 0.01f, 0.02f))
    }.toDF("vec_id", "embedding")
    val lsh = Dedup.cosinePairs(vecs, 0.9)
    noNestedLoop(lsh)
    def pairs(df: DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = Dedup.cosinePairs(vecs, 0.9, brute = true)
    assert(pairs(lsh).nonEmpty)
    assert(pairs(lsh) == pairs(brute))
  }

  test("cosinePairs clone collapse: replication expands pairs bit-exactly") {
    import spark.implicits._
    val sf = "/root/testdata/sf0.001"
    val vecs = Tables.t(spark, sf, "embeddings").select("vec_id", "embedding")
    val base = Dedup.cosinePairs(vecs, 0.35).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // duplicate every vector once with a higher id: each base pair
    // expands to the 4 cross copies (same cosine VERBATIM) and each
    // vector pairs with its own clone via the intra path
    import org.apache.spark.sql.functions.col
    val cloned = vecs.unionByName(vecs.select(
      (col("vec_id") + 100000L).as("vec_id"), col("embedding")))
    val rep = Dedup.cosinePairs(cloned, 0.35).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val nVec = vecs.count()
    assert(rep.length == 4 * base.length + nVec,
      s"${rep.length} pairs != 4*${base.length} cross + $nVec intra")
    // cross pairs carry the rep cosine verbatim (exact double equality)
    val baseSet = base.map { case (a, b, c) => (a, b, c) }.toSet
    val crossBack = rep.filter { case (a, b, _) => (b % 100000L) != a }
      .map { case (a, b, c) => (a % 100000L, b % 100000L, c) }
      .map { case (a, b, c) => (math.min(a, b), math.max(a, b), c) }.toSet
    assert(crossBack == baseSet)
    // intra pairs: one per vector, cosine computed by the same
    // icosine expression (≈1 but NOT asserted as literal 1.0)
    val intra = rep.filter { case (a, b, _) => b % 100000L == a }
    assert(intra.length == nVec && intra.forall(_._3 > 0.999))
  }

  test("annTopK default (lsh) plans without nested loops and ranks correctly") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    import graft.functions.ExactCols._
    val vecs = (0 until 40).map { i =>
      (i.toLong, Seq(1.0f + 0.001f * i, 0.1f * (i % 4), 0.2f, 0.3f, 0.1f, 0.2f))
    }.toDF("vec_id", "embedding")
    val queries = vecs.filter(col("vec_id") === 0)
      .select(col("vec_id").as("query_id"),
        iscale(col("embedding")).as("qv"))
      .withColumn("qn", inorm(col("qv")))
    val top = Similarity.annTopK(vecs, queries, 3)
    noNestedLoop(top)
    val rows = top.collect()
    assert(rows.length == 3)
    assert(rows.forall(_.getAs[Long]("query_id") == 0L))
  }

  test("annTopK multi-probe raises recall toward the brute baseline") {
    import org.apache.spark.sql.functions._
    import graft.functions.ExactCols._
    // real testdata embeddings: the corpus LSH was calibrated against
    val emb = Tables.t(spark, "/root/testdata/sf0.001", "embeddings")
    val queries = emb.filter(col("vec_id") % 100 === 0)
      .select(col("vec_id").as("query_id"), iscale(col("embedding")).as("qv"))
      .withColumn("qn", inorm(col("qv")))
    def hits(df: DataFrame): Set[(Long, Long)] =
      df.collect()
        .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val brute = hits(Similarity.annTopK(emb, queries, 3, method = "brute"))
    def recall(probes: Int, bits: Int): Double = {
      val p = hits(Similarity.annTopK(emb, queries, 3,
        signBitCount = bits, probes = probes))
      (p & brute).size.toDouble / brute.size
    }
    // flipping low-|margin| bits only ADDS probed buckets: candidates
    // are supersets, so recall is monotone in probes (a true top-3
    // candidate can only be displaced by a better true top-3 one)
    val Seq(r1, r2, r4) = Seq(1, 2, 4).map(recall(_, 3))
    info(s"3-bit recall at probes 1/2/4: $r1 / $r2 / $r4")
    assert(r1 <= r2 && r2 <= r4, s"recall not monotone: $r1 / $r2 / $r4")
    assert(r4 > r1, s"probing 4 of 8 buckets should beat 1: $r1 -> $r4")
    assert(r4 >= 0.5, s"probes=4 recall $r4 — calibration drifted")
  }

  test("exact-clone collapse: pairs and clusters match the uncollapsed semantics on a cloned corpus") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // 3 clones of text A, 2 clones of near-dup A' (shingle jaccard
    // 3/5 = 0.6), one unrelated doc — ids deliberately interleaved so
    // group mins and least/greatest expansion are exercised
    val docs = Seq(
      (0L, "alpha beta gamma delta epsilon zeta"),
      (1L, "alpha beta gamma delta epsilon zeta"),
      (5L, "alpha beta gamma delta epsilon zeta"),
      (2L, "alpha beta gamma delta epsilon eta"),
      (4L, "alpha beta gamma delta epsilon eta"),
      (3L, "one two three four five six")
    ).toDF("doc_id", "text")
    // pairs vs a brute per-doc-pair recompute (jaccard is text-pure)
    def sh(t: String) = t.split(" ").sliding(3).map(_.mkString(" ")).toSet
    val byId = Seq(0L -> "alpha beta gamma delta epsilon zeta",
      1L -> "alpha beta gamma delta epsilon zeta",
      5L -> "alpha beta gamma delta epsilon zeta",
      2L -> "alpha beta gamma delta epsilon eta",
      4L -> "alpha beta gamma delta epsilon eta",
      3L -> "one two three four five six").toMap
    val expectedPairs = (for {
      a <- byId.keys; b <- byId.keys if a < b
      inter = (sh(byId(a)) & sh(byId(b))).size
      union = (sh(byId(a)) | sh(byId(b))).size
      j = inter.toDouble / union if j >= 0.3
    } yield (a, b, j)).toSet
    val got = Dedup.ngramJaccardPairs(docs, 0.3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got == expectedPairs)
    assert(got.count(_._3 == 1.0) == 4) // C(3,2) + C(2,2) clone pairs
    // clusters vs the uncollapsed formulation run directly
    val uncollapsed = graft.operators.ConnectedComponents
      .components(Dedup.nearDupPairs(docs).select(col("a_id"), col("b_id")),
        docs.select(col("doc_id")))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val collapsed = Dedup.clusters(docs)
      .select(col("doc_id"), col("cluster_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(collapsed == uncollapsed)
    // and clones of one text always share a cluster even when caps
    // would truncate LSH buckets — group membership is exact
    val capped = Dedup.clusters(docs, LshConfig(maxBucketSize = 2))
      .select(col("doc_id"), col("cluster_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(Set(0L, 1L, 5L).map(capped) == Set(capped(0L)))
  }

  test("dupNgramStats: hand-computed fractions, clone invariance, shingle-less zeros") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // distinct texts A and B share exactly the shingle "a b c"; doc 7
    // clones A (stats must be IDENTICAL to A's — df counts distinct
    // texts, so clones can't inflate their own duplication); doc 9 is
    // too short to shingle
    val docs = Seq(
      (0L, "a b c d e"), // shingles {abc,bcd,cde}
      (1L, "a b c x y"), // shingles {abc,bcx,cxy}
      (7L, "a b c d e"), // clone of A
      (9L, "a b")        // shingle-less
    ).toDF("doc_id", "text")
    val got = Dedup.dupNgramStats(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    val third = 1.0 / 3
    assert(got == Map(
      0L -> ((3L, 1L, third)), 1L -> ((3L, 1L, third)),
      7L -> ((3L, 1L, third)), 9L -> ((0L, 0L, 0.0))), got.toString)
    // no pair join anywhere in the plan (the operator's whole point)
    noNestedLoop(Dedup.dupNgramStats(docs))
  }

  test("deduplicateKeepBest keeps the longest cluster member, min-id tie-break") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // cluster {0,1}: doc 1 is LONGER (an extra trailing token keeps
    // jaccard at 7/10 ≥ 0.5) → policy must keep 1 where min-id
    // dedup keeps 0; cluster {2,3}: equal lengths → tie-break keeps 2;
    // 4 is a singleton
    // doc 5 CLONES the short member of cluster {0,1}: it ties its rep
    // on ntok and loses the min-id tie-break, so the longer doc 1
    // still wins (the rep-level argmax is exact under cloning);
    // docs 8/9 are identical but too short to shingle — both survive
    // as their own singleton clusters ([[deduplicate]]'s semantics)
    val docs = Seq(
      (0L, "the quick brown fox jumps over the lazy dog today"),
      (1L, "the quick brown fox jumps over the lazy dog today extra"),
      (5L, "the quick brown fox jumps over the lazy dog today"),
      (2L, "entirely different content about spark catalyst plans"),
      (3L, "entirely different content about spark catalyst rules"),
      (4L, "unrelated text one two three four five six seven"),
      (8L, "a b"),
      (9L, "a b")
    ).toDF("doc_id", "text")
    val kept = Dedup.deduplicateKeepBest(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(kept == Set((1L, 0L, 11L), (2L, 2L, 7L), (4L, 4L, 9L),
      (8L, 8L, 2L), (9L, 9L, 2L)), kept.toString)
    // min-id policy on the same corpus keeps 0 — the two front doors
    // agree on cluster structure, differ only in the selection rule
    val minId = Dedup.deduplicate(docs).select(col("doc_id"))
      .collect().map(_.getLong(0)).toSet
    assert(minId == Set(0L, 2L, 4L, 8L, 9L))
  }

  test("deduplicateIncremental: drops vs index and vs earlier incoming, never re-dedups the index") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // index holds text A twice (1, 3 — deliberately NOT deduplicated:
    // the operator must not care) plus novel B
    val index = Seq(
      (1L, "the quick brown fox jumps over the lazy dog today"),
      (3L, "the quick brown fox jumps over the lazy dog today"),
      (5L, "completely unrelated index content about databases here")
    ).toDF("doc_id", "text")
    // incoming: 11 clones A → dropped vs index; 13 near-dups A
    // (A + one trailing token, jaccard 8/9 — the pair the keep-best
    // test proves band-collides) → dropped vs index; 15 is novel →
    // kept; 17/19 near-dup EACH OTHER only (the proven catalyst
    // plans/rules pair) → 17 kept (lower gid), 19 dropped vs earlier
    // incoming; 21/23 identical but shingle-less → both survive
    // (deduplicate's bypass semantics)
    val incoming = Seq(
      (11L, "the quick brown fox jumps over the lazy dog today"),
      (13L, "the quick brown fox jumps over the lazy dog today extra"),
      (15L, "fresh new snapshot material nothing like anything before"),
      (17L, "entirely different content about spark catalyst plans"),
      (19L, "entirely different content about spark catalyst rules"),
      (21L, "a b"),
      (23L, "a b")
    ).toDF("doc_id", "text")
    val kept = Dedup.deduplicateIncremental(index, incoming)
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    assert(kept == Set(15L, 17L, 21L, 23L), kept.toString)
    // no nested-loop/cartesian anywhere (banded equi-joins only)
    noNestedLoop(Dedup.deduplicateIncremental(index, incoming))
    // partition-pure: same survivors from scattered scans
    val again = Dedup.deduplicateIncremental(
        index.repartition(5), incoming.repartition(7))
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    assert(again == kept)
  }

  test("containment catches fragment duplicates that jaccard misses") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // doc 1 is a strict 6-token fragment of 30-token doc 0: its 4
    // shingles are all inside doc 0's 28 → containment 1.0, jaccard
    // 4/28 ≈ 0.14. doc 3 clones the fragment (clone expansion at 1.0).
    val long = (1 to 30).map(i => s"w$i").mkString(" ")
    val frag = (1 to 6).map(i => s"w$i").mkString(" ")
    val docs = Seq(
      (0L, long), (1L, frag), (3L, frag),
      (2L, "totally unrelated content about something else entirely x")
    ).toDF("doc_id", "text")
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val jac = pairs(Dedup.ngramJaccardPairs(docs, 0.3))
    assert(!jac.exists(p => p._1 == 0L && p._2 == 1L),
      s"jaccard should miss the fragment pair: $jac")
    val cont = pairs(Dedup.containmentPairs(docs, 0.8))
    assert(cont == Set((0L, 1L, 1.0), (0L, 3L, 1.0), (1L, 3L, 1.0)), cont.toString)
    // symmetric near-identical docs score the same as jaccard would
    // rank them: containment >= jaccard always (min <= union)
    val jAll = pairs(Dedup.ngramJaccardPairs(docs, 0.01))
    val cAll = pairs(Dedup.containmentPairs(docs, 0.01))
    for ((a, b, j) <- jAll; (ca, cb, c) <- cAll if ca == a && cb == b)
      assert(c >= j - 1e-12, s"containment($a,$b)=$c < jaccard=$j")
  }

  test("semdedup mega-cluster comparisons are capped like the LSH buckets") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // 300 near-identical vectors all land in one cluster (k = 1): the
    // uncapped within-cluster join would be C(300,2) pairs pruning 299
    // vectors; the cap compares only the first `cap` by id, so exactly
    // cap-1 are pruned and the rest are KEPT, not dropped
    val vecs = (0 until 300).map { i =>
      (i.toLong, Seq(1.0f, 0.5f, 0.25f, 0.125f + 0.000001f * i, 0.0625f, 0.03125f))
    }.toDF("vec_id", "embedding")
    val c10 = Dedup.semdedupPrune(vecs, 0.9, k = 1, maxClusterSize = 10)
    val c50 = Dedup.semdedupPrune(vecs, 0.9, k = 1, maxClusterSize = 50)
    assert(c10.filter(col("pruned")).count() == 9L)
    assert(c50.filter(col("pruned")).count() == 49L)
    assert(c10.count() == 300L, "capping must drop comparisons, not vectors")
  }

  test("semdedup auto-k derives cluster count from corpus size") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // three well-separated directions, 60 vectors each; auto-k with
    // targetClusterSize 60 must pick k = ceil(180/60) = 3 and the
    // assignment must use all three centroids
    val vecs = (0 until 180).map { i =>
      val axis = i % 3
      val base = Array(0.01f, 0.01f, 0.01f, 0.01f, 0.01f, 0.01f)
      base(axis) = 1.0f
      base(axis + 3) = 0.001f * i
      (i.toLong, base.toSeq)
    }.toDF("vec_id", "embedding")
    val pr = Dedup.semdedupPrune(vecs, 0.99, targetClusterSize = 60)
    val cids = pr.select(col("cid")).distinct().collect().map(_.getLong(0)).toSet
    assert(cids.subsetOf(Set(0L, 1L, 2L)), s"auto-k should cap cids at k=3: $cids")
    assert(pr.count() == 180L)
  }

  test("q81 semdedup prunes within clusters against a brute recompute") {
    import org.apache.spark.sql.functions.col
    import graft.functions.ExactCols
    val sf = "/root/testdata/sf0.001"
    val rows = SparkEntry.queries("q81_semdedup")(spark, sf).collect()
    assert(rows.map(_.getAs[Long]("n")).sum == 500, "cluster sizes must cover the corpus")
    assert(rows.forall(r => r.getAs[Long]("n_pruned") < r.getAs[Long]("n")),
      "a cluster lost every member — prune rule broken")
    assert(rows.map(_.getAs[Long]("n_pruned")).sum > 0,
      "nothing pruned at cosine 0.35 — calibration drifted")
    // brute: every pruned vec must have a smaller-id partner in ITS
    // cluster at cosine >= 0.35, computed independently
    val iv = Tables.t(spark, sf, "embeddings")
      .select(col("vec_id"), ExactCols.iscale(col("embedding")).as("v"))
      .collect()
      .map(r => r.getAs[Long]("vec_id") ->
        r.getAs[scala.collection.Seq[Long]]("v").toArray).toMap
    def cos(a: Array[Long], b: Array[Long]): Double = {
      var d = 0L; var na = 0L; var nb = 0L; var i = 0
      while (i < a.length) { d += a(i)*b(i); na += a(i)*a(i); nb += b(i)*b(i); i += 1 }
      d.toDouble / (math.sqrt(na.toDouble) * math.sqrt(nb.toDouble))
    }
    // recover the assignment through the same gate's sibling (q77 runs
    // the identical fit): group vec ids by their pruned-checksum cluster
    val fit = graft.operators.KMeansOp.fit(
      Tables.t(spark, sf, "embeddings")
        .select(col("vec_id"), ExactCols.iscale(col("embedding")).as("v")),
      "vec_id", "v", k = 4, maxIter = 3, tol = -1.0)
    val cents = fit.centroids
    def assign(v: Array[Long]): Int = cents.indices.minBy { c =>
      var s = BigInt(0); var i = 0
      while (i < v.length) { val dd = v(i) - cents(c)(i); s += BigInt(dd)*BigInt(dd); i += 1 }
      (s, c)
    }
    val byCluster = iv.toSeq.groupBy { case (_, v) => assign(v) }
    val brutePruned = byCluster.flatMap { case (_, ms) =>
      val sorted = ms.sortBy(_._1)
      sorted.filter { case (id, v) =>
        sorted.exists { case (id2, v2) => id2 < id && cos(v2, v) >= 0.35 }
      }.map(_._1)
    }.toSet
    val gotStats = rows.map(r => r.getAs[Long]("cluster_id") ->
      (r.getAs[Long]("n_pruned"), r.getAs[Long]("pruned_checksum"))).toMap
    def h(s: String): Long =
      BigInt(java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
        .take(15), 16).toLong % ExactCols.P
    val expStats = byCluster.map { case (c, ms) =>
      val pruned = ms.map(_._1).filter(brutePruned).sorted
      c.toLong -> (pruned.size.toLong, pruned.map(id => h(id.toString)).sum % ExactCols.P)
    }
    assert(gotStats == expStats)
  }

  test("q78 survivors = exactly the q56 cluster representatives") {
    import org.apache.spark.sql.functions.col
    val sf = "/root/testdata/sf0.001"
    val survivors = SparkEntry.queries("q78_dedup_survivors")(spark, sf)
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    val clusters = SparkEntry.queries("q56_dup_clusters")(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("cluster_id"))
    // one survivor per cluster, and it is the min-id member
    assert(survivors == clusters.map(_._2).toSet)
    val total = clusters.length
    assert(survivors.size < total, "dedup kept everything — pairs lost")
    assert(survivors.size == clusters.map(_._2).distinct.length)
  }

  test("reliable-checkpoint mode (graft.checkpoint.dir) matches the localCheckpoint default") {
    import org.apache.spark.sql.functions.col
    // the dedup family's lineage cuts (Checkpoints.cut) default to
    // localCheckpoint — fast, but executor-loss-fragile; with
    // graft.checkpoint.dir set they switch to reliable checkpoint()
    // files. Both modes must produce identical results: the cut point
    // only truncates lineage, never changes semantics.
    val docs = variedDocs.union(identicalDocs(6).withColumn("doc_id", col("doc_id") + 100L))
    def run(): (Set[String], Set[String]) = (
      Dedup.ngramJaccardPairs(docs, 0.3).collect().map(_.toString).toSet,
      Dedup.clusters(docs).collect().map(_.toString).toSet)
    val (pairsDefault, clustersDefault) = run()
    val dir = java.nio.file.Files.createTempDirectory("graft-ckpt").toString
    spark.conf.set("graft.checkpoint.dir", dir)
    try {
      val (pairsReliable, clustersReliable) = run()
      assert(pairsReliable == pairsDefault)
      assert(clustersReliable == clustersDefault)
      // the reliable mode really wrote checkpoint files
      assert(spark.sparkContext.getCheckpointDir.nonEmpty)
    } finally spark.conf.unset("graft.checkpoint.dir")
  }

  test("reliable-checkpoint mode: a full dedup gate is identical and writes checkpoint files") {
    // executor-loss tolerance, end-to-end: the q56 gate (clustering via
    // iterated connected components — cut() every round) run with
    // graft.checkpoint.dir set must (a) produce the exact gate rows of
    // the default localCheckpoint mode and (b) physically write rdd
    // checkpoint files under the directory — the artifact a recovering
    // executor re-reads instead of failing the job.
    val sf = "/root/testdata/sf0.001"
    val expected = SparkEntry.queries("q56_dup_clusters")(spark, sf)
      .collect().map(_.toString).sorted.toSeq
    val dir = java.nio.file.Files.createTempDirectory("graft-ckpt-gate")
    spark.conf.set("graft.checkpoint.dir", dir.toString)
    try {
      val got = SparkEntry.queries("q56_dup_clusters")(spark, sf)
        .collect().map(_.toString).sorted.toSeq
      assert(got == expected)
      val files = java.nio.file.Files.walk(dir).iterator()
      val rddFiles = Iterator.continually(files)
        .takeWhile(_.hasNext).map(_.next.toString)
        .filter(p => p.contains("rdd-") && !new java.io.File(p).isDirectory)
        .toList
      assert(rddFiles.nonEmpty, s"no rdd checkpoint files under $dir")
    } finally spark.conf.unset("graft.checkpoint.dir")
  }

  test("q93: no near-dup cluster straddles a split boundary; a doc-hash split does") {
    import org.apache.spark.sql.functions.col
    val sf = "/root/testdata/sf0.001"
    val cl = SparkEntry.queries("q56_dup_clusters")(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("cluster_id"))
    def md5h(s: String): Long =
      BigInt(java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
        .take(15), 16).toLong % graft.functions.ExactCols.P
    def bucket(s: String): Long = md5h(s) % 100
    def subsetOf(h: Long): String =
      if (h < 80) "train" else if (h < 90) "valid" else "test"
    // cluster-keyed assignment: every cluster lands in exactly one subset
    val byCluster = cl.groupBy(_._2).map { case (cid, ms) =>
      cid -> ms.map(m => subsetOf(bucket(s"split:$cid"))).distinct
    }
    assert(byCluster.values.forall(_.size == 1))
    // and the audit's totals reconcile with the direct recompute
    val audit = SparkEntry.queries("q93_cluster_split")(spark, sf).collect()
      .map(r => r.getAs[String]("subset") ->
        ((r.getAs[Long]("n_clusters"), r.getAs[Long]("n_docs")))).toMap
    val expect = cl.groupBy { case (_, cid) => subsetOf(bucket(s"split:$cid")) }
      .map { case (sub, ms) => sub -> ((ms.map(_._2).distinct.length.toLong,
        ms.length.toLong)) }
    assert(audit == expect)
    assert(audit.keySet == Set("train", "valid", "test"), "a subset is empty")
    // the NAIVE doc-hash split does straddle at least one multi-doc
    // cluster on this corpus — the leak this operator exists to close
    val straddled = cl.groupBy(_._2).values.exists { ms =>
      ms.length > 1 &&
        ms.map(m => subsetOf(bucket(s"split:${m._1}"))).distinct.size > 1
    }
    assert(straddled, "doc-hash split did not straddle — corpus no longer adversarial")
  }

  test("q105: calibration covers q24's surface; clones match on all components") {
    val sf = "/root/testdata/sf0.001"
    val docs = Tables.t(spark, sf, "documents")
    val cal = Dedup.minhashCalibration(docs)
    noNestedLoop(cal)
    val rows = cal.collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      val nm = r.getAs[Long]("n_match")
      val est = r.getAs[Double]("est_jaccard")
      val j = r.getAs[Double]("jaccard")
      assert(nm >= 0 && nm <= 8)
      assert(est == nm / 8.0, "estimate is not k/numHashes")
      assert(j >= 0.0 && j <= 1.0)
      // identical shingle sets ⇒ identical signatures (j=1 ⇒ k=8)
      if (j == 1.0) assert(nm == 8L, s"clone pair with n_match=$nm")
    }
    // every thresholded q24 pair appears in the calibration surface
    // (same candidates, before the jaccard filter)
    val calPairs = rows.map(r =>
      (r.getAs[Long]("a_id"), r.getAs[Long]("b_id"))).toSet
    val kept = Dedup.nearDupPairs(docs).collect()
      .map(r => (r.getAs[Long]("a_id"), r.getAs[Long]("b_id"))).toSet
    assert(kept.subsetOf(calPairs),
      s"q24 pairs missing from calibration: ${kept -- calPairs}")
  }

  test("q105: calibration is clone-collapsed — replication leaves the surface unchanged") {
    import spark.implicits._
    val sf = "/root/testdata/sf0.001"
    val docs = Tables.t(spark, sf, "documents").select("doc_id", "text")
    val base = Dedup.minhashCalibration(docs).collect()
      .map(_.toString).sorted.toSeq
    // 3× clone replication with HIGHER ids: reps keep the original
    // ids, so the distinct-text pair surface is bit-identical
    val cloned = docs.unionByName(
        docs.select((org.apache.spark.sql.functions.col("doc_id") + 100000L)
          .as("doc_id"), org.apache.spark.sql.functions.col("text")))
      .unionByName(docs.select(
        (org.apache.spark.sql.functions.col("doc_id") + 200000L).as("doc_id"),
        org.apache.spark.sql.functions.col("text")))
    val rep = Dedup.minhashCalibration(cloned).collect()
      .map(_.toString).sorted.toSeq
    assert(rep == base, "clone replication changed the calibration surface")
  }

  test("q107: sweep is monotone and its t=500 row equals the q24 surface") {
    val sf = "/root/testdata/sf0.001"
    val docs = Tables.t(spark, sf, "documents")
    val rows = Dedup.dedupThresholdSweep(docs)
      .orderBy(org.apache.spark.sql.functions.col("threshold")).collect()
    assert(rows.map(_.getAs[Long]("threshold")).toSeq ==
      Seq(300L, 400L, 500L, 600L, 700L, 800L, 900L))
    val nPairs = rows.map(_.getAs[Long]("n_pairs"))
    val nDocs = rows.map(_.getAs[Long]("n_docs"))
    assert(nPairs.zip(nPairs.tail).forall { case (a, b) => a >= b },
      s"pairs not monotone: ${nPairs.mkString(",")}")
    assert(nDocs.zip(nDocs.tail).forall { case (a, b) => a >= b },
      s"docs not monotone: ${nDocs.mkString(",")}")
    assert(nPairs.head > nPairs.last, "sweep is flat — no tuning signal")
    // integer keep test at t=500 ≡ q24's jaccard ≥ 0.5 surface
    // (texts are distinct at this sf, so expansion is the identity)
    val q24 = Dedup.nearDupPairs(docs).count()
    assert(nPairs(2) == q24, s"t=500 row ${nPairs(2)} != q24 $q24")
  }

  test("q108: recall audit — multiprobe dominates single-bucket per query") {
    val sf = "/root/testdata/sf0.001"
    val rows = Similarity.annRecallAudit(
      Tables.t(spark, sf, "embeddings")).collect()
    val byQ = rows.groupBy(_.getAs[Long]("query_id"))
    assert(byQ.nonEmpty)
    var sumL = 0L; var sumM = 0L
    for ((q, rs) <- byQ) {
      val m = rs.map(r => r.getAs[String]("method") ->
        r.getAs[Long]("n_hit")).toMap
      assert(m.keySet == Set("lsh", "multiprobe"), s"query $q methods $m")
      assert(m.values.forall(h => h >= 0 && h <= 3))
      // probe 2 searches a superset of probe 1's buckets → per-query
      // dominance is structural, not statistical
      assert(m("multiprobe") >= m("lsh"), s"query $q: $m")
      for (r <- rs)
        assert(r.getAs[Double]("recall") == r.getAs[Long]("n_hit") / 3.0)
      sumL += m("lsh"); sumM += m("multiprobe")
    }
    assert(sumM > sumL, "second probe bought no recall — fixture signal gone")
  }

  test("q112: int8 recall audit — exact rationals, high-but-measured recall") {
    val sf = "/root/testdata/sf0.001"
    val rows = Similarity.int8RecallAudit(
      Tables.t(spark, sf, "embeddings")).collect()
    assert(rows.nonEmpty)
    assert(rows.map(_.getAs[Long]("query_id")).distinct.length == rows.length)
    for (r <- rows) {
      assert(r.getAs[String]("method") == "int8")
      val h = r.getAs[Long]("n_hit")
      assert(h >= 0 && h <= 3)
      assert(r.getAs[Double]("recall") == h / 3.0)
    }
    // 127-level symmetric quantization preserves most of the exact
    // top-3 on this corpus — if recall collapses, the quantizer (or
    // its sign handling) broke; if it is a hard 100% everywhere the
    // audit would be vacuous as a diagnostic, but that is data-
    // dependent, so only the floor is pinned
    val total = rows.map(_.getAs[Long]("n_hit")).sum
    assert(total * 2 >= rows.length * 3L,
      s"int8 recall collapsed: $total hits over ${rows.length} queries")
  }

  test("q113: kNN label audit — counts close, majority is a neighbor label, repartition-pure") {
    val sf = "/root/testdata/sf0.001"
    val emb = Tables.t(spark, sf, "embeddings")
    import org.apache.spark.sql.functions.col
    val rows = Similarity.knnLabelAudit(emb).collect()
    val nQ = emb.filter(col("vec_id") % 10 === 0).count()
    assert(rows.length == nQ && nQ > 0)
    val labels = emb.select(col("label").cast("long")).distinct()
      .collect().map(_.getLong(0)).toSet
    for (r <- rows) {
      val same = r.getAs[Long]("n_same")
      assert(same >= 0 && same <= 3)
      assert(labels.contains(r.getAs[Long]("maj_label")))
      assert(r.getAs[Boolean]("agree") ==
        (r.getAs[Long]("maj_label") == r.getAs[Long]("own_label")))
      // if the query's own label holds a strict majority of the 3,
      // it must BE the majority label (tie-breaks can't override it)
      if (same >= 2)
        assert(r.getAs[Long]("maj_label") == r.getAs[Long]("own_label"))
    }
    val again = Similarity.knnLabelAudit(emb.repartition(7))
      .orderBy(col("query_id")).collect()
    assert(rows.sortBy(_.getAs[Long]("query_id")).map(_.toString).toSeq ==
      again.map(_.toString).toSeq)
  }

  test("q122: centroid HALF_UP-exact vs JVM replay; planted outlier flagged; pure") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // label 0: three tight vectors + one antipodal plant; label 1:
    // negative per-dim sums at odd n — the HALF_UP sign corner
    val data = Seq(
      (0L, 0, Seq(0.5f, 0.5f, 0.5f, 0.5f)),
      (1L, 0, Seq(0.5f, 0.5f, 0.5f, 0.5f)),
      (2L, 0, Seq(0.5f, 0.5f, 0.5f, 0.5f)),
      (3L, 0, Seq(-0.5f, -0.5f, -0.5f, -0.5f)),
      (4L, 1, Seq(-0.1f, -0.3f, 0.7f, -0.11f)),
      (5L, 1, Seq(-0.2f, -0.3f, 0.1f, -0.23f)),
      (6L, 1, Seq(-0.4f, 0.3f, 0.2f, 0.17f)))
    val vecs = data.toDF("vec_id", "label", "embedding")
    val rows = Similarity.centroidOutlierAudit(vecs, dim = 4)
      .orderBy(col("vec_id")).collect()
    assert(rows.length == data.length)
    // independent JVM replay: int-scale, HALF_UP centroid, exact
    // distances, 20·d²·n > 21·Σd² flag
    val iv = data.map { case (id, lab, e) =>
      (id, lab, e.map(x => Math.round(x.toDouble * 1e6)).toArray)
    }
    val byLab = iv.groupBy(_._2)
    val cent = byLab.map { case (lab, vs) =>
      val n = vs.size.toLong
      lab -> (0 until 4).map { i =>
        val s = vs.map(_._3(i)).sum
        new java.math.BigDecimal(s).divide(new java.math.BigDecimal(n), 0,
          java.math.RoundingMode.HALF_UP).longValueExact()
      }.toArray
    }
    val d2 = iv.map { case (id, lab, v) =>
      id -> v.zip(cent(lab)).map { case (x, c) => (x - c) * (x - c) }.sum
    }.toMap
    val sums = byLab.map { case (lab, vs) =>
      lab -> (vs.size.toLong, vs.map(x => BigInt(d2(x._1))).sum)
    }
    for (r <- rows) {
      val id = r.getAs[Long]("vec_id")
      val lab = iv.find(_._1 == id).get._2
      assert(r.getAs[Long]("dist2") == d2(id), s"dist2 mismatch for $id")
      val (n, sd) = sums(lab)
      assert(r.getAs[Boolean]("is_outlier") ==
        (BigInt(20) * d2(id) * n > BigInt(21) * sd))
    }
    val flagged = rows.filter(_.getAs[Boolean]("is_outlier"))
      .map(_.getAs[Long]("vec_id")).toSet
    assert(flagged.contains(3L) && !flagged.exists(Set(0L, 1L, 2L)))
    // repartition purity
    val again = Similarity.centroidOutlierAudit(vecs.repartition(5), dim = 4)
      .orderBy(col("vec_id")).collect()
    assert(rows.map(_.toString).toSeq == again.map(_.toString).toSeq)
  }

  test("q136: PQ recall — exactly-representable corpus hits 3/3; real corpus measured; pure") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // hand corpus where every vector IS a codeword combination: the 16
    // seeds (ids 0..15) plus exact copies of seeds 3 and 7 at the
    // query ids 100/200 — quantization error is identically zero, so
    // ADC estimated distances EQUAL exact distances and PQ must
    // recover the exact top-3 for every query (recall 1 is structural
    // here, not statistical)
    val base = (0 until 16).map { i =>
      (i.toLong, (0 until 8).map(j => ((i * 8 + j) % 7).toFloat * 0.25f).toSeq)
    }
    val data = base ++ Seq((100L, base(3)._2), (200L, base(7)._2))
    val vecs = data.toDF("vec_id", "embedding")
    val rows = Similarity.pqRecallAudit(vecs, dim = 8, m = 4)
      .orderBy(col("query_id")).collect()
    assert(rows.map(_.getAs[Long]("query_id")).toSeq == Seq(0L, 100L, 200L))
    rows.foreach { r =>
      assert(r.getAs[Long]("n_hit") == 3L,
        s"zero-quantization-error corpus must have full recall: $r")
      assert(r.getAs[Double]("recall") == 1.0)
    }
    // real corpus: one row per id-bounded query, hits in [0,3], exact
    // dyadic recall — low recall is the honest isotropic-data verdict
    val sf = "/root/testdata/sf0.001"
    val emb = Tables.t(spark, sf, "embeddings")
    val real = Similarity.pqRecallAudit(emb).collect()
    val nQ = emb.filter(col("vec_id") % 100 === 0 && col("vec_id") < 800).count()
    assert(real.length == nQ && nQ > 0)
    real.foreach { r =>
      val h = r.getAs[Long]("n_hit")
      assert(h >= 0 && h <= 3)
      assert(r.getAs[String]("method") == "pq_adc")
      assert(r.getAs[Double]("recall") == h / 3.0)
    }
    // repartition purity
    val again = Similarity.pqRecallAudit(emb.repartition(7))
      .orderBy(col("query_id")).collect()
    assert(real.sortBy(_.getAs[Long]("query_id")).map(_.toString).toSeq ==
      again.map(_.toString).toSeq)
  }

  test("q140: fuzzy pairs ≡ brute JVM replay (blocking lossless); clone mass; pure") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    def lev(a: String, b: String): Int = {
      val dp = Array.tabulate(a.length + 1)(i => Array.tabulate(b.length + 1) {
        j => if (i == 0) j else if (j == 0) i else 0 })
      for (i <- 1 to a.length; j <- 1 to b.length)
        dp(i)(j) = math.min(math.min(dp(i - 1)(j) + 1, dp(i)(j - 1) + 1),
          dp(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      dp(a.length)(b.length)
    }
    // length spread crosses bucket boundaries in both directions;
    // clones carry instance mass
    val names = Seq("abc", "abc", "abd", "xyz", "abcdef", "abcd",
      "a", "ab", "abcdefgh", "zzzzzzzz", "red widget", "red widgets",
      "red widgets")
    val df = names.toDF("p_name")
    val rows = Dedup.fuzzyNamePairs(df, "p_name").collect()
      .map(r => (r.getAs[String]("na"), r.getAs[String]("nb")) -> r).toMap
    // brute replay over distinct names: blocking must lose nothing
    val cnt = names.groupBy(identity).map { case (n, xs) => n -> xs.size.toLong }
    val distinctN = cnt.keys.toSeq.sorted
    val brute = (for {
      a <- distinctN; b <- distinctN if a < b
      d = lev(a, b) if d <= 3
    } yield (a, b) -> d).toMap
    assert(rows.keySet == brute.keySet,
      s"blocked surface ≠ brute: ${rows.keySet} vs ${brute.keySet}")
    for (((a, b), r) <- rows) {
      assert(r.getAs[Long]("d") == brute((a, b)).toLong)
      assert(r.getAs[Long]("n_a") == cnt(a) && r.getAs[Long]("n_b") == cnt(b))
      assert(r.getAs[Long]("inst") == cnt(a) * cnt(b))
    }
    // the ER motivation case: a word-level near-key invisible to
    // token-granular shingles, caught at edit granularity
    assert(rows.contains(("red widget", "red widgets")))
    assert(rows(("red widget", "red widgets")).getAs[Long]("inst") == 2L)
    // repartition purity
    val again = Dedup.fuzzyNamePairs(df.repartition(5), "p_name")
      .orderBy(col("na"), col("nb")).collect().map(_.toString).toSeq
    assert(rows.values.map(_.toString).toSeq.sorted == again.sorted)
  }

  test("q123: route matrix diagonal ≡ route pair counts; intersections bounded; pure") {
    import org.apache.spark.sql.functions.col
    val sf = "/root/testdata/sf0.001"
    val docs = Tables.t(spark, sf, "documents")
    val rows = Dedup.dedupRouteMatrix(docs).collect()
      .map(r => (r.getAs[String]("route_a"), r.getAs[String]("route_b")) ->
        r.getAs[Long]("n_common")).toMap
    assert(rows.size == 6) // full upper triangle, zero rows included
    // diagonal cells ARE the route surfaces
    assert(rows(("minhash", "minhash")) == Dedup.nearDupPairs(docs).count())
    assert(rows(("simhash", "simhash")) == Dedup.simhashPairs(docs).count())
    assert(rows(("jaccard", "jaccard")) ==
      Dedup.ngramJaccardPairs(docs, 0.3).count())
    // an intersection can't exceed either of its routes
    for (((a, b), n) <- rows if a != b) {
      assert(n <= rows((a, a)) && n <= rows((b, b)),
        s"intersection ($a,$b)=$n exceeds a diagonal")
    }
    // calibration fact the matrix exists to report: minhash agrees
    // with exact jaccard on this corpus's planted pairs
    assert(rows(("jaccard", "minhash")) > 0)
    val again = Dedup.dedupRouteMatrix(docs.repartition(7))
      .orderBy(col("route_a"), col("route_b")).collect()
    assert(rows.toSeq.sortBy(_._1).map(_.toString) ==
      again.map(r => ((r.getAs[String]("route_a"), r.getAs[String]("route_b")) ->
        r.getAs[Long]("n_common")).toString).toSeq)
  }

  test("q125: soft-dedup weights — labels ≡ q56, family mass ≈ 1e6 within div remainder") {
    import org.apache.spark.sql.functions.col
    val sf = "/root/testdata/sf0.001"
    val docs = Tables.t(spark, sf, "documents")
    val rows = Dedup.softDedupWeights(docs).collect()
    assert(rows.length == docs.count())
    // labels are exactly the q56 clustering
    val lab = Dedup.clusters(docs).select("doc_id", "cluster_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      assert(r.getAs[Long]("cluster_id") == lab(r.getAs[Long]("doc_id")))
      assert(r.getAs[Long]("weight_ppm") ==
        1000000L / r.getAs[Long]("cluster_size"))
    }
    // soft-dedup's defining invariant: each family contributes one
    // doc's worth (10⁶ ppm) up to the integer-div remainder, so the
    // effective corpus size is the cluster count
    rows.groupBy(_.getAs[Long]("cluster_id")).foreach { case (_, members) =>
      val size = members.head.getAs[Long]("cluster_size")
      val mass = members.map(_.getAs[Long]("weight_ppm")).sum
      assert(members.length.toLong == size)
      assert(mass <= 1000000L && 1000000L - mass < size)
    }
    // the corpus HAS multi-doc families (the planted pairs) — the
    // weights are not a constant-1e6 triviality
    assert(rows.exists(_.getAs[Long]("cluster_size") > 1L))
  }

  test("q115: cross-source matrix accounts for every near-dup pair, normalized and pure") {
    import org.apache.spark.sql.functions.col
    val sf = "/root/testdata/sf0.001"
    val docs = Tables.t(spark, sf, "documents")
    val rows = Dedup.crossSourceDupMatrix(docs).collect()
    assert(rows.nonEmpty)
    // every pair lands in exactly one cell: Σ n_pairs ≡ the q24 surface
    val total = rows.map(_.getAs[Long]("n_pairs")).sum
    assert(total == Dedup.nearDupPairs(docs).count(), "pair mass leaked")
    // unordered normalization: src_a ≤ src_b lexicographically
    for (r <- rows)
      assert(r.getAs[String]("src_a") <= r.getAs[String]("src_b"))
    // membership checksum survives repartitioning
    val again = Dedup.crossSourceDupMatrix(docs.repartition(7))
      .orderBy(col("src_a"), col("src_b")).collect()
    assert(rows.sortBy(r => (r.getAs[String]("src_a"), r.getAs[String]("src_b")))
      .map(_.toString).toSeq == again.map(_.toString).toSeq)
  }

  test("q116: audit winners ≡ deduplicateKeepBest; accounting and verdict close") {
    import org.apache.spark.sql.functions.{col, concat, lit}
    import graft.functions.ExactCols.hmod
    val sf = "/root/testdata/sf0.001"
    val docs = Tables.t(spark, sf, "documents")
    val w = spark.range(512).select(col("id").as("bucket"),
      (hmod(concat(lit("w:"), col("id").cast("string"))) % 2001L - 1000L).as("w"))
    val rows = Dedup.keepBestQualityAudit(docs, w).collect()
    assert(rows.nonEmpty, "no multi-doc clusters — fixture signal gone")
    val kb = Dedup.deduplicateKeepBest(docs).collect()
      .map(r => r.getAs[Long]("cluster_id") -> r.getAs[Long]("doc_id")).toMap
    for (r <- rows) {
      // the single-pass argmax must select exactly the doc the full
      // keep-best dedup keeps for that cluster
      assert(kb(r.getAs[Long]("cluster_id")) == r.getAs[Long]("kept_doc"))
      assert(r.getAs[Long]("n_docs") == r.getAs[Long]("n_removed") + 1)
      assert(r.getAs[Long]("kept_ntok") > 0 && r.getAs[Long]("removed_ntok") > 0)
      assert(r.getAs[Boolean]("kept_better") ==
        (r.getAs[Long]("kept_score") * r.getAs[Long]("removed_ntok") >=
          r.getAs[Long]("removed_score") * r.getAs[Long]("kept_ntok")))
    }
  }

  test("q117: image phash pairs recover the planted near-dups; mega-bucket capped") {
    import org.apache.spark.sql.functions.col
    val sf = "/root/testdata/sf0.001"
    val docs = Tables.t(spark, sf, "documents")
    val pairs = graft.queries.Media.imageNearDupPairs(docs).collect()
      .map(r => (r.getAs[Long]("a_id"), r.getAs[Long]("b_id"))).toSet
    // every exact-jaccard near-dup pair (the planted ground truth)
    // must land within hamming 3 of the codec round trip — measured
    // separation is <=1 vs >=17, so this is a real margin, not luck
    val truth = Dedup.nearDupPairs(docs).collect()
      .map(r => (r.getAs[Long]("a_id"), r.getAs[Long]("b_id"))).toSet
    assert(truth.nonEmpty && truth.subsetOf(pairs),
      s"missed planted pairs: ${truth -- pairs}")
    // an all-clones corpus collides every block into one mega-bucket;
    // the cap must bound the pair count at C(cap, 2)
    val capped = graft.queries.Media
      .imageNearDupPairs(identicalDocs(300), maxBucketSize = 10).count()
    assert(capped == 45L, s"cap leaked: $capped pairs")
    // and the audit is repartition-pure
    val again = graft.queries.Media.imageNearDupPairs(docs.repartition(7))
      .collect().map(r => (r.getAs[Long]("a_id"), r.getAs[Long]("b_id"))).toSet
    assert(again == pairs)
    // clone collapse expands bit-exactly: doubling the corpus turns
    // each base pair into 4 cross copies (hamming verbatim) and adds
    // one hamming-0 intra pair per doc (the cosinePairs contract)
    import org.apache.spark.sql.functions.col
    val shift = 100000L
    val cloned = docs.select(col("doc_id"), col("text"))
      .union(docs.select((col("doc_id") + shift).as("doc_id"), col("text")))
    val rep = graft.queries.Media.imageNearDupPairs(cloned).collect()
      .map(r => (r.getAs[Long]("a_id"), r.getAs[Long]("b_id"),
        r.getAs[Long]("hamming")))
    val nDocs = docs.count()
    val basePairs = graft.queries.Media.imageNearDupPairs(docs).collect()
      .map(r => (r.getAs[Long]("a_id"), r.getAs[Long]("b_id"),
        r.getAs[Long]("hamming"))).toSet
    assert(rep.length == 4 * basePairs.size + nDocs,
      s"${rep.length} != 4*${basePairs.size} cross + $nDocs intra")
    val crossBack = rep.filter { case (a, b, _) => b % shift != a }
      .map { case (a, b, h) =>
        (math.min(a % shift, b % shift), math.max(a % shift, b % shift), h) }.toSet
    assert(crossBack == basePairs)
  }

  test("q106: histogram identities reconcile with the cluster table") {
    val sf = "/root/testdata/sf0.001"
    val hist = SparkEntry.queries("q106_cluster_size_hist")(
      spark, sf).collect()
    val cl = SparkEntry.queries("q56_dup_clusters")(spark, sf).collect()
      .map(_.getAs[Long]("cluster_id"))
    assert(hist.map(_.getAs[Long]("n_docs")).sum == cl.length.toLong)
    for (r <- hist)
      assert(r.getAs[Long]("n_docs") ==
        r.getAs[Long]("cluster_size") * r.getAs[Long]("n_clusters"))
    val bySize = cl.groupBy(identity).values.groupBy(_.size)
      .map { case (sz, gs) => sz.toLong -> gs.size.toLong }
    assert(hist.map(r => r.getAs[Long]("cluster_size") ->
      r.getAs[Long]("n_clusters")).toMap == bySize)
    // the corpus has real multi-doc families — the report is not
    // degenerate all-singletons
    assert(hist.exists(r => r.getAs[Long]("cluster_size") > 1))
  }

  test("dedup∘sample order matters exactly as q226 models it") {
    import spark.implicits._
    // two exact clones; the sample keeps only the HIGHER id. Route A
    // (dedup→sample) elects doc 1 and then samples it out — the text
    // vanishes; route B (sample→dedup) re-elects doc 2 inside the
    // sample — the text survives. Plus one unsampled singleton and
    // one sampled singleton as controls.
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "alpha beta gamma delta epsilon zeta"),
      (3L, "one two three four five six"),
      (4L, "seven eight nine ten eleven twelve")
    ).toDF("doc_id", "text")
    val sample = col("doc_id").isin(2L, 3L)
    val a = Dedup.deduplicate(docs).filter(sample)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val b = Dedup.deduplicate(docs.filter(sample))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(a == Set(3L))        // doc 1 won dedup, then sampled out
    assert(b == Set(2L, 3L))    // doc 2 re-elected inside the sample
  }
}
