package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Checkpoints._

/** Fixed-iteration integer PageRank (Brin & Page 1998) — graph
  * centrality over an edge table, the network-analysis operator of
  * the reference's log-analytics domain (who are the hub hosts /
  * accounts in a communication graph), exact enough to gate against
  * a DuckDB oracle that replays every round.
  *
  * Arithmetic is the q77/q97 fixed-trajectory doctrine: ranks live in
  * int64 micro-units (r₀ = 10⁶ per node), one round is
  *
  *   r'(v) = 150000 + ⌊ d · Σ_{u→v} ⌊r(u)/deg(u)⌋ / 10⁶ ⌋,  d = 850000
  *
  * — contributions are int64 floor divisions, the damped sum goes
  * through DECIMAL(38,0) (DuckDB: HUGEINT) so no product can overflow
  * at any graph size, and the floor result is back in int64. Every
  * round is bit-identical on both engines, so a 3-round trajectory is
  * gate-able exactly (the oracle unrolls the rounds as chained CTEs —
  * no recursion needed for a fixed count).
  *
  * 100 TB shape: one round = one equi-join of the edge table with the
  * (node, rank) table plus one map-side-combined groupBy on dst —
  * the standard distributed PageRank shuffle pattern; the degree
  * table is computed once and cut(); the rank table is cut() per
  * round (the ConnectedComponents lineage rule — lineage doubles per
  * iteration otherwise). Rank mass per node is bounded by n·10⁶, far
  * inside DECIMAL(38,0) at any conceivable node count. Hub in-degree
  * skew lands in the dst groupBy — a map-side-combined aggregate, not
  * a window, so AQE's skew handling and partial aggregation apply.
  *
  * Nodes are strings; the caller supplies a DIRECTED edge table
  * (src, dst), already deduplicated. Undirected graphs pass both
  * directions. Nodes with no out-edges (dangling) are excluded by
  * construction — callers that need dangling-mass redistribution
  * symmetrize the graph first (the q138 gate does). The rank universe
  * is the out-edge node set (deg's keys) EVERY round: an in-degree-0
  * source keeps its base mass r = basePpm via the left join back, so
  * its out-edges keep contributing in later rounds (standard PageRank
  * semantics on general directed graphs, not just symmetrized ones).
  */
object PageRank {

  private val dec = DecimalType(38, 0)

  /** (node, r) after `rounds` damped iterations; r in micro-units. */
  def ranks(edges: DataFrame, rounds: Int = 3,
            dampingPpm: Long = 850000L): DataFrame = {
    require(rounds >= 1 && dampingPpm >= 0 && dampingPpm <= 1000000L,
      s"pagerank params out of range: rounds=$rounds damping=$dampingPpm")
    val basePpm = 1000000L - dampingPpm
    val ed = edges.select(col("src"), col("dst"))
      .cut() // referenced every round
    val deg = ed.groupBy(col("src")).agg(count(lit(1)).as("deg"))
      .cut() // referenced every round + seeds r0 + the node universe
    val nodes = deg.select(col("src").as("node"))
    var r = nodes.select(col("node"), lit(1000000L).as("r"))
    for (_ <- 1 to rounds) {
      val contrib = ed.join(deg, "src")
        .join(r, col("src") === col("node"))
        .select(col("dst"), expr("r div deg").as("c"))
        .groupBy(col("dst"))
        .agg(expr(s"(CAST($dampingPpm AS DECIMAL(38,0)) * sum(CAST(c AS DECIMAL(38,0)))) div 1000000")
          .cast("long").as("rc"))
        .select(col("dst").as("node"), col("rc"))
      // left-join the full node universe back: a node receiving no
      // contributions this round (in-degree 0 within the universe)
      // keeps r = basePpm instead of silently dropping out
      r = nodes.join(contrib, Seq("node"), "left")
        .select(col("node"),
          (coalesce(col("rc"), lit(0L)) + lit(basePpm)).as("r"))
        .cut() // the iterative-loop lineage rule
    }
    r
  }

  /** Personalized PageRank / random-walk-with-restart (Haveliwala
    * 2002; the recommendation primitive: proximity to a SEED set
    * instead of global centrality) — [[ranks]] with the teleport
    * vector concentrated on `seeds`: r₀ = 10⁶ on seeds and 0
    * elsewhere, and each round's base mass (1−d) lands only on
    * seeds:
    *
    *   r'(v) = [v ∈ S]·basePpm + ⌊ d · Σ_{u→v} ⌊r(u)/deg(u)⌋ / 10⁶ ⌋
    *
    * Same exact int64/DECIMAL floor arithmetic as [[ranks]], so a
    * fixed trajectory is gate-able bit-for-bit against chained CTEs.
    *
    * 100 TB shape: identical per-round shuffle pattern to [[ranks]],
    * plus the PPR-specific win — zero-mass sources are filtered out
    * of the contribution join (a 0 contributes 0; dropping it is
    * exact), so early rounds touch only the expanding FRONTIER
    * around the seeds instead of the whole graph. `seeds` is a
    * (node) table; seed membership joins once into the cut() node
    * universe. */
  def personalizedRanks(edges: DataFrame, seeds: DataFrame,
                        rounds: Int = 3,
                        dampingPpm: Long = 850000L): DataFrame = {
    require(rounds >= 1 && dampingPpm >= 0 && dampingPpm <= 1000000L,
      s"ppr params out of range: rounds=$rounds damping=$dampingPpm")
    val basePpm = 1000000L - dampingPpm
    val ed = edges.select(col("src"), col("dst"))
      .cut() // referenced every round
    val deg = ed.groupBy(col("src")).agg(count(lit(1)).as("deg"))
      .cut() // referenced every round + the node universe
    val nodes = deg.select(col("src").as("node"))
      .join(seeds.select(col("node"), lit(1L).as("is_seed")),
        Seq("node"), "left")
      .select(col("node"), coalesce(col("is_seed"), lit(0L)).as("is_seed"))
      .cut() // referenced every round
    var r = nodes.select(col("node"), col("is_seed"),
      (col("is_seed") * 1000000L).as("r"))
    for (_ <- 1 to rounds) {
      val contrib = ed.join(deg, "src")
        .join(r.filter(col("r") > 0L).select(col("node"), col("r")),
          col("src") === col("node"))
        .select(col("dst"), expr("r div deg").as("c"))
        .groupBy(col("dst"))
        .agg(expr(s"(CAST($dampingPpm AS DECIMAL(38,0)) * sum(CAST(c AS DECIMAL(38,0)))) div 1000000")
          .cast("long").as("rc"))
        .select(col("dst").as("node"), col("rc"))
      r = nodes.join(contrib, Seq("node"), "left")
        .select(col("node"), col("is_seed"),
          (coalesce(col("rc"), lit(0L)) + col("is_seed") * lit(basePpm))
            .as("r"))
        .cut() // the iterative-loop lineage rule
    }
    r.select(col("node"), col("r"))
  }

  /** HITS hubs & authorities (Kleinberg 1999) over a DIRECTED
    * bipartite edge table (src = hub side, dst = authority side) —
    * the mutually-recursive counterpart of [[ranks]]: h(u) = Σ a(v)
    * over u's out-edges, a(v) = Σ h(u) over v's in-edges, each
    * half-round max-normalized back to 10⁶ micro-units so the
    * trajectory stays in bounded integers (normalizer = ⌊10⁶·x/max⌋,
    * the max being ONE scalar to the driver per half-round — the q62
    * contract, 2·rounds scalars total; products ride DECIMAL(38,0)/
    * HUGEINT, so no overflow at any degree). Every step is floor
    * arithmetic → a chained-CTE oracle replays the whole trajectory.
    *
    * 100 TB shape: one equi-join + map-side-combined groupBy per
    * half-round (the PageRank shuffle pattern); hub/authority tables
    * cut() per round (the iterative-loop lineage rule). Returns
    * (node, role['hub'|'authority'], score). */
  def hits(edges: DataFrame, rounds: Int = 2): DataFrame = {
    require(rounds >= 1, s"hits rounds out of range: $rounds")
    val ed = edges.select(col("src"), col("dst")).cut()
    def normalized(scores: DataFrame): DataFrame = {
      // ONE action per half-round (the r12 minLabel pattern): cut the
      // RAW score table lazily and let the max aggregate both
      // materialize the checkpoint and return the normalizer scalar —
      // the old shape ran the max on the UNCUT join+groupBy subtree
      // and then lazily cut a projection of the SAME subtree, so every
      // half-round's join+groupBy evaluated twice (once for the max,
      // once when the next action materialized the cut)
      val raw = scores.cut()
      // empty edge table → the max aggregate returns one NULL row;
      // clamp to ≥1 so the normalizer division is always defined
      // (the downstream tables are empty anyway in that case)
      val row = raw.agg(max(col("s"))).head
      val m = if (row.isNullAt(0)) 1L else math.max(1L, row.getLong(0))
      // lazy projection over the materialized RDD — re-referencing it
      // re-runs only the division, never the join+groupBy
      raw.select(col("node"),
        expr(s"(CAST(1000000 AS DECIMAL(38,0)) * s) div ${m}L")
          .cast("long").as("s"))
    }
    var a = ed.select(col("dst").as("node")).distinct()
      .select(col("node"), lit(1000000L).as("s"))
      .cut()
    var h: DataFrame = null
    for (_ <- 1 to rounds) {
      h = normalized(ed.join(a, col("dst") === col("node"))
        .groupBy(col("src"))
        .agg(sum(col("s").cast(dec)).cast("long").as("s"))
        .select(col("src").as("node"), col("s")))
      a = normalized(ed.join(h, col("src") === col("node"))
        .groupBy(col("dst"))
        .agg(sum(col("s").cast(dec)).cast("long").as("s"))
        .select(col("dst").as("node"), col("s")))
    }
    h.select(col("node"), lit("hub").as("role"), col("s").as("score"))
      .unionByName(
        a.select(col("node"), lit("authority").as("role"), col("s").as("score")))
  }
}
