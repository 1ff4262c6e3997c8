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
  * symmetrize the graph first (the q138 gate does).
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
      .cut() // referenced every round + seeds r0
    var r = deg.select(col("src").as("node"), lit(1000000L).as("r"))
    for (_ <- 1 to rounds) {
      r = ed.join(deg, "src")
        .join(r, col("src") === col("node"))
        .select(col("dst"), expr("r div deg").as("c"))
        .groupBy(col("dst"))
        .agg((lit(basePpm) +
          expr(s"(CAST($dampingPpm AS DECIMAL(38,0)) * sum(CAST(c AS DECIMAL(38,0)))) div 1000000")
            .cast("long")).as("r"))
        .select(col("dst").as("node"), col("r"))
        .cut() // the iterative-loop lineage rule
    }
    r
  }
}
