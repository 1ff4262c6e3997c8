package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over a pair table — the missing last step of
  * every dedup pipeline: near-dup PAIRS (q24/q26/q55 output) become
  * CLUSTERS, and "keep one per cluster" becomes a filter.
  *
  * Algorithm: iterative min-label propagation. Every vertex starts
  * labeled with its own id; each round every vertex takes the min of
  * its label and its neighbors' labels; converged when no label
  * drops. Each round is one shuffle (join on dst + groupBy src); the
  * driver only evaluates a scalar convergence count per round (the
  * same legitimate driver-loop shape as k-means — no data collects).
  * Rounds needed = component diameter, and dup clusters are
  * near-cliques (diameter ≤ 2-3), so this settles in a handful of
  * rounds even at 100 TB. For adversarial long-chain graphs the
  * large-star/small-star variant (Kiveris et al., "Connected
  * Components in MapReduce and Beyond") halves diameter per round —
  * same join/agg primitives, drop-in if ever needed.
  *
  * `localCheckpoint` cuts lineage each round: without it the plan
  * doubles per iteration and analysis cost explodes (the classic
  * iterative-Spark trap).
  */
object ConnectedComponents {

  /** Component label for every vertex: `id` → `cid` = min id reachable
    * through `edges` (undirected; `vertices` supplies singletons,
    * which label themselves).
    *
    * @param edges    two-column DataFrame (endpoints of one edge)
    * @param vertices one-column DataFrame of all vertex ids
    */
  def components(edges: DataFrame, vertices: DataFrame): DataFrame = {
    val Seq(ea, eb) = edges.columns.toSeq.take(2)
    val vid = vertices.columns.head
    val sym = edges.select(col(ea).as("src"), col(eb).as("dst"))
      .union(edges.select(col(eb).as("src"), col(ea).as("dst")))
      .localCheckpoint()
    var labels = vertices.select(col(vid).as("id"), col(vid).as("cid"))
      .localCheckpoint()
    var changed = 1L
    while (changed > 0) {
      val nbrMin = sym.join(labels, col("dst") === col("id"))
        .groupBy(col("src")).agg(min(col("cid")).as("ncid"))
      val updated = labels.join(nbrMin, col("id") === col("src"), "left")
        .select(col("id"), col("cid"),
          least(col("cid"), coalesce(col("ncid"), col("cid"))).as("next"))
        .localCheckpoint()
      changed = updated.filter(col("next") < col("cid")).count()
      labels = updated.select(col("id"), col("next").as("cid"))
    }
    labels
  }

  /** Dedup selector: one representative (min id) per component.
    * Returns the vertex table with `keep` = true on representatives —
    * `filter(col("keep"))` is the deduplicated corpus. */
  def representatives(edges: DataFrame, vertices: DataFrame): DataFrame =
    components(edges, vertices)
      .withColumn("keep", col("id") === col("cid"))
}
