package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Expression, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, UnaryExecNode}
import org.apache.spark.sql.graftshim.Shim

/** Per-key top-k as a first-class operator:
  * `TopKPerKey(keys, order, k, child)` ≡ per key, the first k rows by
  * `order` (ORDER BY … LIMIT k per group).
  *
  * Spark's composable formulation — `row_number().over(Window…)` +
  * `filter(rn <= k)` — must SORT every partition of every key before
  * it can number rows: at 100 TB that is a full shuffle + full sort
  * of the fact table to keep k rows per key. This operator plans as
  *
  *   TopKPerKeyExec(final)            — k per key, after shuffle
  *     +- ShuffleExchange(keys)       — carries ≤ k rows per key per
  *     +- TopKPerKeyExec(partial)        upstream partition, not the
  *          +- child                     full data
  *
  * with bounded heaps (O(n log k) per partition, O(k·|keys|) memory)
  * on both sides — the same partial/final contract as Spark's own
  * aggregation, i.e. the Metis combiner/reducer split
  * (metis/appbase.hh combine_function) applied to top-k, which the
  * reference only runs on final counts (mr_job.cc:74-107 print_top).
  *
  * Registered via [[TopKStrategy]] (injectable with
  * `GraftExtensions`/`experimental.extraStrategies`); the
  * [[TopK.perKey]] helper wires a DataFrame through the logical node.
  * Row emission order is unspecified (like any exchange) — sort the
  * result if presentation order matters.
  */
case class TopKPerKeyPlan(
    keys: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    child: LogicalPlan) extends UnaryNode {
  require(k > 0, "k must be positive")
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerKeyPlan =
    copy(child = newChild)
}

case class TopKPerKeyExec(
    keys: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    partial: Boolean,
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output
  override def outputPartitioning: Partitioning = child.outputPartitioning

  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) UnspecifiedDistribution :: Nil
    else ClusteredDistribution(keys) :: Nil

  override protected def doExecute(): RDD[InternalRow] = {
    val kLocal = k
    val orderLocal = order
    val keysLocal = keys
    val attrs = child.output
    child.execute().mapPartitions ({ it =>
      val ordering = RowOrdering.create(orderLocal, attrs)
      val keyProj = UnsafeProjection.create(keysLocal, attrs)
      // max-heap by sort order: head = current worst of the kept k,
      // evicted when a better (order-smaller) row arrives
      val heaps = scala.collection.mutable.LinkedHashMap
        .empty[UnsafeRow, scala.collection.mutable.PriorityQueue[InternalRow]]
      for (row <- it) {
        val heap = heaps.getOrElseUpdate(keyProj(row).copy(),
          scala.collection.mutable.PriorityQueue.empty(ordering))
        if (heap.size < kLocal) heap += row.copy()
        else if (ordering.compare(row, heap.head) < 0) {
          heap.dequeue(); heap += row.copy()
        }
      }
      heaps.valuesIterator.flatMap(_.iterator)
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerKeyExec =
    copy(child = newChild)
}

/** Plans TopKPerKeyPlan as partial → exchange → final. */
object TopKStrategy extends org.apache.spark.sql.execution.SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKeyPlan(keys, order, k, child) =>
      TopKPerKeyExec(keys, order, k, partial = false,
        TopKPerKeyExec(keys, order, k, partial = true, planLater(child))) :: Nil
    case _ => Nil
  }
}

object TopK {
  private def toSortOrder(c: Column): SortOrder = Shim.expressionEager(c) match {
    case so: SortOrder => so
    case e => SortOrder(e, Ascending)
  }

  /** Per-key top-k of `df` (first k rows per key by `order`). */
  def perKey(df: DataFrame, keys: Seq[Column], order: Seq[Column], k: Int): DataFrame = {
    val spark = df.sparkSession
    if (!spark.experimental.extraStrategies.contains(TopKStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ TopKStrategy
    Shim.ofRows(spark,
      TopKPerKeyPlan(keys.map(Shim.expressionEager), order.map(toSortOrder), k,
        df.queryExecution.analyzed))
  }
}
