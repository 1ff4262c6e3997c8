package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into `private[sql]` Column↔Expression conversion (the
  * supported route for third-party Catalyst expressions is a
  * FunctionRegistry extension; for a library-internal kernel this
  * thin shim is equivalent and keeps the expression in our own
  * namespace). */
object Shim {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Like [[expression]], but eagerly converts every lazy
    * ColumnNodeExpression wrapper to its catalyst form. The lazy
    * wrapper holds the sql.internal column node, which is NOT
    * java-serializable — an expression captured in a task closure
    * (e.g. by a custom SparkPlan) must be fully converted first. */
  def expressionEager(c: Column): Expression =
    org.apache.spark.sql.classic.GraftClassicShim.eager(
      ExpressionUtils.expression(c))

  /** DataFrame from a logical plan (Dataset.ofRows is private[sql]). */
  def ofRows(spark: org.apache.spark.sql.SparkSession,
             plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)
}
