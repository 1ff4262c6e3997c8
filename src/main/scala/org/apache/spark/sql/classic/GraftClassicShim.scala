package org.apache.spark.sql.classic

import org.apache.spark.sql.catalyst.expressions.Expression

/** private[classic] bridge: eagerly converts lazy ColumnNodeExpression
  * wrappers (which hold non-java-serializable sql.internal nodes) into
  * plain catalyst expressions, so they can be captured by task
  * closures of custom SparkPlans. */
object GraftClassicShim {
  def eager(e: Expression): Expression = e.transformUp {
    case cne: ColumnNodeExpression => ColumnNodeToExpressionConverter(cne.node)
  }
}
