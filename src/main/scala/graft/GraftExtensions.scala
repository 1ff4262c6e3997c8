package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

import graft.functions.{LongDot, LongSqDist, SortedIntersectCount, WordNGrams}

/** SQL surface for the library's native expressions, registered the
  * supported way: `SparkSession.builder().withExtensions(new
  * GraftExtensions)` (or
  * `spark.sql.extensions=graft.GraftExtensions`), after which
  * `long_dot`, `long_sq_dist`, and `word_ngrams` are callable from
  * `spark.sql(...)` alongside the DataFrame API
  * (graft.functions.VectorExprs / NGramExpr).
  *
  * `registerOn(spark)` injects the same functions into an already-
  * built session (extensions only apply at session construction). */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  import GraftExtensions._

  override def apply(e: SparkSessionExtensions): Unit = {
    functions.foreach { case (name, info, builder) =>
      e.injectFunction((FunctionIdentifier(name), info, builder))
    }
    e.injectPlannerStrategy(_ => graft.plans.TopKStrategy)
  }
}

object GraftExtensions {

  private def intLit(e: Expression, what: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }
  private def boolLit(e: Expression, what: String): Boolean = e match {
    case Literal(v: Boolean, _) => v
    case other => throw new IllegalArgumentException(
      s"$what must be a boolean literal, got $other")
  }

  val functions: Seq[(String, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    ("long_dot",
      new ExpressionInfo(classOf[LongDot].getName, "long_dot"),
      (args: Seq[Expression]) => LongDot(args(0), args(1))),
    ("long_sq_dist",
      new ExpressionInfo(classOf[LongSqDist].getName, "long_sq_dist"),
      (args: Seq[Expression]) => LongSqDist(args(0), args(1))),
    ("sorted_intersect_count",
      new ExpressionInfo(classOf[SortedIntersectCount].getName, "sorted_intersect_count"),
      (args: Seq[Expression]) => SortedIntersectCount(args(0), args(1))),
    ("word_ngrams",
      new ExpressionInfo(classOf[WordNGrams].getName, "word_ngrams"),
      (args: Seq[Expression]) => WordNGrams(args(0),
        if (args.length > 1) intLit(args(1), "n") else 3,
        args.length > 2 && boolLit(args(2), "distinct"))))

  /** Register on an existing session (temp functions). */
  def registerOn(spark: SparkSession): Unit =
    functions.foreach { case (name, _, builder) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(name, builder, "built-in")
    }
}
