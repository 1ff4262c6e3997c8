package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim.Shim
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, LongType}

/** Native Catalyst expressions for int64 vector kernels.
  *
  * The declarative versions (`zip_with` + `aggregate`) are evaluated
  * as interpreted higher-order functions — one closure call per
  * element, which at pair-join cardinalities (|pairs| × dim lambda
  * invocations) dominates the runtime. These expressions instead
  * loop over the underlying ArrayData in generated Java (or a tight
  * JIT-friendly eval loop), keeping the whole join stage inside
  * whole-stage codegen. Semantics are IDENTICAL to the declarative
  * forms: exact int64 arithmetic, same overflow behavior, null if
  * either input is null.
  *
  * This mirrors the builder guidance: prefer
  * `org.apache.spark.sql.functions`, and when that can't be fast
  * enough, a codegen `Expression` beats a Scala UDF (no boxing, no
  * per-element closures, stays fusible with surrounding operators).
  */
abstract class LongVecKernel extends BinaryExpression with Serializable {

  override def nullIntolerant: Boolean = true
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType): Boolean = dt match {
      case ArrayType(LongType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<bigint> arguments, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }

  /** Java source for the per-element accumulation over element vars
    * `$xi` and `$yi`. */
  protected def javaAccum(xi: String, yi: String): String
  /** Scala accumulation for interpreted eval. */
  protected def accum(x: Long, y: Long): Long

  override def nullSafeEval(a: Any, b: Any): Any = {
    val xs = a.asInstanceOf[ArrayData]
    val ys = b.asInstanceOf[ArrayData]
    val n = math.min(xs.numElements(), ys.numElements())
    var acc = 0L
    var i = 0
    while (i < n) {
      acc += accum(xs.getLong(i), ys.getLong(i))
      i += 1
    }
    acc
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (xs, ys) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val xi = ctx.freshName("xi")
      val yi = ctx.freshName("yi")
      s"""
        int $n = java.lang.Math.min($xs.numElements(), $ys.numElements());
        long $acc = 0L;
        for (int $i = 0; $i < $n; $i++) {
          long $xi = $xs.getLong($i);
          long $yi = $ys.getLong($i);
          $acc += ${javaAccum(xi, yi)};
        }
        ${ev.value} = $acc;
      """
    })
}

/** Σ xᵢ·yᵢ over two int64 arrays. */
case class LongDot(left: Expression, right: Expression) extends LongVecKernel {
  override protected def javaAccum(xi: String, yi: String): String = s"$xi * $yi"
  override protected def accum(x: Long, y: Long): Long = x * y
  override protected def withNewChildrenInternal(l: Expression, r: Expression): LongDot =
    copy(left = l, right = r)
  override def prettyName: String = "long_dot"
}

/** Σ (xᵢ−yᵢ)² over two int64 arrays. */
case class LongSqDist(left: Expression, right: Expression) extends LongVecKernel {
  override protected def javaAccum(xi: String, yi: String): String =
    s"($xi - $yi) * ($xi - $yi)"
  override protected def accum(x: Long, y: Long): Long = (x - y) * (x - y)
  override protected def withNewChildrenInternal(l: Expression, r: Expression): LongSqDist =
    copy(left = l, right = r)
  override def prettyName: String = "long_sq_dist"
}

/** |a ∩ b| for two SORTED-ascending distinct int64 arrays, by
  * two-pointer merge — no per-row hash-set build (ArrayIntersect
  * allocates one per invocation, which dominates candidate-pair
  * verification at similarity-join cardinalities). Callers must
  * supply sorted distinct arrays (sort_array(collect_set/list)). */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends LongVecKernel {
  // merge loop, not an element-wise fold — override both eval paths
  override protected def javaAccum(xi: String, yi: String): String =
    throw new UnsupportedOperationException("merge kernel")
  override protected def accum(x: Long, y: Long): Long =
    throw new UnsupportedOperationException("merge kernel")

  override def nullSafeEval(a: Any, b: Any): Any = {
    val xs = a.asInstanceOf[ArrayData]
    val ys = b.asInstanceOf[ArrayData]
    val nx = xs.numElements()
    val ny = ys.numElements()
    var i = 0
    var j = 0
    var acc = 0L
    while (i < nx && j < ny) {
      val x = xs.getLong(i)
      val y = ys.getLong(j)
      if (x == y) { acc += 1L; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    acc
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (xs, ys) => {
      val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val acc = ctx.freshName("acc")
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      s"""
        int $nx = $xs.numElements();
        int $ny = $ys.numElements();
        int $i = 0; int $j = 0;
        long $acc = 0L;
        while ($i < $nx && $j < $ny) {
          long $x = $xs.getLong($i);
          long $y = $ys.getLong($j);
          if ($x == $y) { $acc++; $i++; $j++; }
          else if ($x < $y) { $i++; } else { $j++; }
        }
        ${ev.value} = $acc;
      """
    })

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): SortedIntersectCount = copy(left = l, right = r)
  override def prettyName: String = "sorted_intersect_count"
}

/** float32 vector → int64 vector scaled by 1e6 (ExactCols.iscale) as
  * ONE codegen kernel instead of a `transform` lambda — the lambda
  * ran an interpreted closure (+ a BigDecimal round expression) per
  * element in the scan stage of EVERY embedding query. Semantics are
  * bit-identical to `transform(v, x => round(x.cast(double) * 1e6)
  * .cast(long))`: Spark's round(double, 0) goes through
  * java.math.BigDecimal.valueOf(d).setScale(0, HALF_UP) (the
  * DECIMAL-string representation decides exact halves), then the
  * bigint cast truncates/clamps. The kernel takes a floor-based fast
  * path whenever the fraction is outside (0.5±1e-3) — where
  * decimal-string and binary rounding provably agree (ulp at 1e6
  * scale ≈ 1e-10) — and falls back to the exact BigDecimal route
  * inside the band. NaN → 0, ±Inf clamps, matching the cast. */
case class IScale(child: Expression) extends UnaryExpression with Serializable {

  override def nullIntolerant: Boolean = true
  override def dataType: DataType = child.dataType match {
    case ArrayType(_, n) => ArrayType(LongType, containsNull = n)
    case _ => ArrayType(LongType, containsNull = false)
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float>, got ${dt.simpleString}")
  }

  /** Exposed for generated code. */
  def compute(xs: ArrayData): ArrayData = {
    val n = xs.numElements()
    val out = new Array[Any](n)
    var i = 0
    while (i < n) {
      if (!xs.isNullAt(i)) out(i) = IScale.scale1e6(xs.getFloat(i))
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override def nullSafeEval(a: Any): Any = compute(a.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, xs => {
      val ref = ctx.addReferenceObj("iscale", this, classOf[IScale].getName)
      s"${ev.value} = $ref.compute($xs);"
    })

  override protected def withNewChildInternal(newChild: Expression): IScale =
    copy(child = newChild)
  override def prettyName: String = "iscale"
}

object IScale {
  /** round(x.toDouble * 1e6, HALF_UP via decimal repr) cast to long. */
  def scale1e6(x: Float): Long = {
    val y = x.toDouble * 1000000d
    if (java.lang.Double.isNaN(y)) 0L
    else if (y >= 9.223372036854776e18) Long.MaxValue
    else if (y <= -9.223372036854776e18) Long.MinValue
    else {
      val fl = Math.floor(y)
      val f = y - fl
      if (f > 0.499 && f < 0.501)
        java.math.BigDecimal.valueOf(y)
          .setScale(0, java.math.RoundingMode.HALF_UP).longValue()
      else fl.toLong + (if (f > 0.5) 1L else 0L)
    }
  }
}

/** float32 vector → symmetric int8 quantization as int64s:
  * round(x·127/s, HALF_UP via decimal repr) per element, where `s`
  * is the corpus absmax (a driver scalar, the q62 two-scalar stats
  * pattern). SYMMETRIC — sign survives, so quantized cosine still
  * measures direction (the unsigned 0..255 form of q62 is a storage
  * codec, not a similarity domain: shifting every coordinate positive
  * collapses cosine toward +1). |x| ≤ s ⇒ |q| ≤ 127 by construction.
  * One codegen kernel, not a `transform` lambda (the IScale doctrine);
  * rounding is bit-compatible with Spark's round(double):
  * BigDecimal.valueOf(y).setScale(0, HALF_UP), with IScale's
  * floor fast path outside the (0.5 ± 1e-3) fraction band. */
case class IQuantSym(child: Expression, s: Double)
    extends UnaryExpression with Serializable {

  override def nullIntolerant: Boolean = true
  override def dataType: DataType = child.dataType match {
    case ArrayType(_, n) => ArrayType(LongType, containsNull = n)
    case _ => ArrayType(LongType, containsNull = false)
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) if s > 0d => TypeCheckResult.TypeCheckSuccess
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a positive scale, got $s")
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float>, got ${dt.simpleString}")
  }

  /** Exposed for generated code. */
  def compute(xs: ArrayData): ArrayData = {
    val n = xs.numElements()
    val out = new Array[Any](n)
    var i = 0
    while (i < n) {
      if (!xs.isNullAt(i)) out(i) = IQuantSym.quant(xs.getFloat(i), s)
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override def nullSafeEval(a: Any): Any = compute(a.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, xs => {
      val ref = ctx.addReferenceObj("iquant", this, classOf[IQuantSym].getName)
      s"${ev.value} = $ref.compute($xs);"
    })

  override protected def withNewChildInternal(newChild: Expression): IQuantSym =
    copy(child = newChild)
  override def prettyName: String = "iquant_sym"
}

object IQuantSym {
  /** round(x.toDouble · 127 / s, HALF_UP via decimal repr) → long.
    * Evaluation order (x·127)/s — the oracle replays the same text. */
  def quant(x: Float, s: Double): Long = {
    val y = x.toDouble * 127d / s
    if (java.lang.Double.isNaN(y)) 0L
    else {
      val fl = Math.floor(y)
      val f = y - fl
      if (f > 0.499 && f < 0.501)
        java.math.BigDecimal.valueOf(y)
          .setScale(0, java.math.RoundingMode.HALF_UP).longValue()
      else fl.toLong + (if (f > 0.5) 1L else 0L)
    }
  }
}

object VectorExprs {
  def longDot(a: Column, b: Column): Column =
    Shim.column(LongDot(Shim.expression(a), Shim.expression(b)))

  def longSqDist(a: Column, b: Column): Column =
    Shim.column(LongSqDist(Shim.expression(a), Shim.expression(b)))

  def sortedIntersectCount(a: Column, b: Column): Column =
    Shim.column(SortedIntersectCount(Shim.expression(a), Shim.expression(b)))

  def iscale(v: Column): Column =
    Shim.column(IScale(Shim.expression(v)))

  def iquantSym(v: Column, s: Double): Column =
    Shim.column(IQuantSym(Shim.expression(v), s))
}
