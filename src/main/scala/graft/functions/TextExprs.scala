package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim.Shim
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native text kernels (same rationale as VectorExprs: the
  * declarative `filter(toks, t => w1 === t || w2 === t || …)` form
  * runs one interpreted closure per token with an O(|words|) equality
  * chain inside — at corpus scale that lambda dominates the scan
  * stage. These loop over ArrayData in generated Java against a
  * shared hash set.) */

/** Count of array elements contained in a FIXED word set — the
  * stopword/marker-hit counter behind quality scoring (q31) and
  * language-ID (q30). Occurrences count (duplicates included),
  * matching `list_filter(tk, t -> list_contains(set, t))` in the
  * DuckDB oracles. Null input → null; null elements don't count. */
case class SetHitCount(child: Expression, words: Seq[String])
    extends UnaryExpression with Serializable {

  override def nullIntolerant: Boolean = true
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${dt.simpleString}")
  }

  // one set per expression instance, shared across rows (and shipped
  // into generated code via a codegen object reference)
  @transient private lazy val set: java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String](words.size * 2)
    words.foreach(w => s.add(UTF8String.fromString(w)))
    s
  }

  override def nullSafeEval(a: Any): Any = {
    val xs = a.asInstanceOf[ArrayData]
    val n = xs.numElements()
    var acc = 0L
    var i = 0
    while (i < n) {
      if (!xs.isNullAt(i) && set.contains(xs.getUTF8String(i))) acc += 1L
      i += 1
    }
    acc
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, xs => {
      val setRef = ctx.addReferenceObj("hitSet", set, "java.util.HashSet")
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
        int $n = $xs.numElements();
        long $acc = 0L;
        for (int $i = 0; $i < $n; $i++) {
          if (!$xs.isNullAt($i) && $setRef.contains($xs.getUTF8String($i))) $acc++;
        }
        ${ev.value} = $acc;
      """
    })

  override protected def withNewChildInternal(newChild: Expression): SetHitCount =
    copy(child = newChild)
  override def prettyName: String = "set_hit_count"
}

/** Count of ASCII-alphanumeric characters in a string — semantics of
  * `length(regexp_replace(s, '[^A-Za-z0-9]', ''))` without running a
  * regex per row (the regex dominated the q31 scan at 100×). The
  * character class is pure ASCII, and UTF-8 continuation/lead bytes
  * are ≥ 0x80, so a single byte scan is exact for any input: each
  * counted byte IS one matching character, every non-ASCII character
  * contributes only non-matching bytes. Null → null. */
case class AlnumCount(child: Expression)
    extends UnaryExpression with Serializable {

  override def nullIntolerant: Boolean = true
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${dt.simpleString}")
  }

  override def nullSafeEval(a: Any): Any = {
    val bytes = a.asInstanceOf[UTF8String].getBytes
    var acc = 0L
    var i = 0
    while (i < bytes.length) {
      val b = bytes(i)
      if ((b >= '0' && b <= '9') || (b >= 'A' && b <= 'Z') ||
          (b >= 'a' && b <= 'z')) acc += 1L
      i += 1
    }
    acc
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => {
      val bytes = ctx.freshName("bytes")
      val i = ctx.freshName("i")
      val b = ctx.freshName("b")
      val acc = ctx.freshName("acc")
      s"""
        byte[] $bytes = $s.getBytes();
        long $acc = 0L;
        for (int $i = 0; $i < $bytes.length; $i++) {
          byte $b = $bytes[$i];
          if (($b >= '0' && $b <= '9') || ($b >= 'A' && $b <= 'Z') ||
              ($b >= 'a' && $b <= 'z')) $acc++;
        }
        ${ev.value} = $acc;
      """
    })

  override protected def withNewChildInternal(newChild: Expression): AlnumCount =
    copy(child = newChild)
  override def prettyName: String = "alnum_count"
}

object TextExprs {
  def setHitCount(toks: Column, words: Seq[String]): Column =
    Shim.column(SetHitCount(Shim.expression(toks), words))

  def alnumCount(s: Column): Column =
    Shim.column(AlnumCount(Shim.expression(s)))
}
