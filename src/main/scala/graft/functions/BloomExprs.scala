package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim.Shim
import org.apache.spark.sql.types.{BooleanType, DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** Codegen membership probe against a pre-built Bloom filter.
  *
  * The scale pattern this enables: when one side of a containment
  * question is SMALL (an eval suite, a blocklist, a query set), build
  * its Bloom filter once on the driver, ship it inside the expression
  * (serialized bytes; deserialized lazily once per executor), and
  * prune the BIG side in its scan stage — only probable hits reach
  * the shuffle, and an exact equi-join afterwards removes the false
  * positives, so results stay exact. One virtual call per row in
  * generated code; no UDF, no interpreted closure.
  */
case class BloomMightContain(child: Expression, bytes: Array[Byte])
    extends UnaryExpression with Serializable {

  override def nullIntolerant: Boolean = true
  override def dataType: DataType = BooleanType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires bigint, got ${dt.simpleString}")
  }

  // deserialized once per JVM per expression instance; the bytes ride
  // the (serializable) expression itself, so codegen can reference
  // `this` without assuming the sketch class serializes
  @transient private lazy val bf: BloomFilter =
    BloomFilter.readFrom(new ByteArrayInputStream(bytes))

  def mightContain(v: Long): Boolean = bf.mightContainLong(v)

  override def nullSafeEval(v: Any): Any = mightContain(v.asInstanceOf[Long])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloomExpr", this,
      classOf[BloomMightContain].getName)
    defineCodeGen(ctx, ev, c => s"$ref.mightContain($c)")
  }

  // case-class equality on Array[Byte] is reference-based, which would
  // make two semantically identical probes never compare equal —
  // defeating canonicalization/semanticEquals, subexpression
  // elimination, and exchange reuse. Compare the filter bytes by value.
  override def equals(other: Any): Boolean = other match {
    case b: BloomMightContain =>
      child == b.child && java.util.Arrays.equals(bytes, b.bytes)
    case _ => false
  }
  override def hashCode(): Int =
    31 * child.hashCode() + java.util.Arrays.hashCode(bytes)

  override protected def withNewChildInternal(newChild: Expression): BloomMightContain =
    copy(child = newChild)
  override def prettyName: String = "bloom_might_contain"
}

object BloomExprs {
  /** `true` iff `c` (bigint) might be in `bf` — false ⇒ definitely
    * absent, so a filter on this keeps a superset of true members. */
  def mightContain(c: Column, bf: BloomFilter): Column = {
    val bos = new ByteArrayOutputStream()
    bf.writeTo(bos)
    Shim.column(BloomMightContain(Shim.expression(c), bos.toByteArray))
  }
}
