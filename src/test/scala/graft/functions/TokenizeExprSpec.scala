package graft.functions

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.miw.Tokenizer

/** Native tokenizer vs the Scala reference implementation over random
  * inputs (including quotes, runs of delimiters, unclosed quotes, and
  * multi-byte UTF-8 content). */
class TokenizeExprSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private val lineGen: Gen[String] = Gen.listOf(Gen.frequency(
    6 -> Gen.alphaNumChar,
    2 -> Gen.oneOf(',', ' '),
    1 -> Gen.const('"'),
    1 -> Gen.oneOf('é', '漢', 'ß'))).map(_.mkString)

  test("expression agrees with Tokenizer.quotedSplit on random lines") {
    import spark.implicits._
    val samples = (0 until 300).flatMap(i =>
      lineGen.apply(Gen.Parameters.default, Seed(i.toLong))) ++ Seq(
      "a,\"b,c\",d", "\"unclosed, span", "a,,b", ",,,", "", "\"\"",
      "x \"quoted bit\" y", "\"q\",", "a\"b,c")
    val df = samples.toDF("line")
      .select(col("line"),
        TokenizeExpr.quotedTokenize(col("line"), ", ", '"').as("toks"))
    df.collect().foreach { r =>
      val line = r.getString(0)
      val got = r.getAs[scala.collection.Seq[String]]("toks").toVector
      assert(got == Tokenizer.quotedSplit(line, ", ", '"'), s"line=<$line>")
    }
  }

  test("engine pipeline uses the native expression (no UDF in plan)") {
    import spark.implicits._
    val fmt = graft.miw.LogFormat.parse(
      """{"format_name":"t","delims":",","quotechar":"\"","fields":[
          {"name":"k","pos":0,"type":"string","key":true}]}""")
    val plan = graft.miw.MiwEngine
      .parse(fmt, Seq("a,b").toDF("value")).queryExecution.analyzed.toString
    assert(plan.contains("quoted_tokenize"), plan)
    assert(!plan.toLowerCase.contains("scalaudf"), plan)
  }
}
