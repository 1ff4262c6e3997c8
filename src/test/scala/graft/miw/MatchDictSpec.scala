package graft.miw

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Large match_file dictionaries must spill from an inlined isin
  * predicate to a broadcast semi/anti join (a 10k-term isin would
  * bloat every serialized plan), while small dictionaries stay
  * predicates so they can push down to the scan. */
class MatchDictSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def dictFile(terms: Seq[String]): String = {
    val p = Files.createTempFile("dict", ".txt")
    Files.write(p, terms.mkString("\n").getBytes("UTF-8"))
    p.toFile.deleteOnExit()
    p.toString
  }

  private def fmt(dict: String, negative: Boolean): LogFormat = LogFormat.parse(
    s"""{"format_name":"t","delims":",","fields":[
         {"name":"user","pos":0,"type":"string","key":true,
          "match":{"match_file":"$dict","logic":"and","exact":true,"negative":$negative}},
         {"name":"v","pos":1,"type":"int","aggregated":true,"aggregation":"sum"}]}""")

  // u0..u49 in the data; big dict covers the even ones plus 10k misses
  private val data = (0 until 50).map(i => s"u$i,${i + 1}")
  private val bigTerms =
    (0 until 50 by 2).map(i => s"u$i") ++ (0 until 10000).map(i => s"zz$i")

  test("positive big dict becomes a broadcast LEFT SEMI join with exact results") {
    val df = MiwEngine.runOnLines(spark, fmt(dictFile(bigTerms), negative = false), data)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("LeftSemi"), s"no semi join in plan:\n$plan")
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastNestedLoop"),
      "dict join is not broadcast")
    val rows = df.collect()
    assert(rows.length == 25)
    assert(rows.map(_.getAs[Long]("v")).sum == (0 until 50 by 2).map(_ + 1).sum)
  }

  test("negative big dict becomes an anti join") {
    val df = MiwEngine.runOnLines(spark, fmt(dictFile(bigTerms), negative = true), data)
    assert(df.queryExecution.executedPlan.toString.contains("LeftAnti"))
    val rows = df.collect()
    assert(rows.length == 25)
    assert(rows.map(_.getAs[Long]("v")).sum == (1 until 50 by 2).map(_ + 1).sum)
  }

  test("small dict stays an inlined predicate (no join in plan)") {
    val df = MiwEngine.runOnLines(spark,
      fmt(dictFile(Seq("u1", "u2", "u3")), negative = false), data)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"unexpected join for a 3-term dict:\n$plan")
    assert(df.collect().length == 3)
  }

  test("structured-source path spills big dicts the same way") {
    import spark.implicits._
    val table = (0 until 50).map(i => (s"u$i", (i + 1).toLong)).toDF("user", "v")
    val df = MiwEngine.runOnTable(fmt(dictFile(bigTerms), negative = false), table)
    assert(df.queryExecution.executedPlan.toString.contains("LeftSemi"))
    assert(df.collect().length == 25)
  }

  test("anti-join path drops NULL tokens exactly like the inline predicate") {
    import spark.implicits._
    // !isin evaluates NULL for a NULL token → the inline path filters
    // the row; the left_anti path must agree, not keep it
    val table = ((0 until 49).map(i => (s"u$i", (i + 1).toLong)) :+
      (null.asInstanceOf[String], 99L)).toDF("user", "v")
    val missTerms = (0 until 10000).map(i => s"zz$i") // matches nothing
    val big = MiwEngine.runOnTable(fmt(dictFile(missTerms), negative = true), table)
    val small = MiwEngine.runOnTable(
      fmt(dictFile(Seq("zz1", "zz2")), negative = true), table)
    assert(big.collect().length == 49)   // null row dropped by the join path
    assert(small.collect().length == 49) // and by the predicate path
  }
}
