package graft.miw

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkTestSession, Tables}

/** Format-driven aggregation over a STRUCTURED source (parquet table,
  * fields matched by name — no tokenizer): same format model, full
  * pushdown/pruning path. */
class TableSourceSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("runOnTable matches direct relational computation incl. match filter") {
    val fmt = LogFormat.parse(
      """{"format_name":"ev","fields":[
          {"name":"event_type","pos":0,"type":"string","key":true,
           "match":{"match_str":"error","logic":"and","exact":true,"negative":true}},
          {"name":"user_id","pos":1,"type":"int","aggregated":true,"aggregation":"sum"}]}""")
    val events = Tables.t(spark, sf, "events")
    val got = MiwEngine.runOnTable(fmt, events)
      .select(col("id"), col("logs"), col("user_id"))
      .orderBy(col("id")).collect()
    val want = events.filter(col("event_type") =!= "error")
      .groupBy(col("event_type").as("id"))
      .agg(count(lit(1)).as("logs"), sum(col("user_id")).as("user_id"))
      .orderBy(col("id")).collect()
    assert(got.toSeq == want.toSeq)
    assert(got.nonEmpty && got.forall(_.getAs[String]("id") != "error"))
  }

  test("column pruning reaches the scan (only named fields read)") {
    val fmt = LogFormat.parse(
      """{"format_name":"ev","fields":[
          {"name":"event_type","pos":0,"type":"string","key":true},
          {"name":"user_id","pos":1,"type":"int","aggregated":true,"aggregation":"sum"}]}""")
    // use a table without the nanos-ts rewrite so the scan is direct
    val li = spark.read.parquet(s"$sf/documents.parquet")
      .withColumnRenamed("lang", "event_type")
      .withColumnRenamed("n_chars", "user_id")
    val plan = MiwEngine.runOnTable(fmt, li).queryExecution.sparkPlan.toString
    val scan = plan.linesIterator.find(_.contains("FileScan")).getOrElse("")
    assert(scan.contains("event_type") || scan.contains("lang"), scan)
    assert(!scan.contains("text"), s"unpruned scan: $scan")
  }
}
