package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables.t
import graft.functions.ExactCols._
import graft.queries.Pipeline

/** Same-JVM A/B of the q101 quality ensemble: the 4-operator
  * composition (each vote re-collapses + re-tokenizes the corpus)
  * vs [[Pipeline.qualityEnsemble]] (one cut() token-frequency table
  * feeds all four votes). Alternating passes in ONE JVM — the host's
  * ~10× noise windows make cross-run comparisons worthless (the r6
  * q86 near-revert); min-of-passes per arm decides. Dev tool, not a
  * driver contract. */
object ABQuality {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val docs = t(spark, d, "documents")
    def weights = spark.range(512).select(col("id").as("bucket"),
      (hmod(concat(lit("w:"), col("id").cast("string"))) % 2001L - 1000L)
        .as("w"))

    def composition(): DataFrame = {
      val g = docs.select(col("doc_id"),
        Pipeline.gopherKeep(col("text")).as("v_gopher"))
      val c = Pipeline.classifierScore(docs, weights)
        .select(col("doc_id"), col("keep").as("v_classifier"))
      val o = Pipeline.vocabOovAudit(docs)
        .select(col("doc_id"), col("keep").as("v_oov"))
      val m = Pipeline.commonnessScore(docs, threshold = 900L)
        .select(col("doc_id"), col("keep").as("v_common"))
      val nv = Seq("v_gopher", "v_classifier", "v_oov", "v_common")
        .map(v => when(col(v), 1L).otherwise(0L)).reduce(_ + _)
      g.join(c, "doc_id").join(o, "doc_id").join(m, "doc_id")
        .withColumn("n_votes", nv)
        .withColumn("keep", col("n_votes") >= 3)
    }
    def ensemble(): DataFrame =
      Pipeline.qualityEnsemble(docs, weights, commonThreshold = 900L)

    def force(df: DataFrame): Long =
      df.select(xxhash64(struct(df.columns.map(col).toSeq: _*)).as("h"))
        .agg(count(col("h")), max(col("h"))).collect().head.getLong(0)
    def pass(mk: () => DataFrame): Double = {
      System.gc(); Thread.sleep(300)
      val t0 = System.nanoTime(); force(mk()); (System.nanoTime() - t0) / 1e9
    }
    // warmup both arms (codegen/JIT), then alternate
    force(composition()); force(ensemble())
    val n = 3
    val times = (1 to n).map { _ => (pass(composition _), pass(ensemble _)) }
    val (ct, et) = (times.map(_._1), times.map(_._2))
    println(f"composition passes: ${ct.map(x => f"$x%.2f").mkString(" ")} min=${ct.min}%.2f")
    println(f"ensemble    passes: ${et.map(x => f"$x%.2f").mkString(" ")} min=${et.min}%.2f")
    println(f"min-ratio composition/ensemble = ${ct.min / et.min}%.2f")
    spark.stop()
  }
}
