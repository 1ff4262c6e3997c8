package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Bench-data scaler: replicates a testdata directory `factor`× with
  * shifted keys so join selectivities and group cardinalities scale
  * with the data (a plain row copy would keep key cardinality flat
  * and make every groupBy artificially hot).
  *
  * Usage: runMain graft.tools.ScaleUp <srcDir> <dstDir> <factor>
  *
  * Fact/entity tables shift their primary keys (and the foreign keys
  * that reference a scaled table) by `copy × (max(key)+1)`; dimension
  * tables (region/nation/customer/supplier) copy through unchanged,
  * mirroring TPC-H scaling. Output is parquet, written once — this is
  * a DEV TOOL for producing larger bench inputs (e.g. sf0.1 → sf1);
  * correctness gates always run on the driver-provided testdata.
  */
object ScaleUp {

  /** keys to shift per table (all become max+1-spaced id blocks). */
  private val shifted: Map[String, Seq[String]] = Map(
    "lineitem"   -> Seq("l_orderkey", "l_partkey"),
    "orders"     -> Seq("o_orderkey"),
    "part"       -> Seq("p_partkey"),
    "events"     -> Seq("event_id", "user_id"),
    "documents"  -> Seq("doc_id"),
    "embeddings" -> Seq("vec_id"))

  private val passthrough = Seq("region", "nation", "customer", "supplier")

  def scaleTable(df: DataFrame, keys: Seq[String], factor: Int): DataFrame = {
    val steps: Map[String, Long] = keys.map { k =>
      k -> (df.agg(max(col(k))).head().getLong(0) + 1L)
    }.toMap
    (0 until factor).map { i =>
      keys.foldLeft(df) { (d, k) =>
        d.withColumn(k, col(k) + lit(i * steps(k)))
      }
    }.reduce(_ union _)
  }

  def main(args: Array[String]): Unit = {
    val Array(src, dst, f) = args
    val factor = f.toInt
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(dst).mkdirs()
    for (t <- passthrough)
      spark.read.parquet(s"$src/$t.parquet").write.mode("overwrite")
        .parquet(s"$dst/$t.parquet")
    for ((t, keys) <- shifted) {
      val df = spark.read.parquet(s"$src/$t.parquet")
      scaleTable(df, keys, factor).write.mode("overwrite").parquet(s"$dst/$t.parquet")
      println(s"scaled $t x$factor")
    }
    spark.stop()
  }
}
