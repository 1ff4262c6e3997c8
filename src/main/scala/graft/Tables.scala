package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Shared table readers + exact-arithmetic helpers.
  *
  * All correctness-gate queries compute floating aggregates through
  * fixed-point decimal so that Spark and the DuckDB oracle produce
  * bit-identical doubles regardless of partial-aggregation order.
  * (A plain `sum(double)` is order-dependent; at 32 shuffle partitions
  * the last few bits differ run to run, which would break hash compare.)
  */
object Tables {
  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") {
      // events.ts has shipped as two parquet types across testdata
      // generations: TIMESTAMP(NANOS) (Spark 4 refuses it as a
      // timestamp — read nanos as long, integer-divide to micros) and
      // plain naive TIMESTAMP(MICROS) (reads as TIMESTAMP_NTZ). Gate
      // queries use instant functions (unix_millis) and UTC bucketing,
      // so both normalize to TIMESTAMP_LTZ; sessions here pin
      // spark.sql.session.timeZone=UTC, making the NTZ→LTZ cast the
      // identity mapping the oracle (naive DuckDB timestamps) expects.
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val df = spark.read.parquet(s"$dir/$name.parquet")
      df.schema("ts").dataType match {
        case org.apache.spark.sql.types.LongType =>
          df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
        case org.apache.spark.sql.types.TimestampNTZType =>
          df.withColumn("ts",
            col("ts").cast(org.apache.spark.sql.types.TimestampType))
        case _ => df
      }
    } else spark.read.parquet(s"$dir/$name.parquet")

  /** Order-independent exact sum of a 2-decimal-place double column. */
  def dsum(c: Column): Column = sum(c.cast(DecimalType(18, 2))).cast(DoubleType)

  /** Exact mean: decimal sum divided by count, in double. */
  def davg(c: Column): Column = dsum(c) / count(c)

  /** SQL fragment: exact decimal sum cast back to double (DuckDB side). */
  def sqlDsum(col: String): String =
    s"CAST(SUM(CAST($col AS DECIMAL(18,2))) AS DOUBLE)"
}
