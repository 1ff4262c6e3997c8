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
      // events.ts is parquet TIMESTAMP(NANOS), which Spark 4 refuses to
      // read as a timestamp. Read nanos as long, convert to micros with
      // integer division (double division would lose precision at 1e18).
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val df = spark.read.parquet(s"$dir/$name.parquet")
      df.schema("ts").dataType match {
        case org.apache.spark.sql.types.LongType =>
          df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
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
