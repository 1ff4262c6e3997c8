package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.Checkpoints._
import graft.Tables.t
import graft.functions.QuantileSketch

/** Same-JVM profile + A/B for the QuantileSketch gate shape (the r12
  * verdict's item 7: profile whether the typed Aggregator's per-row
  * cost dominates q225/q173 BEFORE rewriting anything). Stages of the
  * committed q225 shape are timed individually, then the committed
  * 3-corpus-pass shape is A/B'd against the histogram form (ONE
  * corpus pass into a codegen groupBy((priority, delay)).count(),
  * autoBuffer + the weighted sketch + the fence counts all running
  * over the tiny histogram). Asserts result equality first. Dev tool,
  * not a driver contract. */
object ABQuantile {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def dl(): DataFrame = t(spark, d, "lineitem")
      .select(col("l_orderkey"), col("l_shipdate"))
      .join(t(spark, d, "orders")
        .select(col("o_orderkey"), col("o_orderdate"), col("o_orderpriority")),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("o_orderpriority").as("priority"),
        datediff(to_date(col("l_shipdate")), to_date(col("o_orderdate")))
          .cast(LongType).as("delay"))

    // committed r12 q225 shape (3 corpus passes: autoBuffer,
    // row-at-a-time sketch aggregate, fence-count rescan)
    def oldArm(): DataFrame = {
      val v = dl()
      val buf = QuantileSketch.autoBuffer(v, Seq(col("priority")), col("delay"))
      val qs = v.groupBy(col("priority"))
        .agg(QuantileSketch.exact(col("delay"), buf,
          Seq((1L, 4L), (3L, 4L))).as("r"))
        .select(col("priority"), col("r.n").as("n"),
          element_at(col("r.q"), 1).as("p25"),
          element_at(col("r.q"), 2).as("p75"))
      v.join(broadcast(qs), "priority")
        .withColumn("iqr", col("p75") - col("p25"))
        .groupBy(col("priority"), col("n"), col("p25"), col("p75"))
        .agg(
          sum(when(col("delay") * 2L < col("p25") * 2L - col("iqr") * 3L, 1L)
            .otherwise(0L)).as("n_low"),
          sum(when(col("delay") * 2L > col("p75") * 2L + col("iqr") * 3L, 1L)
            .otherwise(0L)).as("n_high"))
        .orderBy(col("priority"))
    }

    // histogram form: ONE corpus pass
    def newArm(): DataFrame = {
      val hist = dl().groupBy(col("priority"), col("delay"))
        .agg(count(lit(1)).as("cnt"))
        .cut() // feeds autoBuffer, the weighted sketch, and the fences
      val buf = QuantileSketch.autoBuffer(hist, Seq(col("priority")), col("delay"))
      val qs = hist.groupBy(col("priority"))
        .agg(QuantileSketch.exactWeighted(col("delay"), col("cnt"), buf,
          Seq((1L, 4L), (3L, 4L))).as("r"))
        .select(col("priority"), col("r.n").as("n"),
          element_at(col("r.q"), 1).as("p25"),
          element_at(col("r.q"), 2).as("p75"))
      hist.join(broadcast(qs), "priority")
        .withColumn("iqr", col("p75") - col("p25"))
        .groupBy(col("priority"), col("n"), col("p25"), col("p75"))
        .agg(
          sum(when(col("delay") * 2L < col("p25") * 2L - col("iqr") * 3L, col("cnt"))
            .otherwise(0L)).as("n_low"),
          sum(when(col("delay") * 2L > col("p75") * 2L + col("iqr") * 3L, col("cnt"))
            .otherwise(0L)).as("n_high"))
        .orderBy(col("priority"))
    }

    // equality first — a faster different answer is not a win
    val a = oldArm().collect().map(_.toString).toSeq
    val b = newArm().collect().map(_.toString).toSeq
    require(a == b, s"RESULT MISMATCH:\nold=$a\nnew=$b")
    println(s"results identical: ${a.mkString(" | ")}")

    def force(df: DataFrame): Unit = df.foreach(_ => ())
    def time(name: String)(body: => Unit): Double = {
      System.gc(); Thread.sleep(300)
      val t0 = System.nanoTime(); body
      val s = (System.nanoTime() - t0) / 1e9
      println(f"$name%-34s $s%6.2f s"); s
    }

    // stage profile of the committed shape (where does q225 spend?)
    time("stage: dl corpus pass")(force(dl()))
    time("stage: autoBuffer pre-pass") {
      QuantileSketch.autoBuffer(dl(), Seq(col("priority")), col("delay")): Unit
    }
    val bufP = QuantileSketch.autoBuffer(dl(), Seq(col("priority")), col("delay"))
    time("stage: row-at-a-time sketch agg") {
      force(dl().groupBy(col("priority"))
        .agg(QuantileSketch.exact(col("delay"), bufP, Seq((1L, 4L), (3L, 4L)))))
    }
    time("stage: histogram groupBy") {
      force(dl().groupBy(col("priority"), col("delay")).agg(count(lit(1))))
    }
    time("stage: weighted sketch over hist") {
      val h = dl().groupBy(col("priority"), col("delay"))
        .agg(count(lit(1)).as("cnt"))
      force(h.groupBy(col("priority"))
        .agg(QuantileSketch.exactWeighted(col("delay"), col("cnt"), bufP,
          Seq((1L, 4L), (3L, 4L)))))
    }

    // full-query A/B, alternating, min-of-3 per arm
    val n = 3
    val times = (1 to n).map { _ =>
      (time("old arm (3 corpus passes)")(force(oldArm())),
        time("new arm (1 corpus pass)")(force(newArm())))
    }
    val (ot, nt) = (times.map(_._1), times.map(_._2))
    println(f"old min=${ot.min}%.2f  new min=${nt.min}%.2f  ratio=${ot.min / nt.min}%.2f")
    spark.stop()
  }
}
