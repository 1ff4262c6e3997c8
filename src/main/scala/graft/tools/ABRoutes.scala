package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Checkpoints._
import graft.Tables.t
import graft.queries.Dedup

/** Same-JVM A/B of q123's dedup-route matrix: three standalone routes
  * (each re-running its own corpus clone-collapse window +
  * tokenize/shingle pass) vs [[Dedup.dedupRouteMatrix]] (one
  * window pass + one checkpointed rep-text table feeding all three).
  * Alternating passes in ONE JVM, min-of-passes per arm (the r6
  * doctrine — host noise windows make cross-run timing worthless).
  * Also asserts the two forms return IDENTICAL rows first — a faster
  * wrong matrix is not a win. Dev tool, not a driver contract. */
object ABRoutes {
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
    // standalone arm: the r9 shape — each route runs its own corpus
    // clone-collapse + shingle pass (rebuilt here from the public
    // route functions; the production dedupRouteMatrix is the shared
    // form, so the rejected plan stays reproducible)
    def oldArm(): DataFrame = {
      val routes = Seq(
        "jaccard" -> Dedup.ngramJaccardPairs(docs, 0.3)
          .select(col("a_id"), col("b_id")).cut(),
        "minhash" -> Dedup.nearDupPairs(docs)
          .select(col("a_id"), col("b_id")).cut(),
        "simhash" -> Dedup.simhashPairs(docs)
          .select(col("a_id"), col("b_id")).cut())
      val cells = for {
        (na, pa) <- routes; (nb, pb) <- routes; if na <= nb
      } yield {
        val common = if (na == nb) pa else pa.join(pb, Seq("a_id", "b_id"))
        common.agg(count(lit(1)).as("n_common"))
          .select(lit(na).as("route_a"), lit(nb).as("route_b"), col("n_common"))
      }
      cells.reduce(_.unionByName(_))
    }
    def newArm(): DataFrame = Dedup.dedupRouteMatrix(docs)

    // equality first
    val a = oldArm().orderBy("route_a", "route_b").collect().map(_.toString).toSeq
    val b = newArm().orderBy("route_a", "route_b").collect().map(_.toString).toSeq
    require(a == b, s"MATRIX MISMATCH:\nold=$a\nnew=$b")
    println(s"matrices identical: ${a.mkString(" | ")}")

    def force(df: DataFrame): Unit = df.foreach(_ => ())
    def pass(mk: () => DataFrame): Double = {
      System.gc(); Thread.sleep(300)
      val t0 = System.nanoTime(); force(mk()); (System.nanoTime() - t0) / 1e9
    }
    val n = 3
    val times = (1 to n).map { _ => (pass(oldArm _), pass(newArm _)) }
    val (ot, nt) = (times.map(_._1), times.map(_._2))
    println(f"standalone passes: ${ot.map(x => f"$x%.2f").mkString(" ")} min=${ot.min}%.2f")
    println(f"shared     passes: ${nt.map(x => f"$x%.2f").mkString(" ")} min=${nt.min}%.2f")
    println(f"min-ratio standalone/shared = ${ot.min / nt.min}%.2f")
    spark.stop()
  }
}
