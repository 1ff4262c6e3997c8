package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Misra–Gries guarantees (counts are merge-order-dependent, like any
  * mergeable sketch, so the assertions are the published bounds, not
  * exact values — the exact tier stays the oracle path). */
class HeavyHittersSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  // zipf-ish: key i appears ~N/i times
  private def skewed(n: Int) = {
    import spark.implicits._
    (1 to n).flatMap(i => Seq.fill(n / i)(s"k$i")).toDF("v")
      .repartition(8) // force multi-partition partial/final merges
  }

  test("every key above n/(k+1) survives, with bounded underestimates") {
    val df = skewed(64)
    val n = df.count()
    val k = 8
    val got = df.agg(HeavyHitters(col("v"), k).as("hh"))
      .collect().head.getAs[Map[String, Long]]("hh")
    assert(got.size <= k)
    val exact = df.groupBy(col("v")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val bound = n / (k + 1)
    // completeness: all true heavy keys present
    for ((key, c) <- exact if c > bound)
      assert(got.contains(key), s"missing heavy key $key (count $c, bound $bound)")
    // soundness: estimates never exceed truth, underestimate ≤ bound
    for ((key, est) <- got) {
      assert(est <= exact(key), s"$key overestimated: $est > ${exact(key)}")
      assert(exact(key) - est <= bound, s"$key off by more than $bound")
    }
  }

  test("extreme skew: the dominant key is near-exact") {
    import spark.implicits._
    val df = (Seq.fill(9000)("hot") ++ (1 to 1000).map(i => s"cold$i"))
      .toDF("v").repartition(16)
    val got = df.agg(HeavyHitters(col("v"), 10).as("hh"))
      .collect().head.getAs[Map[String, Long]]("hh")
    assert(got.contains("hot"))
    assert(got("hot") >= 9000L - 10000L / 11)
  }

  test("exact mode fails LOUDLY when cardinality exceeds k (the ScaleUp trap)") {
    import spark.implicits._
    // 40 distinct keys against k=8 models a ScaleUp-replicated corpus
    // whose shifted keys multiplied cardinality past the calibrated k:
    // the sketch tier would silently underestimate and the gate's hash
    // compare would be the first (delayed, cryptic) symptom — exact
    // mode turns it into an immediate job failure naming the cause
    val wide = (1 to 40).map(i => s"u$i").toDF("v").repartition(4)
    val e = intercept[Exception] {
      wide.agg(HeavyHitters.exact(col("v"), 8)).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("left the exact regime")), e.toString)
    // same data, same k, sketch tier: succeeds with bounded summaries
    val got = wide.agg(HeavyHitters(col("v"), 8).as("hh"))
      .collect().head.getAs[Map[String, Long]]("hh")
    assert(got.size <= 8)
    // and exact mode in its contract regime (k > cardinality) matches
    // the true counts bit-for-bit
    val okK = wide.agg(HeavyHitters.exact(col("v"), 64).as("hh"))
      .collect().head.getAs[Map[String, Long]]("hh")
    assert(okK == (1 to 40).map(i => s"u$i" -> 1L).toMap)
  }

  test("autoK derives the exact-regime k from the data at any scale") {
    import spark.implicits._
    // models the ScaleUp trap the fixed k=100000 fell into: replicate a
    // corpus 3x with shifted keys and the cardinality triples, but
    // autoK's distinct-count pre-pass tracks it — exact mode stays in
    // the never-decrements regime and equals the true GROUP BY counts
    def corpus(reps: Int) = (0 until reps).flatMap(r =>
      (1 to 50).flatMap(i => Seq.fill(1 + i % 3)((i % 2, s"u${r * 50 + i}"))))
      .toDF("g", "v").repartition(8)
    for (reps <- Seq(1, 3)) {
      val df = corpus(reps)
      val k = HeavyHitters.autoK(df, Seq(col("g")), col("v"))
      val exactCard = df.groupBy("g").agg(countDistinct(col("v")).as("c"))
        .agg(max(col("c"))).head.getLong(0)
      assert(k == exactCard + 1)
      val got = df.groupBy(col("g"))
        .agg(HeavyHitters.exact(col("v"), k).as("hh"))
        .select(col("g"), explode(col("hh")).as(Seq("v", "cnt")))
        .collect().map(r => (r.getInt(0), r.getString(1)) -> r.getLong(2)).toMap
      val truth = df.groupBy(col("g"), col("v")).count()
        .collect().map(r => (r.getInt(0), r.getString(1)) -> r.getLong(2)).toMap
      assert(got == truth, s"reps=$reps autoK=$k diverged from GROUP BY")
    }
  }

  test("works per group (one summary per key)") {
    import spark.implicits._
    // "a" count (~333 per group) must be strictly above n/(k+1) = 200
    // or the MG guarantee doesn't cover it
    val df = (1 to 2000).map(i => (i % 2, if (i % 3 == 0) "a" else s"x$i"))
      .toDF("g", "v")
    val rows = df.groupBy(col("g")).agg(HeavyHitters(col("v"), 4).as("hh"))
      .collect()
    assert(rows.length == 2)
    rows.foreach(r => assert(r.getAs[Map[String, Long]]("hh").contains("a")))
  }
}
