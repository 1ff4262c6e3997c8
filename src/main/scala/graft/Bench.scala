package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      // explicit (defaults can change between Spark versions): AQE
      // re-plans at runtime and splits skewed join partitions — the
      // guard for a hot l_orderkey in the q09-style star joins at scale
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warmup: JVM/codegen/parquet-footer init paid outside the timings
    // (otherwise the first query measured absorbs ~5 s of session setup)
    try SparkEntry.queries("q01_agg_basic")(spark, sfDir).foreach(_ => ())
    catch { case _: Throwable => () }
    // SPARK_GRAFT_ONLY=q55,q24 restricts the run (targeted timing)
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val selected = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(o => o.exists(n.startsWith)) }
    // SPARK_GRAFT_ISOLATED=1: per-query isolation — an untimed warm
    // pass (plan compile + codegen + JIT) then a GC barrier before the
    // timed run. Session mode (the default, what the driver runs)
    // measures queries back-to-back, so a query's number absorbs GC
    // debt and JIT state from its predecessors — fine for a total,
    // misleading for round-over-round per-query deltas (q56/q59 moved
    // ±30-80% in r4 with byte-identical code). Isolated numbers are
    // the ones to compare across rounds.
    val isolated = sys.env.get("SPARK_GRAFT_ISOLATED")
      .exists(v => v == "1" || v.equalsIgnoreCase("true"))
    def run(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame,
            name: String): Boolean =
      try { fn(spark, sfDir).foreach(_ => ()); true }
      catch { case e: Throwable =>
        System.err.println(s"[bench] $name FAILED: ${e.getClass.getName}: ${e.getMessage}")
        false }
    val results = selected.map { case (name, fn) =>
      val warmOk = !isolated || {
        val ok = run(fn, name)
        System.gc(); Thread.sleep(100)
        ok
      }
      val t0 = System.nanoTime()
      // foreach forces FULL evaluation of every output column —
      // count() would let Catalyst prune the per-row compute of
      // projection-only queries and overstate throughput.
      // A failed query reports -1, never its (near-zero) elapsed time.
      val ok = warmOk && run(fn, name)
      name -> (if (ok) (System.nanoTime() - t0) / 1e9 else -1.0)
    }
    // millisecond precision keeps the one-line JSON compact — round
    // 3's driver capture truncated the tail of the full-width floats
    def ms(v: Double): String =
      if (v < 0) "-1" else "%.3f".formatLocal(java.util.Locale.ROOT, v)
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + ms(v) }
      .mkString("{", ",", "}")
    val failed = results.filter(_._2 < 0).map(_._1)
    val total = results.collect { case (_, v) if v >= 0 => v }.sum
    val failedJson = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    val mode = if (isolated) "isolated" else "session"
    val json = s"""{"metric":"total","value":${ms(total)},"unit":"sec","queries":$qs,"failed":$failedJson,"mode":"$mode","sf":"$sfDir"}"""
    println(json)
    // also persist the full line — the driver's stdout capture has
    // truncated the JSON head/tail two rounds running
    val out = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_full.json")
    try java.nio.file.Files.write(java.nio.file.Paths.get(out),
      (json + "\n").getBytes("UTF-8"))
    catch { case e: Throwable =>
      System.err.println(s"[bench] could not write $out: ${e.getMessage}") }
    spark.stop()
  }
}
