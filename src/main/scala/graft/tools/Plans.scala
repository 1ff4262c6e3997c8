package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Dev tool (not part of the driver contract): dump
  * `explain("formatted")` for every declared query — the judge-facing
  * plan evidence under plans/r12/. Mirrors Bench's session config so
  * the captured plans are the benched plans (AQE initial plan; the
  * runtime-re-optimized plan is what executes, but Exchange count,
  * join strategy and PushedFilters are decided here).
  *
  * Usage: SPARK_GRAFT_SF_DIR=… SPARK_GRAFT_CPUS=32 \
  *   sbt "runMain graft.tools.Plans <outDir> [suffix] [q24,q55,…]"
  * Writes <outDir>/<query>_<suffix>.txt (suffix default "before").
  */
object Plans {
  def main(args: Array[String]): Unit = {
    val outDir = if (args.nonEmpty) args(0) else "plans/r12"
    val suffix = if (args.length > 1) args(1) else "before"
    val only = if (args.length > 2)
      Some(args(2).split(",").map(_.trim).filter(_.nonEmpty).toSet)
    else None
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Files.createDirectories(Paths.get(outDir))
    val selected = graft.SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(o => o.exists(n.startsWith)) }
    // failures are counted and exit nonzero (r13, advisor ask): a
    // scripted capture must not silently produce an empty plans/ dir
    var failures = 0
    for ((name, fn) <- selected) {
      try {
        val df = fn(spark, sfDir)
        // queryExecution.explainString == df.explain("formatted") text
        val txt = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        Files.write(Paths.get(outDir, s"${name}_$suffix.txt"),
          txt.getBytes("UTF-8"))
        println(s"[plans] wrote $name")
      } catch { case scala.util.control.NonFatal(e) =>
        failures += 1
        System.err.println(s"[plans] $name FAILED: ${e.getMessage}")
      }
    }
    println(s"[plans] ${selected.size - failures}/${selected.size} written, $failures failed")
    spark.stop()
    if (failures > 0) sys.exit(1)
  }
}
