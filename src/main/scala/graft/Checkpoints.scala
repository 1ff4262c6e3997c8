package graft

import org.apache.spark.sql.DataFrame

/** Lineage-cut points for reused derived subtrees (the
  * derived-subtree-reuse doctrine: any collapse/rep table feeding ≥2
  * plan references gets cut so Spark does not re-run the corpus-wide
  * window/groupBy per reference) and for iterative loops (connected
  * components, BPE, k-means — lineage doubles per round otherwise).
  *
  * DEFAULT: `localCheckpoint` — executor-local block storage, no
  * distributed filesystem round-trip; the right call on local[32] and
  * the fastest on a healthy cluster. Its known cost: blocks live only
  * on the executors that computed them, so an EXECUTOR LOSS makes the
  * cut subtree unrecoverable (Spark fails the job rather than
  * recompute, because lineage was truncated).
  *
  * Set the session conf `graft.checkpoint.dir` to a fault-tolerant
  * path (HDFS/S3) and every cut point switches to reliable
  * `checkpoint()` files under it — the 1000-executor setting where a
  * multi-hour pipeline must survive preemptions and the re-read from
  * the DFS is cheaper than re-running the job. Laziness is preserved
  * either way (a lazy cut materializes on first action, exactly when
  * the first of the ≥2 references runs). DedupApiSpec pins that both
  * modes produce identical results on the dedup family.
  */
object Checkpoints {
  // the conf value the SparkContext checkpoint dir was last set from:
  // setCheckpointDir appends a UUID subdir and qualifies the scheme,
  // so the conf string can't be compared against getCheckpointDir —
  // without this, changing graft.checkpoint.dir mid-session would be
  // silently ignored and files would keep landing in the old dir
  @volatile private var appliedDir: Option[String] = None

  implicit final class CutOps(private val df: DataFrame) extends AnyVal {
    /** Cut lineage here: reliable `checkpoint(eager)` under
      * `graft.checkpoint.dir` when that conf is set, else
      * `localCheckpoint(eager)`. */
    def cut(eager: Boolean = false): DataFrame = {
      val spark = df.sparkSession
      spark.conf.getOption("graft.checkpoint.dir").filter(_.nonEmpty) match {
        case Some(dir) =>
          val sc = spark.sparkContext
          if (sc.getCheckpointDir.isEmpty || !appliedDir.contains(dir)) {
            sc.setCheckpointDir(dir)
            appliedDir = Some(dir)
          }
          df.checkpoint(eager)
        case None => df.localCheckpoint(eager)
      }
    }
  }
}
