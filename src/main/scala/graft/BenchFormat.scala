package graft

/** Renderer for the ONE compact JSON line Bench prints to stdout.
  *
  * The grading driver keeps only the LAST 2000 chars of combined
  * output and parses a JSON line out of it; sbt appends a trailing
  * "[success] ..." line (~70 chars), so the compact line must stay
  * ≤ 1800 chars NO MATTER how many queries exist or what values they
  * produce. That is a hard contract (r1–r7 shipped no parsed bench at
  * all because the full-width line was 3–20 KB), so the rendering
  * lives here as pure functions with a spec (BenchFormatSpec) that
  * pins the bound at the LIVE query count and under adversarial
  * values — adding queries can never silently overflow the window
  * again.
  *
  * Tier chain, first rendering that fits wins:
  *   (2 dec, all)       full 2-decimal map (full ms precision always
  *                      lives in bench_full.json);
  *   (1 dec, all)       full 1-decimal map;
  *   (1 dec, ≥ thr)     1-decimal map with entries BELOW an
  *                      escalating threshold (0.05 → 0.75 s) omitted;
  *                      the omitted count rides as "q_zero" and the
  *                      threshold as "q_lt". Added in r13: at 232
  *                      queries the old chain fell through to the
  *                      0-decimal tiers, whose integer seconds made
  *                      every 1 s↔2 s host wobble read as a 2×/0.5×
  *                      step in the driver's round-over-round diff
  *                      (8 of r12's 12 flagged regressions were this
  *                      quantization). Sub-second resolution on every
  *                      kept entry is worth omitting the tail that the
  *                      0-decimal tier rendered as "0" anyway.
  *   (0 dec, all)       full 0-decimal map;
  *   (0 dec, ≥ thr)     0-decimal, entries below 0.5 / 1.5 / 2.5 /
  *                      4.5 s omitted (the 0.5 step is the old
  *                      zeros-omitted tier: at 0 decimals they
  *                      rendered "0");
  *   no-queries         the queries map is dropped entirely
  *                      ("q_count" rides instead), failed/flaky lists
  *                      are truncated with _count fields — this tier
  *                      is O(1)-bounded, so the chain terminates under
  *                      ANY input.
  */
object BenchFormat {
  /** Hard cap for the compact stdout line (driver tail 2000 minus
    * sbt's trailing success line). */
  val MaxLen = 1800

  /** (decimals, omitBelow): entries with 0 ≤ value < omitBelow are
    * omitted from the map and counted in "q_zero" (failed entries,
    * value < 0, are never omitted — they render "-1"). The final
    * sentinel (-1, 0.0) is the no-queries-map tier. */
  private val tiers: Seq[(Int, Double)] = Seq(
    (2, 0.0), (1, 0.0),
    (1, 0.05), (1, 0.15), (1, 0.25), (1, 0.35), (1, 0.45),
    (1, 0.55), (1, 0.65), (1, 0.75),
    (0, 0.0), (0, 0.5), (0, 1.5), (0, 2.5), (0, 4.5),
    (-1, 0.0))

  private def fmt(v: Double, decimals: Int): String =
    if (v < 0) "-1"
    else s"%.${decimals}f".formatLocal(java.util.Locale.ROOT, v)

  /** Unique-prefix short id: "q55_ngram_jaccard" → "q55" unless two
    * query names share the prefix (then full names are used). */
  private def sidFn(names: Seq[String]): String => String = {
    val short = names.map(_.takeWhile(_ != '_'))
    if (short.distinct.size == names.size) (n: String) => n.takeWhile(_ != '_')
    else identity
  }

  /** One tier. `decimals` ≥ 0 renders the map (omitting entries below
    * `omitBelow`); decimals = -1 drops the map entirely. */
  private def render(decimals: Int, omitBelow: Double,
                     results: Seq[(String, Double)],
                     failed: Seq[String],
                     flaky: Seq[(String, Int)],
                     totalStr: String, mode: String, passes: Int,
                     full: String, sf: String): String = {
    val sid = sidFn(results.map(_._1))
    val noMap = decimals < 0
    val qPart =
      if (noMap) s""""q_count":${results.size}"""
      else {
        val (kept, dropped) = results.partition {
          case (_, v) => v < 0 || v >= omitBelow
        }
        val m = kept.map { case (n, v) => "\"" + sid(n) + "\":" + fmt(v, decimals) }
          .mkString("{", ",", "}")
        val zeros =
          if (omitBelow > 0)
            s""","q_zero":${dropped.size},"q_lt":${fmt(omitBelow, 2)}"""
          else ""
        s""""queries":$m$zeros"""
      }
    val (failedPart, flakyPart) =
      if (noMap) {
        val f = failed.take(20).map("\"" + sid(_) + "\"").mkString("[", ",", "]")
        (s""""failed":$f,"failed_count":${failed.size}""",
          s""""flaky_count":${flaky.size}""")
      } else {
        val f = failed.map("\"" + sid(_) + "\"").mkString("[", ",", "]")
        val fl = flaky.map { case (n, c) => "\"" + sid(n) + "\":" + c }
          .mkString("{", ",", "}")
        (s""""failed":$f""", s""""flaky_passes":$fl""")
      }
    s"""{"metric":"total","value":$totalStr,"unit":"sec",$qPart,$failedPart,$flakyPart,"mode":"$mode","passes":$passes,"full":"$full","sf":"$sf"}"""
  }

  /** The compact line: first tier that fits [[MaxLen]]. The final
    * tier is constant-bounded, so the result always fits for any sane
    * `full`/`sf` paths (both are env-controlled short paths). */
  def compactLine(results: Seq[(String, Double)],
                  failed: Seq[String],
                  flaky: Seq[(String, Int)],
                  totalStr: String, mode: String, passes: Int,
                  full: String, sf: String): String =
    tiers.iterator
      .map { case (d, t) =>
        render(d, t, results, failed, flaky, totalStr, mode, passes, full, sf) }
      .find(_.length <= MaxLen)
      .getOrElse(render(-1, 0.0, results, failed, flaky, totalStr, mode, passes, full, sf))
}
