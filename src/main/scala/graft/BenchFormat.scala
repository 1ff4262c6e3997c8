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
  *   2 → 1 → 0      decimals on per-query seconds (full ms precision
  *                  always lives in bench_full.json);
  *   zeros-omitted  0 decimals, entries that render "0" are dropped
  *                  and ride as a "q_zero" count (at 0 decimals most
  *                  sub-half-second queries carry no information the
  *                  headline doesn't);
  *   no-queries     the queries map is dropped entirely ("q_count"
  *                  rides instead), failed/flaky lists are truncated
  *                  with _count fields — this tier is O(1)-bounded,
  *                  so the chain terminates under ANY input.
  */
object BenchFormat {
  /** Hard cap for the compact stdout line (driver tail 2000 minus
    * sbt's trailing success line). */
  val MaxLen = 1800

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

  /** One tier. `tier` ≥ 0 = decimals; -1 = zeros omitted; -2 = no
    * queries map. `totalStr`/`mode`/... are pre-rendered scalars. */
  private def render(tier: Int,
                     results: Seq[(String, Double)],
                     failed: Seq[String],
                     flaky: Seq[(String, Int)],
                     totalStr: String, mode: String, passes: Int,
                     full: String, sf: String): String = {
    val sid = sidFn(results.map(_._1))
    val decimals = math.max(tier, 0)
    val (entries, dropped) = {
      val all = results.map { case (n, v) => (sid(n), fmt(v, decimals)) }
      if (tier == -1) all.partition(_._2 != "0")
      else if (tier == -2) (Nil, all)
      else (all, Nil)
    }
    val qPart =
      if (tier == -2) s""""q_count":${results.size}"""
      else {
        val m = entries.map { case (k, v) => "\"" + k + "\":" + v }
          .mkString("{", ",", "}")
        val zeros = if (tier == -1) s""","q_zero":${dropped.size}""" else ""
        s""""queries":$m$zeros"""
      }
    val (failedPart, flakyPart) =
      if (tier == -2) {
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

  /** The compact line: first tier that fits [[MaxLen]]. The -2 tier
    * is constant-bounded, so the result always fits for any sane
    * `full`/`sf` paths (both are env-controlled short paths). */
  def compactLine(results: Seq[(String, Double)],
                  failed: Seq[String],
                  flaky: Seq[(String, Int)],
                  totalStr: String, mode: String, passes: Int,
                  full: String, sf: String): String =
    Iterator(2, 1, 0, -1, -2)
      .map(render(_, results, failed, flaky, totalStr, mode, passes, full, sf))
      .find(_.length <= MaxLen)
      .getOrElse(render(-2, results, failed, flaky, totalStr, mode, passes, full, sf))
}
