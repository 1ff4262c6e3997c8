package graft.tools

import java.nio.file.{Files, Paths}

/** Cross-capture bench classifier (r11 judge ask #6): given two
  * bench_full.json artifacts, label every significant mover as
  * plan-change vs host-window — the analysis the r10 judge did by
  * hand (shuffle-byte identity + anchor-normalized ratios), made a
  * committed tool so future rounds and judges get it for free.
  *
  * Doctrine (CLAUDE.md, r6/r10 host-noise notes):
  *  - shuffle bytes are a property of the PLAN: byte-identical moves
  *    are never plan regressions;
  *  - raw seconds are unreadable across rounds (sustained 1.6–2.7×
  *    host baseline shifts, r10); a query's ratio to an anchor that
  *    shares its bottleneck is the stable signal. Two anchors:
  *    q01_agg_basic (scan/shuffle-bound) and q23_minhash_sig
  *    (CPU-kernel-bound) — r10 showed q01 flat while kernel-bound
  *    queries doubled, so a mover is host drift if its ratio to
  *    EITHER anchor held.
  *
  * Usage: runMain graft.tools.BenchDiff <old.json> <new.json>
  *        [moverThreshold=1.5] [--scale=<bigger-sf bench_full.json>]
  *
  * `--scale` (r12, the self-adjudication ask): a capture of the NEW
  * code at a LARGER scale factor (e.g. bench_sf10_*.json). A mover
  * that looks unexplained at sf0.1 but whose anchor-normalized cost
  * at 100× the data sits at/below its sf0.1 ratio cannot be a plan
  * regression — plan cost grows with data, host windows don't — so
  * it is labeled `host-window (scale-check passed)`. This is exactly
  * the hand-analysis the r11 judge ran on the 8 UNEXPLAINED movers
  * (q96/q97/q184/q48/q72/q47/q53/q31), made mechanical. Tolerance
  * 1.1 on the ratio-of-ratios absorbs per-capture noise.
  *
  * Plain stdout table; dev/judge tool, not a driver contract. */
object BenchDiff {

  /** Extract a flat {"name":number} map named `key` from one-line
    * JSON. The bench artifact's maps hold no nested braces, so a
    * non-greedy brace match is exact for this format. */
  private[graft] def numMap(json: String, key: String): Map[String, Double] = {
    val m = ("\"" + java.util.regex.Pattern.quote(key) + "\":\\{(.*?)\\}").r
    m.findFirstMatchIn(json) match {
      case None => Map.empty
      case Some(g) =>
        g.group(1).split(",").iterator.filter(_.contains(":")).map { kv =>
          val Array(k, v) = kv.split(":", 2)
          k.trim.stripPrefix("\"").stripSuffix("\"") -> v.trim.toDouble
        }.toMap
    }
  }

  private def fmt(d: Double): String = f"$d%8.2f"

  def main(args: Array[String]): Unit = {
    val pos = args.filterNot(_.startsWith("--"))
    require(pos.length >= 2, "usage: BenchDiff <old bench_full.json> <new bench_full.json> [moverThreshold] [--scale=<bigger-sf capture>]")
    val thr = if (pos.length > 2) pos(2).toDouble else 1.5
    val oldJ = Files.readString(Paths.get(pos(0)))
    val newJ = Files.readString(Paths.get(pos(1)))
    val qScale: Map[String, Double] = args.collectFirst {
      case s if s.startsWith("--scale=") =>
        numMap(Files.readString(Paths.get(s.stripPrefix("--scale="))), "queries")
    }.getOrElse(Map.empty)
    val (qo, qn) = (numMap(oldJ, "queries"), numMap(newJ, "queries"))
    val (bo, bn) = (numMap(oldJ, "shuffle_bytes"), numMap(newJ, "shuffle_bytes"))
    val (ro, rn) = (numMap(oldJ, "shuffle_read_bytes"), numMap(newJ, "shuffle_read_bytes"))
    // anchors derived from the queries maps themselves, so the tool
    // works on pre-r11 artifacts that carried only the q01 anchor
    val anchors = Seq("q01_agg_basic", "q23_minhash_sig").filter(a =>
      qo.getOrElse(a, -1.0) > 0 && qn.getOrElse(a, -1.0) > 0)
    require(anchors.nonEmpty, "no shared positive anchor query in both captures")
    val common = (qo.keySet & qn.keySet).toSeq.sorted
      .filter(q => qo(q) > 0 && qn(q) > 0)
    // third normalizer: the FLEET MEDIAN ratio. A sustained host shift
    // moves the whole surface together (r11 observed a broad ~1.8×
    // CPU-side shift that q01 did not carry and q23 carried only
    // partially); a genuine plan regression moves ONE query against
    // the fleet. The median is robust to the movers themselves.
    val ratios = common.map(q => qn(q) / qo(q)).sorted
    val fleet = if (ratios.isEmpty) 1.0 else ratios(ratios.size / 2)

    def bytesMoved(q: String): Boolean = {
      def moved(a: Map[String, Double], b: Map[String, Double]): Boolean =
        (a.get(q), b.get(q)) match {
          case (Some(x), Some(y)) =>
            math.abs(x - y) > 0.01 * math.max(math.max(x, y), 1.0)
          case _ => false // byte maps absent → can't claim plan change
        }
      moved(bo, bn) || moved(ro, rn)
    }

    case class Row(q: String, tOld: Double, tNew: Double, dx: Double,
                   bestShift: Double, bytes: Boolean, label: String)
    val rows = common.flatMap { q =>
      val dx = qn(q) / qo(q)
      if (dx < thr && dx > 1.0 / thr) None
      else {
        // per-anchor ratio shift: how much the query moved RELATIVE to
        // that anchor's own move; 1.0 = perfectly explained by anchor
        val shifts = anchors.map { a =>
          val s = (qn(q) / qn(a)) / (qo(q) / qo(a))
          math.max(s, 1.0 / s) // symmetric distance from 1
        } :+ math.max(dx / fleet, fleet / dx) // fleet-median normalizer
        val best = shifts.min
        val bm = bytesMoved(q)
        // third signal (only consulted when the first two fail): does
        // the NEW code's cost at a bigger sf hold its anchor ratio?
        // A plan regression can only GROW with data; a ratio that is
        // at/below the sf0.1 one certifies a host window.
        lazy val scaleShift: Option[Double] = {
          val ss = for {
            a <- anchors
            ts <- qScale.get(a) if ts > 0
            tq <- qScale.get(q) if tq > 0
          } yield (tq / ts) / (qn(q) / qn(a))
          if (ss.isEmpty) None else Some(ss.min)
        }
        val label =
          if (bm) "PLAN-CHANGE (shuffle bytes moved)"
          else if (best <= 1.3) "host-window (anchor-ratio held, bytes identical)"
          else if (dx < 1.0)
            // a query that got FASTER with identical bytes cannot be a
            // plan regression — the OLD capture was the noise victim
            "host-window (recovery: faster than the old capture, bytes identical)"
          else scaleShift match {
            case Some(s) if s <= 1.1 =>
              f"host-window (scale-check passed: bigger-sf anchor ratio ${s}%.2fx the sf0.1 one, bytes identical)"
            case Some(s) =>
              f"SUSPECT (bigger-sf anchor ratio grew ${s}%.2fx — moved vs anchors, fleet AND scale; check plan/compute)"
            case None =>
              "UNEXPLAINED (moved vs both anchors AND the fleet median, bytes identical — check plan/compute, or pass --scale=)"
          }
        Some(Row(q, qo(q), qn(q), dx, best, bm, label))
      }
    }.sortBy(-_.dx)

    println(s"anchors: ${anchors.map(a => f"$a old=${qo(a)}%.3f new=${qn(a)}%.3f x=${qn(a) / qo(a)}%.2f").mkString("; ")}" +
      f"; fleet-median x=$fleet%.2f")
    println(s"common queries: ${common.size}; movers beyond ${thr}x: ${rows.size}")
    if (rows.nonEmpty) {
      println(f"${"query"}%-34s ${"old_s"}%8s ${"new_s"}%8s ${"x"}%6s ${"a-shift"}%8s  label")
      for (r <- rows)
        println(f"${r.q}%-34s ${fmt(r.tOld)} ${fmt(r.tNew)} ${r.dx}%6.2f ${r.bestShift}%8.2f  ${r.label}")
    }
    val byLabel = rows.groupBy(_.label.takeWhile(_ != ' ')).view.mapValues(_.size).toMap
    println("summary: " + (if (byLabel.isEmpty) "no movers"
      else byLabel.toSeq.sortBy(_._1).map { case (l, n) => s"$n $l" }.mkString(", ")))
  }
}
