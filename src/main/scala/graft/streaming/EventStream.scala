package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming event analytics — the ingest-side face of the q128
  * rolling-active-users gate. The batch formulation (explode each
  * (day, user) observation into its `windowDays` target days, then
  * count DISTINCT users per target day) maps onto Structured
  * Streaming's two supported stateful primitives directly:
  * `dropDuplicates` carries the DISTINCT (state = one row per live
  * (target_day, user) pair, bounded by days × users) and a plain
  * count aggregate carries the rollup — no unsupported streaming
  * `count(DISTINCT)` anywhere.
  *
  * Production note: cap state with `withWatermark` on the event time
  * before the dedup so closed days age out; the parity spec runs
  * complete-mode without a watermark because the fixture replays a
  * bounded corpus.
  */
object EventStream {

  /** Distinct active users per day over a trailing `windowDays`
    * window: `windowDays = 1` is DAU, `7` the q128 WAU. Emits
    * (day, active) with day = integer offset from 2024-01-01 (the
    * q11/q128 pinned-UTC convention). Target days beyond the
    * observed range are emitted too (the stream cannot know the
    * future); the batch gate's observed-days filter is applied by
    * the consumer. */
  def activeUsersStream(events: DataFrame, windowDays: Int): DataFrame = {
    require(windowDays >= 1, s"windowDays out of range: $windowDays")
    events
      .select(datediff(to_date(col("ts")), lit("2024-01-01")).as("d"),
        col("user_id"))
      .select(explode(expr(s"sequence(d, d + ${windowDays - 1})")).as("day"),
        col("user_id"))
      .dropDuplicates("day", "user_id")
      .groupBy(col("day"))
      .agg(count(lit(1)).as("active"))
      .select(col("day").cast("long").as("day"), col("active"))
  }

  /** Per-user first-touch funnel mins — the q129 per-user stage as a
    * single streaming aggregate (complete/update mode; conditional
    * `min` is order- and retraction-free, so late data only ever
    * tightens a min). The final 3-row conversion rollup is the
    * consumer's batch step over the emitted table — a SECOND chained
    * streaming aggregate is unsupported, and the rollup is 3 rows.
    * State: one (tv, tc, tp) triple per user — O(users). */
  def funnelMinsStream(events: DataFrame): DataFrame =
    events.groupBy(col("user_id"))
      .agg(min(when(col("event_type") === "view", col("ts"))).as("tv"),
        min(when(col("event_type") === "click", col("ts"))).as("tc"),
        min(when(col("event_type") === "purchase", col("ts"))).as("tp"))

  /** Typed ingest row for the stateful per-user timelines (epoch
    * seconds, the q131/q132 arithmetic domain). */
  final case class UserSec(user_id: Long, sec: Long)

  /** Running per-user gap statistics (public: state encoder codegen
    * constructs it). `has` = a prior event exists — an explicit flag,
    * not a Long sentinel, so no legitimate epoch value can collide
    * with "no prior event". */
  final case class GapState(has: Boolean, last: Long, n: Long, s: Long, s2: Long)

  /** q132's row, emitted per user per micro-batch (update semantics:
    * the latest emission per user is the current verdict). */
  final case class BeaconRow(user_id: Long, n_gaps: Long, sum_gap: Long,
                             sum_gap2: Long, cv2_ppm: Long, is_beacon: Boolean)

  /** Streaming beacon-regularity stats — the q132 gate as an ingest:
    * per-user inter-arrival gap sums accumulate in O(1) state
    * (last_sec, n, Σd, Σd²) via flatMapGroupsWithState; each batch
    * re-emits the user's current CV² verdict through the same
    * BigInt cross-multiplication the gate's oracle uses (the hmodJvm
    * bit-mirror doctrine). Contract (DedupStream's ordered-ingest
    * rule): per-user event times arrive non-decreasing across
    * batches; in-batch rows are sorted before folding. */
  def beaconStatsStream(events: Dataset[UserSec]): Dataset[BeaconRow] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[GapState, BeaconRow](
        OutputMode.Update, GroupStateTimeout.NoTimeout) { (uid, evs, state) =>
        var st = state.getOption.getOrElse(GapState(has = false, 0L, 0L, 0L, 0L))
        for (e <- evs.toSeq.sortBy(_.sec)) {
          if (st.has) {
            val d = e.sec - st.last
            st = GapState(has = true, e.sec, st.n + 1, st.s + d, st.s2 + d * d)
          } else st = GapState(has = true, e.sec, 0L, 0L, 0L)
        }
        state.update(st)
        if (st.n > 0) {
          val num = BigInt(st.n) * st.s2 - BigInt(st.s) * st.s
          val den = BigInt(st.s) * st.s
          // den == 0 ⇔ every gap so far is 0 (all events in one epoch
          // second) ⇒ num = n·Σd² = 0 too: perfect regularity, CV² = 0.
          // Emit (0, true) instead of dividing 0/0 and killing the query
          // — the one early-ingest state the batch gate never sees.
          if (den == 0)
            Iterator(BeaconRow(uid, st.n, st.s, st.s2, 0L, is_beacon = true))
          else
            Iterator(BeaconRow(uid, st.n, st.s, st.s2,
              (BigInt(1000000) * num / den).toLong, num * 4 <= den * 3))
        } else Iterator.empty
      }
  }

  /** Per-user session fold state (public for encoder codegen):
    * `has` = a session is open, `last` = its last event second,
    * `openN` = its event count, `closed`/`nEv`/`maxClosed` = the
    * running card over closed sessions. O(1) per user. */
  final case class SessState(has: Boolean, last: Long, openN: Long,
                             closed: Long, nEv: Long, maxClosed: Long)

  /** q186's per-user row, emitted per micro-batch (update semantics:
    * the latest emission per user is the current card). */
  final case class SessionCard(user_id: Long, n_sessions: Long,
                               n_events: Long, max_sess_events: Long,
                               mean_len_ppm: Long)

  /** Streaming session-stats card — the q186 gate as an ingest (the
    * r9 verdict's item 6): the same gap>1800s boundary rule the batch
    * lag-window uses, folded into O(1) per-user state via
    * flatMapGroupsWithState; each batch re-emits the user's current
    * card COUNTING the open session (exactly the batch semantics —
    * q186's last session per user is open-ended too), so after full
    * ingest the final snapshot per user ≡ the gate row with no
    * flush/timeout choreography. Contract (DedupStream's
    * ordered-ingest rule): per-user event times arrive non-decreasing
    * across batches; in-batch rows are sorted before folding.
    * Same-second ties are order-independent — gap 0 never opens a
    * boundary, the batch query's own tie argument. */
  def sessionStatsStream(events: Dataset[UserSec],
                         gapSec: Long = 1800L): Dataset[SessionCard] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[SessState, SessionCard](
        OutputMode.Update, GroupStateTimeout.NoTimeout) { (uid, evs, state) =>
        var st = state.getOption
          .getOrElse(SessState(has = false, 0L, 0L, 0L, 0L, 0L))
        for (e <- evs.toSeq.sortBy(_.sec)) {
          if (!st.has) st = SessState(has = true, e.sec, 1L, 0L, 1L, 0L)
          else if (e.sec - st.last <= gapSec)
            st = st.copy(last = e.sec, openN = st.openN + 1L, nEv = st.nEv + 1L)
          else // quiet > gap: close the open session, start a new one
            st = SessState(has = true, e.sec, 1L, st.closed + 1L,
              st.nEv + 1L, math.max(st.maxClosed, st.openN))
        }
        state.update(st)
        if (st.nEv > 0L) {
          val nSess = st.closed + 1L // the open session counts
          Iterator(SessionCard(uid, nSess, st.nEv,
            math.max(st.maxClosed, st.openN), 1000000L * st.nEv / nSess))
        } else Iterator.empty
      }
  }

  /** EWMA state per entity: −1 sentinel = no baseline yet (public for
    * encoder codegen). */
  final case class EwmaState(r: Long)

  /** Streaming EWMA — the q141 gate as an ingest of per-(type, hour)
    * count rows (the shape a metrics pipeline emits): per event type
    * one O(1) state scalar folds r' = ⌊(3·1000·x + 7·r)/10⌋ in the
    * gate's exact integer arithmetic, each input row emitting its
    * (hr, cnt, ewma_milli, spike) verdict exactly once — so the union
    * of emissions across micro-batches equals the batch trajectory
    * row-for-row. Ordered-ingest contract (the DedupStream rule):
    * per-type hours arrive non-decreasing across batches; in-batch
    * rows are sorted before folding. */
  def ewmaStream(hourly: Dataset[graft.queries.Temporal.HourCount])
      : Dataset[graft.queries.Temporal.EwmaRow] = {
    val spark = hourly.sparkSession
    import spark.implicits._
    hourly.groupByKey(_.event_type)
      .flatMapGroupsWithState[EwmaState, graft.queries.Temporal.EwmaRow](
        OutputMode.Update, GroupStateTimeout.NoTimeout) { (k, it, state) =>
        var r = state.getOption.map(_.r).getOrElse(-1L)
        val out = it.toSeq.sortBy(_.hr).map { h =>
          val x = h.cnt * 1000L
          val spike = r >= 0L && h.cnt * 10000L > 25L * r
          r = if (r < 0L) x else (3L * x + 7L * r) / 10L
          graft.queries.Temporal.EwmaRow(k, h.hr, h.cnt, r, spike)
        }
        state.update(EwmaState(r))
        out.iterator
      }
  }

  /** Holt (level, trend) state per entity: `has` = seeded (public
    * for encoder codegen — trend can legitimately be any Long, so no
    * sentinel value encodes "unseeded"). */
  final case class HoltState(has: Boolean, l: Long, b: Long)

  /** Streaming Holt linear trend — the q190 gate as an ingest of
    * per-(type, hour) count rows: per event type an O(1) (level,
    * trend) state folds the gate's exact truncating-division
    * recurrences (Temporal.holtHourly), each input row emitting its
    * trajectory verdict exactly once — the union of emissions across
    * micro-batches equals the batch trajectory row-for-row (the
    * ewmaStream contract). Ordered-ingest: per-type hours arrive
    * non-decreasing across batches; in-batch rows sorted first. */
  def holtStream(hourly: Dataset[graft.queries.Temporal.HourCount])
      : Dataset[graft.queries.Temporal.HoltRow] = {
    val spark = hourly.sparkSession
    import spark.implicits._
    hourly.groupByKey(_.event_type)
      .flatMapGroupsWithState[HoltState, graft.queries.Temporal.HoltRow](
        OutputMode.Update, GroupStateTimeout.NoTimeout) { (k, it, state) =>
        var st = state.getOption.getOrElse(HoltState(has = false, 0L, 0L))
        val out = it.toSeq.sortBy(_.hr).map { h =>
          if (!st.has) {
            st = HoltState(has = true, h.cnt * 1000L, 0L)
            graft.queries.Temporal.HoltRow(k, h.hr, h.cnt, st.l, 0L, spike = false)
          } else {
            val f = st.l + st.b
            val spike = f > 0L && h.cnt * 10000L > 25L * f
            val l2 = (3L * h.cnt * 1000L + 7L * f) / 10L
            st = HoltState(has = true, l2, (2L * (l2 - st.l) + 8L * st.b) / 10L)
            graft.queries.Temporal.HoltRow(k, h.hr, h.cnt, st.l, st.b, spike)
          }
        }
        state.update(st)
        out.iterator
      }
  }

  /** CUSUM state per entity (public for encoder codegen). */
  final case class CusumState(s: Long, peak: Long, peakHr: Long,
                              flags: Long, firstFlag: Long)

  /** One emitted CUSUM step: the running statistic + flag per ingested
    * hour-count row. */
  final case class CusumStep(event_type: String, hr: Long, cnt: Long,
                             s: Long, flagged: Boolean)

  /** Streaming CUSUM — q159's fold as an ingest, under the PINNED-
    * MODEL contract (the q109/q114/q120 streaming rule): the per-type
    * (n, S) normalizers come from a batch pre-pass over the training
    * window and enter as a broadcast-sized Map closure — CUSUM's mean
    * is a whole-window statistic, so the model is pinned, not learned
    * in-stream. Per type one O(1) state tuple folds s' = max(0, s +
    * (n·x − S) − ⌊S/4⌋) in the gate's exact arithmetic, each input
    * row emitting its (hr, cnt, s, flagged) step exactly once —
    * emissions across micro-batches equal the batch trajectory
    * row-for-row, and the final card replays from the last state.
    * Ordered-ingest contract (the DedupStream rule); types absent
    * from the model pass through un-scored (emit nothing). */
  def cusumStream(hourly: Dataset[graft.queries.Temporal.HourCount],
                  model: Map[String, (Long, Long)])
      : Dataset[CusumStep] = {
    val spark = hourly.sparkSession
    import spark.implicits._
    hourly.groupByKey(_.event_type)
      .flatMapGroupsWithState[CusumState, CusumStep](
        OutputMode.Update, GroupStateTimeout.NoTimeout) { (k, it, state) =>
        model.get(k) match {
          case None => Iterator.empty
          case Some((n, total)) =>
            var st = state.getOption.getOrElse(
              CusumState(0L, 0L, -1L, 0L, -1L))
            val out = it.toSeq.sortBy(_.hr).map { h =>
              val s = math.max(0L, st.s + (n * h.cnt - total) - total / 4L)
              val flagged = s >= 3L * total
              st = CusumState(s,
                if (s > st.peak) s else st.peak,
                if (s > st.peak) h.hr else st.peakHr,
                st.flags + (if (flagged) 1L else 0L),
                if (flagged && st.firstFlag < 0L) h.hr else st.firstFlag)
              CusumStep(k, h.hr, h.cnt, s, flagged)
            }
            state.update(st)
            out.iterator
        }
      }
  }

  /** Ingest row for the profile stream (public: encoder codegen). */
  final case class UserHod(user_id: Long, hod: Long)

  /** 24-bin hour-of-day profile state (public: encoder codegen). */
  final case class ProfileState(bins: Seq[Long])

  /** One emitted profile snapshot: the user's event count and TVD vs
    * the pinned global profile after this micro-batch. */
  final case class ProfileRow(user_id: Long, n_events: Long, tvd_ppm: Long)

  /** Streaming activity-profile deviation — q171's detector as an
    * ingest under the PINNED-MODEL contract (the cusumStream rule:
    * the global profile is a whole-corpus statistic, so it comes from
    * a batch pre-pass as a 24-entry closure + the N scalar): per user
    * a bounded 24-bin state folds arriving hour-of-day rows and emits
    * the running (n_events, tvd_ppm) snapshot each batch — update
    * mode, monotone n_events, so the consumer keeps the latest row
    * per user; after full ingest the snapshot equals q171's per-user
    * TVD exactly (the gate's top-20 is a consumer-side selection).
    * TVD arithmetic mirrors the gate bit-for-bit via BigInt. */
  def profileStream(rows: Dataset[UserHod], global: Map[Long, Long],
                    n: Long): Dataset[ProfileRow] = {
    val spark = rows.sparkSession
    import spark.implicits._
    rows.groupByKey(_.user_id)
      .flatMapGroupsWithState[ProfileState, ProfileRow](
        OutputMode.Update, GroupStateTimeout.NoTimeout) { (uid, it, state) =>
        val bins = state.getOption.map(_.bins.toArray)
          .getOrElse(Array.fill(24)(0L))
        it.foreach(r => bins(r.hod.toInt) += 1L)
        state.update(ProfileState(bins.toSeq))
        val nu = BigInt(bins.sum)
        if (nu == 0) Iterator.empty
        else {
          val num = (0 until 24).map(h =>
            (BigInt(bins(h)) * n - BigInt(global.getOrElse(h.toLong, 0L)) * nu)
              .abs).sum
          val tvd = (BigInt(1000000) * num / (BigInt(2) * nu * n)).toLong
          Iterator(ProfileRow(uid, nu.toLong, tvd))
        }
      }
  }

  /** Typed ingest row for the transition stream (public: encoder). */
  final case class TypedEvent(user_id: Long, event_id: Long, sec: Long,
                              event_type: String)

  /** Per-user last-event state for the transition stream (public). */
  final case class LastType(sec: Long, event_id: Long, tpe: String)

  /** One observed transition (from → to) — the q148 matrix's unit. */
  final case class Transition(from_type: String, to_type: String)

  /** Streaming event-type transitions — the q148 Markov matrix as an
    * ingest: per user O(1) state (last (sec, event_id, type) under
    * the gate's unique tie-break), each arriving event emitting its
    * (from, to) pair exactly once; the matrix rollup is the
    * consumer's aggregate over the emitted pairs (counts over the
    * full stream ≡ the batch lag-window counts under ordered ingest
    * — the DedupStream contract; in-batch rows sort by the same
    * (sec, event_id) key). */
  def transitionStream(events: Dataset[TypedEvent]): Dataset[Transition] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[LastType, Transition](
        OutputMode.Append, GroupStateTimeout.NoTimeout) { (_, evs, state) =>
        var last = state.getOption.orNull
        val out = scala.collection.mutable.ArrayBuffer.empty[Transition]
        for (e <- evs.toSeq.sortBy(x => (x.sec, x.event_id))) {
          if (last != null) out += Transition(last.tpe, e.event_type)
          last = LastType(e.sec, e.event_id, e.event_type)
        }
        if (last != null) state.update(last)
        out.iterator
      }
  }

  /** One inter-event gap, labeled by the LATER event's type —
    * [[gapStream]]'s unit (q199's row before bucketing). */
  final case class GapRow(event_type: String, gap: Long)

  /** Streaming inter-event gaps — the q199 gap spectrum as an ingest:
    * the same O(1) per-user (sec, event_id, type) state as
    * [[transitionStream]], each arriving event emitting its gap to
    * the previous same-user event exactly once; the spectrum (count /
    * min / max per (type, ⌊log2(gap+1)⌋) bucket) is the consumer's
    * rollup, ≡ the batch lag-window rows under ordered ingest. */
  def gapStream(events: Dataset[TypedEvent]): Dataset[GapRow] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[LastType, GapRow](
        OutputMode.Append, GroupStateTimeout.NoTimeout) { (_, evs, state) =>
        var last = state.getOption.orNull
        val out = scala.collection.mutable.ArrayBuffer.empty[GapRow]
        for (e <- evs.toSeq.sortBy(x => (x.sec, x.event_id))) {
          if (last != null) out += GapRow(e.event_type, e.sec - last.sec)
          last = LastType(e.sec, e.event_id, e.event_type)
        }
        if (last != null) state.update(last)
        out.iterator
      }
  }

  /** Open same-type run per user — [[runStream]]'s O(1) state
    * (public: encoder codegen constructs it). */
  final case class RunState(tpe: String, len: Long)

  /** One completed same-type run — [[runStream]]'s unit (q221's row
    * before bucketing). */
  final case class RunRow(event_type: String, run_len: Long)

  /** Streaming same-type run lengths — the q221 gaps-and-islands
    * spectrum as an ingest: O(1) per-user state (the current run's
    * type + length under the (sec, event_id) ordered-ingest
    * contract); a type CHANGE emits the completed run exactly once
    * (append-legal — a closed run never reopens). Each user's final
    * run stays OPEN in state by design (the q186 open-entity
    * contract), so over a full replay the emitted rows ≡ the batch
    * runs minus each user's last run — PipelineStreamSpec pins that
    * identity exactly against the q221 fold. */
  def runStream(events: Dataset[TypedEvent]): Dataset[RunRow] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[RunState, RunRow](
        OutputMode.Append, GroupStateTimeout.NoTimeout) { (_, evs, state) =>
        var cur = state.getOption.orNull
        val out = scala.collection.mutable.ArrayBuffer.empty[RunRow]
        for (e <- evs.toSeq.sortBy(x => (x.sec, x.event_id))) {
          if (cur == null) cur = RunState(e.event_type, 1L)
          else if (cur.tpe == e.event_type) cur = RunState(cur.tpe, cur.len + 1L)
          else {
            out += RunRow(cur.tpe, cur.len)
            cur = RunState(e.event_type, 1L)
          }
        }
        if (cur != null) state.update(cur)
        out.iterator
      }
  }

  /** One dow×hour heatmap cell — [[heatmapCellStream]]'s unit. */
  final case class HeatCell(dow: Long, hour: Long)

  /** Streaming weekly-heatmap cells — the q204 card as an ingest: dow
    * and hour are PURE epoch arithmetic on each event's second
    * ((⌊sec/86400⌋+4) mod 7 / (sec mod 86400)/3600 — the gate's
    * calendar-free formulas), so the stream is a ZERO-state stateless
    * map (the classifierScoreStream shape); the ≤168-cell rollup with
    * the uniform-deviation column is the consumer's aggregate and
    * equals the q204 gate rows over the full stream
    * (PipelineStreamSpec pins it). */
  def heatmapCellStream(events: Dataset[UserSec]): Dataset[HeatCell] = {
    val spark = events.sparkSession
    import spark.implicits._
    // plain Scala / and % mirror Spark SQL's truncating div/% exactly
    // (epoch seconds are positive, so floor vs trunc never diverges)
    events.map(e =>
      HeatCell((e.sec / 86400L + 4L) % 7L, (e.sec % 86400L) / 3600L))
  }

  /** One inter-session return time — [[returnTimeStream]]'s unit. */
  final case class ReturnRow(user_id: Long, rt: Long)

  /** Per-user last-event-second state for [[returnTimeStream]] —
    * explicit `has` flag (the HoltState lesson: never a sentinel
    * value that real data can reach). */
  final case class LastSec(has: Boolean, sec: Long)

  /** Streaming return times — the q207 spectrum as an ingest: O(1)
    * per-user state (the last event second). An arriving event whose
    * gap to it exceeds the 1800 s session threshold IS a session
    * boundary: the previous event is the prior session's `fin`, this
    * event the new session's `st`, so the return time st − prev_fin
    * is exactly the observed gap — each boundary emits once,
    * append-legal. The ⌊log2(rt+1)⌋ bucket rollup (count/min/max) is
    * the consumer's aggregate ≡ the q207 gate rows under per-user
    * ordered ingest (equal-second ties can never straddle a boundary:
    * their gap is 0).
    *
    * `gapSec` is the emission threshold (emit when gap > gapSec):
    * 1800 = the q207 session boundary; −1 emits EVERY consecutive
    * gap, which on a keyed (customer, epoch-day) ingest makes the
    * SAME state machine the q212 order-interval stream (equal-day
    * ties emit gap 0 in any arrival order, so day-ordered ingest
    * suffices — PipelineStreamSpec pins both rollups). */
  def returnTimeStream(events: Dataset[UserSec], gapSec: Long = 1800L)
      : Dataset[ReturnRow] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[LastSec, ReturnRow](
        OutputMode.Append, GroupStateTimeout.NoTimeout) { (uid, evs, state) =>
        var st = state.getOption.getOrElse(LastSec(has = false, 0L))
        val out = scala.collection.mutable.ArrayBuffer.empty[ReturnRow]
        for (e <- evs.toSeq.sortBy(_.sec)) {
          if (st.has && e.sec - st.sec > gapSec)
            out += ReturnRow(uid, e.sec - st.sec)
          st = LastSec(has = true, e.sec)
        }
        state.update(st)
        out.iterator
      }
  }

  /** One event's storage-cost sample — [[deltaBitsStream]]'s unit
    * (q217's per-row bits before the corpus aggregate). */
  final case class DeltaBitsRow(raw_bits: Long, delta_bits: Long)

  /** `length(bin(v))` for the non-negative longs this stream sees —
    * the exact Spark SQL semantics (bin(0) = "0" is 1 bit). */
  private def binBits(v: Long): Long =
    if (v == 0L) 1L else (64 - java.lang.Long.numberOfLeadingZeros(v)).toLong

  /** Streaming delta-encoding audit — the q217 card as an ingest:
    * the same O(1) per-user last-second state as [[returnTimeStream]],
    * each arriving event emitting its (raw_bits, delta_bits) sample
    * exactly once — raw = bits of the absolute second, delta = bits
    * of the gap to the previous same-user event (the first event
    * stores its absolute value, exactly the batch COALESCE). The
    * card (n_events / Σraw / Σdelta / savings_ppm) is the consumer's
    * one aggregate over the emissions ≡ the q217 gate row under
    * per-user ordered ingest (PipelineStreamSpec pins it; in-batch
    * rows sort by the gate's (sec, event_id) tie-break — gaps are
    * sec-only, so equal-second ties emit 0 in any order). */
  def deltaBitsStream(events: Dataset[TypedEvent]): Dataset[DeltaBitsRow] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[LastSec, DeltaBitsRow](
        OutputMode.Append, GroupStateTimeout.NoTimeout) { (_, evs, state) =>
        var st = state.getOption.getOrElse(LastSec(has = false, 0L))
        val out = scala.collection.mutable.ArrayBuffer.empty[DeltaBitsRow]
        for (e <- evs.toSeq.sortBy(x => (x.sec, x.event_id))) {
          val delta = if (st.has) e.sec - st.sec else e.sec
          out += DeltaBitsRow(binBits(e.sec), binBits(delta))
          st = LastSec(has = true, e.sec)
        }
        state.update(st)
        out.iterator
      }
  }

  /** One scored transition — [[predictionStream]]'s unit. */
  final case class PredRow(from_type: String, to_type: String, hit: Boolean)

  /** Streaming next-event prediction scoring — q196's evaluation side
    * as an ingest under the PINNED-MODEL contract (the q171/q120
    * pattern: the model trains batch-side and ships as a broadcast-
    * small constant, ≤ |types| entries): each arriving event emits its
    * (from, to) transition via [[transitionStream]]'s O(1) per-user
    * state, scored hit/miss against the pinned argmax map — a ZERO-
    * state stateless map on top (the classifierScoreStream shape).
    * The consumer's (hits, total) rollup over a fold's users equals
    * the q196 gate row for that fold (PipelineStreamSpec pins it). */
  def predictionStream(events: Dataset[TypedEvent],
                       model: Map[String, String]): Dataset[PredRow] = {
    val spark = events.sparkSession
    import spark.implicits._
    transitionStream(events).map(tr =>
      PredRow(tr.from_type, tr.to_type,
        model.get(tr.from_type).contains(tr.to_type)))
  }

  /** q131's row, emitted per user per micro-batch (update semantics). */
  final case class BurstRow(user_id: Long, n_events: Long, peak_burst: Long,
                            is_burst: Boolean)

  /** Trailing-window burst state: the in-window event times (bounded
    * by the window's event capacity, O(peak) per user — public for
    * encoder codegen). */
  final case class BurstState(recent: Seq[Long], n: Long, peak: Long)

  /** Streaming burst detection — the q131 gate as an ingest: per user
    * a deque of event seconds within the trailing 600 s window; each
    * event's window count is the deque size after eviction, and the
    * running max equals the batch RANGE-frame peak under ordered
    * ingest (the frame of a row at t contains exactly the rows with
    * sec ∈ [t−599, t], which under per-user non-decreasing arrival is
    * the deque when the LAST same-second row folds). State is
    * O(window capacity) per user, evicted as time advances. */
  def burstStream(events: Dataset[UserSec], windowSec: Long = 600L)
      : Dataset[BurstRow] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[BurstState, BurstRow](
        OutputMode.Update, GroupStateTimeout.NoTimeout) { (uid, evs, state) =>
        var st = state.getOption.getOrElse(BurstState(Vector.empty, 0L, 0L))
        for (e <- evs.toSeq.sortBy(_.sec)) {
          val keep = st.recent.filter(_ >= e.sec - (windowSec - 1)) :+ e.sec
          st = BurstState(keep, st.n + 1, math.max(st.peak, keep.size.toLong))
        }
        state.update(st)
        if (st.n > 0)
          Iterator(BurstRow(uid, st.n, st.peak, st.peak >= 2L))
        else Iterator.empty
      }
  }
}
