package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** A completed `A THEN B{m,}` match where B's class OVERLAPS A's:
  * columns mirror the batch `CepSql.translateChain` output for the
  * 2-step quantified-tail form — anchor row id, accepted run length,
  * anchor ts, run-end ts. */
case class OverlapChainMatch(user_id: Long, id_1: Long, len_2: Long,
    ts_1: Timestamp, ts_2: Timestamp)

/** The 3-step form `A THEN B{m,} THEN C` (r11): the 2-step columns plus
  * the completing row — batch emits (id_1, len_2, id_3, ts_1..ts_3). */
case class OverlapChain3Match(user_id: Long, id_1: Long, len_2: Long,
    id_3: Long, ts_1: Timestamp, ts_2: Timestamp, ts_3: Timestamp)

case class OvIsland(count: Long, start: Timestamp, end: Timestamp)
case class OvAnchor(id1: Long, ts1: Timestamp)
/** An anchor whose rank-1 island has CLOSED, waiting on step 3: either
  * the first C within (ts2, ts1+within] (completion) or proof that none
  * arrives (absence — watermark-timer-driven). */
case class OvPending(id1: Long, ts1: Timestamp, len: Long, ts2: Timestamp)
case class OverlapChainState(open: Option[OvIsland],
    anchors: List[OvAnchor], pending: List[OvPending])

/** Streaming detector for quantified chains whose run class OVERLAPS the
  * anchor's — the carve-out every round before r11 routed to batch:
  * `A THEN B{m,}` (greedy 2-step, r11), and since this session also
  * `A THEN B{m,} THEN C` and `A THEN B{m,} THEN NOT C` (C's class
  * disjoint from B's).
  *
  * WHY the general chain detector can't do this (the r10 verdict's
  * "run maximality differs"): the batch contract computes B-runs as
  * GLOBAL gaps-and-islands — maximal stretches of consecutive B-class
  * events over the whole key, independent of chain position — and a
  * step then takes the first island with `run_start > ts_1` and
  * `run_end <= ts_1 + within`. [[RunChainDetector]] tracks runs PER
  * PARTIAL, observing only events after its anchor. With disjoint
  * classes that is equivalent: the anchor event itself breaks any
  * B-run, so no island spans an anchor and left-maximality is locally
  * visible. With OVERLAP the anchor can sit INSIDE an island
  * (`click THEN click{2,}` on click,click,click: the only island
  * starts AT the anchor, so batch matches nothing — a per-partial
  * tracker would see clicks 2–3 as a fresh run and emit a false
  * match). The fix is not per-partial state but ONE island tracker
  * per key SHARED by all anchors: islands close sequentially (any
  * non-B event breaks them), and on each close every live anchor
  * tests the batch predicate verbatim.
  *
  * Emission is island-close-driven (an open island stays extendable,
  * and an extension can push `run_end` past a window, so no early
  * emission is sound — [[RunDetector]]'s documented discipline); the
  * first closing island that qualifies for an anchor IS the batch
  * rank-1 by (run_start, run_end), because islands are disjoint and
  * close in start order. Step-3 forms (r11): a qualifying close moves
  * the anchor to a PENDING slot carrying (id_1, ts_1, len_2, ts_2) —
  * exactly the batch prefix row. Completion (`THEN C`) resolves on the
  * first C-class event with `ts > ts_2` inside the anchor window (the
  * batch rank-1 under the suite's ts-ordered replay contract — the
  * breaker that closed the island is itself tested first, since a
  * disjoint C is necessarily an island breaker); a pending whose
  * window passes unserved drops silently (inner-join miss). Absence
  * (`THEN NOT C`) is the inverse: any such C KILLS the pending, and
  * the no-C verdict emits only once the watermark passes the anchor
  * deadline (timer-driven, [[RunDetector]]'s discipline — a watermark
  * is therefore REQUIRED for the absent form). Unmatched anchors emit
  * nothing and are dropped as soon as no current-or-future island can
  * serve them; state is O(live anchors + pendings + 1 island) per key,
  * all window-bound. Still batch-only (loudly rejected upstream,
  * SubmitSqlSpec-pinned): overlap at a NON-HEAD boundary (step i ≥ 2
  * overlapping step i+1), a C class overlapping the run's, MEASURES,
  * and reluctant runs — each adds a consumer of the shared island
  * whose resolution is neither close- nor deadline-driven.
  */
object OverlapRunDetector {
  private def us(t: Timestamp): Long =
    t.getTime / 1000 * 1000000L + t.getNanos / 1000

  /** Greedy 2-step `A THEN B{m,}` (r11 original form). */
  def detectWhere(events: Dataset[CepEvent],
      anchorPred: CepEvent => Boolean, runPred: CepEvent => Boolean,
      minLen: Int, maxLen: Option[Int], withinMs: Long,
      watermarkDelay: Option[String] = None)
      : Dataset[OverlapChainMatch] = {
    implicit val matchEnc = Encoders.product[OverlapChainMatch]
    engine(events, anchorPred, runPred, minLen, maxLen, None,
      absent = false, withinMs, watermarkDelay)
      .map(m => OverlapChainMatch(m.user_id, m.id_1, m.len_2,
        m.ts_1, m.ts_2))
  }

  /** 3-step completion `A THEN B{m,} THEN C` (C disjoint from B). */
  def detectFollowWhere(events: Dataset[CepEvent],
      anchorPred: CepEvent => Boolean, runPred: CepEvent => Boolean,
      minLen: Int, maxLen: Option[Int],
      followPred: CepEvent => Boolean, withinMs: Long,
      watermarkDelay: Option[String] = None)
      : Dataset[OverlapChain3Match] =
    engine(events, anchorPred, runPred, minLen, maxLen,
      Some(followPred), absent = false, withinMs, watermarkDelay)

  /** 3-step absence `A THEN B{m,} THEN NOT C` (C disjoint from B).
    * Watermark REQUIRED — no-C verdicts are timer-driven. Output shape
    * matches the batch absent rewrite (prefix columns only). */
  def detectAbsentWhere(events: Dataset[CepEvent],
      anchorPred: CepEvent => Boolean, runPred: CepEvent => Boolean,
      minLen: Int, maxLen: Option[Int],
      followPred: CepEvent => Boolean, withinMs: Long,
      watermarkDelay: String): Dataset[OverlapChainMatch] = {
    implicit val matchEnc = Encoders.product[OverlapChainMatch]
    engine(events, anchorPred, runPred, minLen, maxLen,
      Some(followPred), absent = true, withinMs, Some(watermarkDelay))
      .map(m => OverlapChainMatch(m.user_id, m.id_1, m.len_2,
        m.ts_1, m.ts_2))
  }

  private def engine(events: Dataset[CepEvent],
      anchorPred: CepEvent => Boolean, runPred: CepEvent => Boolean,
      minLen: Int, maxLen: Option[Int],
      follow: Option[CepEvent => Boolean], absent: Boolean,
      withinMs: Long, watermarkDelay: Option[String])
      : Dataset[OverlapChain3Match] = {
    implicit val matchEnc = Encoders.product[OverlapChain3Match]
    implicit val stateEnc = Encoders.product[OverlapChainState]
    implicit val keyEnc = Encoders.scalaLong
    val withinUs = withinMs * 1000L
    val wmEnabled = watermarkDelay.isDefined && events.isStreaming
    // The absent form's no-C verdicts are TIMER-driven: without a watermark
    // timer there is no resolution path, so a batch Dataset would silently
    // emit zero rows. Reject batch outright — batch callers use the
    // equivalent rewrite in queries/Cep.scala (q_pattern_qabs shape).
    require(!absent || wmEnabled,
      "the absent overlap form needs a STREAMING input with a watermark " +
        "(no-C verdicts are timer-driven; for batch input use the batch " +
        "overlap-absence rewrite in queries/Cep.scala)")
    val src = if (wmEnabled) events.withWatermark("ts", watermarkDelay.get)
              else events
    val timeoutConf = if (wmEnabled) GroupStateTimeout.EventTimeTimeout()
                      else GroupStateTimeout.NoTimeout()

    src.groupByKey(_.user_id)
      .flatMapGroupsWithState[OverlapChainState, OverlapChain3Match](
        OutputMode.Append(), timeoutConf) {
        (user: Long, it: Iterator[CepEvent],
            state: GroupState[OverlapChainState]) =>
          var open = state.getOption.flatMap(_.open)
          var anchors = state.getOption.map(_.anchors).getOrElse(Nil)
          var pending = state.getOption.map(_.pending).getOrElse(Nil)
          val out = List.newBuilder[OverlapChain3Match]
          def deadline(ts1: Timestamp): Long = us(ts1) + withinUs

          // an anchor stays live while SOME island could still meet the
          // batch predicate: any island starting after `clock` is gone
          // once clock > deadline, and the open island only survives
          // that point if it already qualifies frozen (any extension
          // pushes its end past the deadline and disqualifies it)
          def live(a: OvAnchor, clock: Long): Boolean = {
            val dl = deadline(a.ts1)
            if (clock <= dl) true
            else open.exists(o => us(o.start) > us(a.ts1) &&
              us(o.end) <= dl && o.count >= minLen &&
              maxLen.forall(o.count <= _))
          }

          // watermark-horizon resolution: no C with ts <= deadline can
          // still arrive once wm passes it — absence pendings verdict
          // no-follow, completion pendings are inner-join misses
          def resolveByWm(wmUs: Long): Unit = {
            anchors = anchors.filter(live(_, wmUs))
            if (follow.isDefined) {
              val (ripe, rest) =
                pending.partition(p => wmUs > deadline(p.ts1))
              if (absent) ripe.foreach { p =>
                out += OverlapChain3Match(user, p.id1, p.len, -1L,
                  p.ts1, p.ts2, p.ts2)
              }
              pending = rest
            }
          }

          if (state.hasTimedOut) {
            resolveByWm(state.getCurrentWatermarkMs() * 1000L)
          } else {
            // a key that keeps receiving data may never fire its timer —
            // resolve against the batch-start watermark first (sound:
            // in-bound events of THIS batch all carry ts above it)
            if (wmEnabled)
              resolveByWm(state.getCurrentWatermarkMs() * 1000L)
            val batch = it.toArray.sortBy(e => (us(e.ts), e.event_id))
            batch.foreach { e =>
              val t = us(e.ts)
              // 1. a non-B event CLOSES the island (it is now maximal):
              //    every live anchor tests the batch join predicate —
              //    strictly-after start, window-bounded end, length in
              //    [m, n] with whole-run semantics. A qualifying anchor
              //    emits (2-step) or moves to pending (3-step)
              if (!runPred(e)) {
                open.foreach { o =>
                  if (o.count >= minLen && maxLen.forall(o.count <= _))
                    anchors = anchors.flatMap { a =>
                      if (us(o.start) > us(a.ts1) &&
                          us(o.end) <= deadline(a.ts1)) {
                        if (follow.isEmpty)
                          out += OverlapChain3Match(user, a.id1, o.count,
                            -1L, a.ts1, o.end, o.end)
                        else
                          pending ::= OvPending(a.id1, a.ts1, o.count,
                            o.end)
                        Nil
                      } else List(a)
                    }
                }
                open = None
              }
              // 2. step-3 resolution — tested on EVERY event including
              //    the breaker that just closed the island (a disjoint C
              //    is necessarily a breaker): completion emits and
              //    clears, absence kills
              follow.foreach { fp =>
                if (fp(e))
                  pending = pending.flatMap { p =>
                    if (t > us(p.ts2) && t <= deadline(p.ts1)) {
                      if (!absent)
                        out += OverlapChain3Match(user, p.id1, p.len,
                          e.event_id, p.ts1, p.ts2, e.ts)
                      Nil
                    } else List(p)
                  }
              }
              // 3. event-clock cleanup (no emission — unmatched anchors
              //    and unserved completion pendings are inner-join
              //    misses; absence pendings wait for the watermark)
              anchors = anchors.filter(live(_, t))
              if (!absent && follow.isDefined)
                pending = pending.filter(p => t <= deadline(p.ts1))
              // 4. a B event extends or opens the shared island
              if (runPred(e)) {
                open = open match {
                  case Some(o) => Some(OvIsland(o.count + 1, o.start, e.ts))
                  case None    => Some(OvIsland(1, e.ts, e.ts))
                }
              }
              // 5. an A event anchors (AFTER island upkeep: when e is in
              //    both classes the island now CONTAINS e, and its start
              //    <= ts_1 correctly fails the strictly-after test)
              if (anchorPred(e)) anchors = anchors :+ OvAnchor(e.event_id, e.ts)
            }
          }

          if (open.isEmpty && anchors.isEmpty && pending.isEmpty)
            state.remove()
          else {
            state.update(OverlapChainState(open, anchors, pending))
            if (wmEnabled && (anchors.nonEmpty || pending.nonEmpty)) {
              val nextMs = (anchors.map(a => deadline(a.ts1)) ++
                pending.map(p => deadline(p.ts1)))
                .map(_ / 1000L + 1).min
              state.setTimeoutTimestamp(
                math.max(nextMs, state.getCurrentWatermarkMs() + 1))
            }
          }
          out.result().iterator
      }
  }
}
