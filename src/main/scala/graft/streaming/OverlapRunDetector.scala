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

case class OvIsland(count: Long, start: Timestamp, end: Timestamp)
case class OvAnchor(id1: Long, ts1: Timestamp)
case class OverlapRunState(open: Option[OvIsland],
    anchors: List[OvAnchor])

/** Streaming detector for the 2-step quantified chain `A THEN B{m,}`
  * (or `{m,n}`/`{m}`) when B's class OVERLAPS A's — the carve-out every
  * round before r11 routed to batch.
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
  * tests the batch predicate verbatim. That is exactly this detector.
  *
  * Emission is island-close-driven (an open island stays extendable,
  * and an extension can push `run_end` past a window, so no early
  * emission is sound — [[RunDetector]]'s documented discipline); the
  * first closing island that qualifies for an anchor IS the batch
  * rank-1 by (run_start, run_end), because islands are disjoint and
  * close in start order. Unmatched anchors emit nothing (inner-join
  * semantics) and are dropped as soon as no current-or-future island
  * can serve them; with a watermark the same cleanup also runs on
  * event-time timeout, so state is O(live anchors + 1 island) per key.
  * What still has NO streaming form (loudly rejected upstream,
  * SubmitSqlSpec-pinned): overlap under 3+ steps, MEASURES, THEN NOT,
  * or reluctant runs — each adds a second consumer of the shared
  * island whose resolution is not close-driven.
  */
object OverlapRunDetector {
  private def us(t: Timestamp): Long =
    t.getTime / 1000 * 1000000L + t.getNanos / 1000

  def detectWhere(events: Dataset[CepEvent],
      anchorPred: CepEvent => Boolean, runPred: CepEvent => Boolean,
      minLen: Int, maxLen: Option[Int], withinMs: Long,
      watermarkDelay: Option[String] = None)
      : Dataset[OverlapChainMatch] = {
    implicit val matchEnc = Encoders.product[OverlapChainMatch]
    implicit val stateEnc = Encoders.product[OverlapRunState]
    implicit val keyEnc = Encoders.scalaLong
    val withinUs = withinMs * 1000L
    val wmEnabled = watermarkDelay.isDefined && events.isStreaming
    val src = if (wmEnabled) events.withWatermark("ts", watermarkDelay.get)
              else events
    val timeoutConf = if (wmEnabled) GroupStateTimeout.EventTimeTimeout()
                      else GroupStateTimeout.NoTimeout()

    src.groupByKey(_.user_id)
      .flatMapGroupsWithState[OverlapRunState, OverlapChainMatch](
        OutputMode.Append(), timeoutConf) {
        (user: Long, it: Iterator[CepEvent],
            state: GroupState[OverlapRunState]) =>
          var open = state.getOption.flatMap(_.open)
          var anchors = state.getOption.map(_.anchors).getOrElse(Nil)
          val out = List.newBuilder[OverlapChainMatch]

          // an anchor stays live while SOME island could still meet the
          // batch predicate: any island starting after `clock` is gone
          // once clock > deadline, and the open island only survives
          // that point if it already qualifies frozen (any extension
          // pushes its end past the deadline and disqualifies it)
          def live(a: OvAnchor, clock: Long): Boolean = {
            val deadline = us(a.ts1) + withinUs
            if (clock <= deadline) true
            else open.exists(o => us(o.start) > us(a.ts1) &&
              us(o.end) <= deadline && o.count >= minLen &&
              maxLen.forall(o.count <= _))
          }

          if (state.hasTimedOut) {
            val wmUs = state.getCurrentWatermarkMs() * 1000L
            anchors = anchors.filter(live(_, wmUs))
          } else {
            val batch = it.toArray.sortBy(e => (us(e.ts), e.event_id))
            batch.foreach { e =>
              val t = us(e.ts)
              // 1. a non-B event CLOSES the island (it is now maximal):
              //    every live anchor tests the batch join predicate —
              //    strictly-after start, window-bounded end, length in
              //    [m, n] with whole-run semantics
              if (!runPred(e)) {
                open.foreach { o =>
                  if (o.count >= minLen && maxLen.forall(o.count <= _))
                    anchors = anchors.flatMap { a =>
                      if (us(o.start) > us(a.ts1) &&
                          us(o.end) <= us(a.ts1) + withinUs) {
                        out += OverlapChainMatch(user, a.id1, o.count,
                          a.ts1, o.end)
                        Nil
                      } else List(a)
                    }
                }
                open = None
              }
              // 2. event-clock anchor cleanup (no emission — unmatched
              //    anchors are inner-join misses)
              anchors = anchors.filter(live(_, t))
              // 3. a B event extends or opens the shared island
              if (runPred(e)) {
                open = open match {
                  case Some(o) => Some(OvIsland(o.count + 1, o.start, e.ts))
                  case None    => Some(OvIsland(1, e.ts, e.ts))
                }
              }
              // 4. an A event anchors (AFTER island upkeep: when e is in
              //    both classes the island now CONTAINS e, and its start
              //    <= ts_1 correctly fails the strictly-after test)
              if (anchorPred(e)) anchors = anchors :+ OvAnchor(e.event_id, e.ts)
            }
          }

          if (open.isEmpty && anchors.isEmpty) state.remove()
          else {
            state.update(OverlapRunState(open, anchors))
            if (wmEnabled && anchors.nonEmpty) {
              val nextMs = anchors
                .map(a => (us(a.ts1) + withinUs) / 1000L + 1).min
              state.setTimeoutTimestamp(
                math.max(nextMs, state.getCurrentWatermarkMs() + 1))
            }
          }
          out.result().iterator
      }
  }
}
