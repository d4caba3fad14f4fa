package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One matched quantified chain: per step, `step_vals(i)` is the event id
  * (unquantified step) or the RUN LENGTH (quantified step), and
  * `step_ts(i)` the event ts / run end — the streaming twin of the batch
  * generalized-chain output (id_i/len_i + ts_i). */
case class RunChainMatch(user_id: Long, step_vals: Seq[Long],
    step_ts: Seq[Timestamp], start_ts: Timestamp, end_ts: Timestamp)

/** One open partial: values/ts matched so far (reversed), the anchor
  * window start, the previous step's match time, and — when the current
  * step is quantified — the open run (start ts, last ts, length);
  * `runStart/runLast` are null when no run is open. */
case class RunChainPartial(vals: List[Long], tss: List[Timestamp],
    anchorTs: Timestamp, prevTs: Timestamp,
    runStart: Timestamp, runLast: Timestamp, runLen: Long)

case class RunChainState(partials: List[RunChainPartial])

/** Streaming quantified chains (r7): `MATCH PATTERN` chains with `{m,}`
  * on any step — the last pattern form [[ContinuousQueries.submitPattern]]
  * rejected. Mirrors the batch generalized-chain rewrite exactly:
  *
  *  - an unquantified step takes the FIRST event of its class strictly
  *    after the previous step's time, inside `anchor + within`
  *    ([[PatternMatch]] rules; a quantified FIRST step anchors at its
  *    run's END, consistent with the batch window anchoring);
  *  - a quantified step takes the FIRST MAXIMAL run of ≥ m consecutive
  *    class events whose start is strictly after the previous step and
  *    whose END fits the window (whole-run semantics). "Consecutive"
  *    means consecutive in the key's FULL stream — ANY other event
  *    breaks a run — so this detector must see every event of the key
  *    (no type pruning; the batch twin scans the whole table for the
  *    same reason).
  *
  * A run's verdict needs its CLOSING event (maximal runs stay extendable
  * until a non-class event arrives — same contract as
  * [[RunDetector]]'s open runs), so emission is event-driven; a partial
  * whose window the watermark has closed is pruned unless its still-open
  * run could yet qualify. State per key is O(open partials), each
  * carrying one open run at most — bounded for unbounded streams.
  *
  * Scope: non-absent chains (`THEN NOT` + quantifiers elsewhere remains
  * batch-only). RunChainSpec pins replay ≡ the batch rewrite. */
object RunChainDetector {
  private def us(t: Timestamp): Long =
    t.getTime / 1000 * 1000000L + t.getNanos / 1000

  /** One (classes, minTimes) spec per step; minTimes None = plain step. */
  def detect(events: Dataset[CepEvent],
      steps: Seq[(Set[String], Option[Int])], withinMs: Long)
      : Dataset[RunChainMatch] =
    detect(events, steps, withinMs, steps.map(_ => None))

  /** Bounded-quantifier form (r7, `{m,n}`/`{m}`): `maxTimes(i)` caps step
    * i's accepted run length with whole-run semantics — a maximal run
    * longer than the cap does not qualify (the tracker waits for the
    * next run instead), mirroring the batch HAVING bound exactly. */
  def detect(events: Dataset[CepEvent],
      steps: Seq[(Set[String], Option[Int])], withinMs: Long,
      maxTimes: Seq[Option[Int]])
      : Dataset[RunChainMatch] =
    detectWhere(events,
      steps.map { case (cls, mt) =>
        ((e: CepEvent) => cls.contains(e.event_type), mt)
      }, withinMs, maxTimes)

  /** Predicate form (r8, DEFINE-lite conditions on quantified chains):
    * each step is (predicate, minTimes). The predicate REPLACES the class
    * test everywhere the class test appeared — so for a quantified step,
    * an event that fails the predicate (wrong type OR failed condition)
    * BREAKS the open run, exactly like the batch gaps-and-islands
    * indicator `CASE WHEN <type AND cond> THEN 1 ELSE 0 END`: runs are
    * maximal stretches of consecutive predicate-satisfying events, and a
    * same-class event outside the condition is a run breaker, not a
    * bystander. */
  def detectWhere(events: Dataset[CepEvent],
      steps: Seq[(CepEvent => Boolean, Option[Int])], withinMs: Long,
      maxTimes: Seq[Option[Int]])
      : Dataset[RunChainMatch] = {
    require(maxTimes.length == steps.length,
      "one maxTimes entry per step (None = uncapped)")
    require(steps.length >= 2, "a pattern needs at least 2 steps")
    require(steps.exists(_._2.isDefined),
      "no quantifier — use PatternMatch/CepSequence for plain chains")
    val n = steps.length
    val withinUs = withinMs * 1000L
    implicit val matchEnc = Encoders.product[RunChainMatch]
    implicit val stateEnc = Encoders.product[RunChainState]
    implicit val keyEnc = Encoders.scalaLong

    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[RunChainState, RunChainMatch](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (user: Long, it: Iterator[CepEvent], state: GroupState[RunChainState]) =>
          var partials = state.getOption.map(_.partials).getOrElse(Nil)
          val out = List.newBuilder[RunChainMatch]
          val batch = it.toArray.sortBy(e => (us(e.ts), e.event_id))
          var maxTs = 0L

          def windowEnd(p: RunChainPartial): Long =
            // a quantified FIRST step measures the window from the run's
            // end = ts_1, which is tss.last once step 1 is matched
            us(if (p.tss.isEmpty) p.anchorTs else p.tss.last) + withinUs

          // advance `p` with a completed QUALIFYING run (or plain event):
          // returns the advanced partial, emitting when the chain is done
          def advance(p: RunChainPartial, v: Long, ts: Timestamp)
              : Option[RunChainPartial] = {
            val vals2 = v :: p.vals
            val tss2 = ts :: p.tss
            if (vals2.length == n) {
              out += RunChainMatch(user, vals2.reverse, tss2.reverse,
                tss2.last, ts)
              None
            } else Some(RunChainPartial(vals2, tss2, p.anchorTs, ts,
              null, null, 0L))
          }

          batch.foreach { e =>
            val t = us(e.ts)
            if (t > maxTs) maxTs = t
            partials = partials.flatMap { p =>
              val step = p.vals.length // 0-based index of the awaited step
              val (pred, mt) = steps(step)
              val inClass = pred(e)
              mt match {
                case None =>
                  // plain step: first class event strictly after prevTs
                  if (inClass && t > us(p.prevTs) && t <= windowEnd(p))
                    advance(p, e.event_id, e.ts).toList
                  else List(p)
                case Some(m) =>
                  if (inClass) {
                    if (p.runStart == null) {
                      // runs that START inside the window are the only
                      // candidates; a run starting beyond it means every
                      // later run is beyond it too -> partial is dead.
                      // (step 1 quantified: the window is unanchored
                      // until the run completes - never dead here.)
                      if (step > 0 && t > windowEnd(p)) Nil
                      else List(p.copy(runStart = e.ts, runLast = e.ts,
                        runLen = 1L))
                    } else List(p.copy(runLast = e.ts,
                      runLen = p.runLen + 1L))
                  } else if (p.runStart != null) {
                    // a non-class event CLOSES the open run: qualify it
                    val qualifies = p.runLen >= m &&
                      maxTimes(step).forall(p.runLen <= _) &&
                      us(p.runStart) > us(p.prevTs) &&
                      (step == 0 || us(p.runLast) <= windowEnd(p))
                    if (qualifies) {
                      val adv = advance(p.copy(runStart = null,
                        runLast = null, runLen = 0L), p.runLen, p.runLast)
                      // the closing event may itself serve the NEXT step
                      adv match {
                        case Some(p2) =>
                          val (pred2, mt2) = steps(p2.vals.length)
                          if (mt2.isEmpty && pred2(e) &&
                              t > us(p2.prevTs) && t <= windowEnd(p2))
                            advance(p2, e.event_id, e.ts).toList
                          else if (mt2.isDefined && pred2(e) &&
                              t <= windowEnd(p2))
                            List(p2.copy(runStart = e.ts, runLast = e.ts,
                              runLen = 1L))
                          else List(p2)
                        case None => Nil
                      }
                    } else List(p.copy(runStart = null, runLast = null,
                      runLen = 0L)) // failed run: wait for the next one
                  } else List(p)
              }
            }
            // every head-predicate event anchors a new partial
            val (headPred, headMt) = steps.head
            if (headPred(e)) {
              val anchored = RunChainPartial(Nil, Nil, e.ts, e.ts,
                null, null, 0L)
              headMt match {
                case None =>
                  // plain head: the event itself is step 1. Anchor only
                  // if no identical partial exists (each head event is
                  // its own anchor, PatternMatch-style).
                  advance(anchored.copy(prevTs =
                    new Timestamp(0L)), e.event_id, e.ts)
                    .foreach(p2 => partials = p2 :: partials)
                case Some(_) =>
                  // quantified head: runs are per-KEY maximal, so ONE
                  // run tracker suffices — anchor a single partial when
                  // none is currently tracking a head run
                  val tracking = partials.exists(p =>
                    p.vals.isEmpty && p.runStart != null)
                  if (!tracking)
                    partials = anchored.copy(runStart = e.ts,
                      runLast = e.ts, runLen = 1L,
                      prevTs = new Timestamp(0L)) :: partials
              }
            }
          }

          // prune: a partial whose window the horizon has passed can only
          // still qualify through a run that is already OPEN (its closing
          // event may come later); an idle quantified-head tracker (no
          // open run, nothing matched) carries no information — the
          // anchor code recreates one on demand — so it is dropped too
          val horizon = scala.util.Try(state.getCurrentWatermarkMs() * 1000L)
            .getOrElse(maxTs)
          partials = partials.filter { p =>
            p.runStart != null ||
              (p.tss.nonEmpty && windowEnd(p) >= horizon)
          }
          if (partials.isEmpty) state.remove()
          else state.update(RunChainState(partials))
          out.result().iterator
      }
  }
}
