package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** An emitted chain absence: a fully matched N-1-step prefix with NO
  * completion inside the anchor's window. `step_ids`/`step_ts` are the
  * prefix picks in order. */
case class ChainAbsence(user_id: Long, step_ids: Seq[Long],
    start_ts: Timestamp, end_ts: Timestamp)

/** [[ChainAbsence]] with optional prefix steps (r8): one entry per prefix
  * step — the matched event id/ts, or None for a skipped optional step
  * (the streaming twin of the batch composite-pivot's typed-NULL id_i). */
case class OptChainAbsence(user_id: Long, step_ids: Seq[Option[Long]],
    step_ts: Seq[Option[Timestamp]], start_ts: Timestamp, end_ts: Timestamp)

/** One open (or completed-pending) prefix partial: ids/tss so far
  * (reversed; None marks a skipped optional step), anchor ts, last
  * matched ts. */
case class OptChainAbsPartial(ids: List[Option[Long]],
    tss: List[Option[Timestamp]], start: Timestamp, last: Timestamp)

/** State: open prefix partials, completed prefixes awaiting the absence
  * verdict, and recent completion-class events retained for
  * late-completing prefixes. */
case class OptChainAbsState(partials: List[OptChainAbsPartial],
    pending: List[OptChainAbsPartial], cancels: List[Timestamp])

/** Streaming `e1 THEN e2 … THEN NOT eN` (r7; optional mid-prefix steps
  * since r8) — absence after a matched multi-step prefix, the form
  * [[ContinuousQueries.submitPattern]] previously rejected. Composes the
  * [[PatternMatch]] prefix machinery with [[AbsenceDetector]]'s timer
  * discipline:
  *
  *  - the N-1-step prefix advances greedily exactly like PatternMatch
  *    (every `e1` anchors a partial; each partial takes the FIRST event
  *    of its next class with strictly increasing ts, all inside
  *    `start + within`); when the awaited step is OPTIONAL, the next
  *    step's class may claim the event instead, skipping the optional
  *    step (regex-scan greedy: the optional class is tried first, so an
  *    event in both classes counts as the optional match — the exact
  *    per-event decision [[PatternMatch.detectOpt]] makes, and the
  *    streaming twin of the batch composite-pivot rewrite);
  *  - a completed prefix becomes PENDING; any `eN` event with
  *    `last_ts < ts <= start + within` cancels it (no absence);
  *  - the verdict "nothing arrived" is only provable by the WATERMARK
  *    crossing `start + within` — emission is timer-driven
  *    (EventTimeTimeout), not input-driven, so a silent key still
  *    reports its absences;
  *  - `eN` events at or above the watermark are retained so a prefix
  *    that COMPLETES late (inside the lateness bound) is pre-cancelled
  *    by a completion that was processed earlier — the same
  *    late-first memory AbsenceDetector keeps.
  *
  * Batch twin: the `translateChain` absent rewrite (anti join after the
  * chained rank-1 prefix, composite pivots for optional steps);
  * ChainAbsenceSpec pins replay ≡ batch. State per key is O(open
  * partials + pending windows + lateness-bounded cancels) — bounded for
  * unbounded streams. */
object ChainAbsenceDetector {
  private def us(t: Timestamp): Long =
    t.getTime / 1000 * 1000000L + t.getNanos / 1000

  /** `steps`: N event-type classes; the first N-1 form the prefix chain,
    * the LAST is the absent completion. */
  def detect(events: Dataset[CepEvent], steps: Seq[Set[String]],
      withinMs: Long, lateness: String): Dataset[ChainAbsence] =
    detectWhere(events,
      steps.map(cls => (e: CepEvent) => cls.contains(e.event_type)),
      withinMs, lateness)

  /** Predicate form (r8, DEFINE-lite conditions on the chain-absence
    * arm): the predicates replace the class tests — a prefix step only
    * takes a condition-satisfying event, and only a condition-satisfying
    * completion cancels a pending prefix (a same-class event outside its
    * condition is invisible, exactly like the batch anti join's
    * `type AND cond` predicate). */
  def detectWhere(events: Dataset[CepEvent],
      preds: Seq[CepEvent => Boolean], withinMs: Long, lateness: String)
      : Dataset[ChainAbsence] = {
    implicit val matchEnc = Encoders.product[ChainAbsence]
    detectOptWhere(events, preds, Seq.fill(preds.length)(false),
      withinMs, lateness)
      .map(a => ChainAbsence(a.user_id, a.step_ids.map(_.get),
        a.start_ts, a.end_ts))
  }

  /** Optional-step form (r8): `optional(i)` marks preds(i) optional.
    * Callers guarantee the [[CepSql.parsePattern]] shape — the anchor,
    * the prefix's last step, and the absent step are concrete, and
    * optional steps are never consecutive (so a skipped step's successor
    * is concrete). */
  def detectOptWhere(events: Dataset[CepEvent],
      preds: Seq[CepEvent => Boolean], optional: Seq[Boolean],
      withinMs: Long, lateness: String): Dataset[OptChainAbsence] = {
    require(preds.length >= 3,
      "chain absence needs >= 2 prefix steps + the absent step " +
        "(2-step absence is AbsenceDetector)")
    require(optional.length == preds.length, "one optional flag per step")
    require(!optional.head, "the anchor step must be concrete")
    require(!optional.last && !optional(preds.length - 2),
      "the absent step and the prefix's last step must be concrete")
    require(!optional.sliding(2).exists(p => p.forall(identity)),
      "consecutive optional steps are not supported")
    val prefix = preds.init
    val absent = preds.last
    val n = prefix.length
    val withinUs = withinMs * 1000L
    implicit val matchEnc = Encoders.product[OptChainAbsence]
    implicit val stateEnc = Encoders.product[OptChainAbsState]
    implicit val keyEnc = Encoders.scalaLong

    // pattern-pruned before the shuffle: only events some step predicate
    // accepts carry state. Safe for PLAIN chains (non-matching events
    // are skipped over, never run-breakers) — quantified chains, where
    // any event breaks a run, never route here.
    events.filter(e => preds.exists(_(e)))
      .withWatermark("ts", lateness)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[OptChainAbsState, OptChainAbsence](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (user: Long, it: Iterator[CepEvent],
            state: GroupState[OptChainAbsState]) =>
          val prev = state.getOption.getOrElse(OptChainAbsState(Nil, Nil, Nil))
          var partials = prev.partials
          var pending = prev.pending
          val wmMs = state.getCurrentWatermarkMs()
          // cancels bounded by the lateness horizon: any future prefix
          // completion has last_ts > wm, and its cancellers have ts
          // beyond that
          var cancels = prev.cancels.filter(_.getTime >= wmMs)
          val out = List.newBuilder[OptChainAbsence]

          if (!state.hasTimedOut) {
            val batch = it.toArray.sortBy(e => (us(e.ts), e.event_id))
            batch.foreach { e =>
              val t = us(e.ts)
              if (absent(e)) {
                // a completion cancels every pending prefix whose tail
                // precedes it inside the window
                pending = pending.filterNot { p =>
                  t > us(p.last) && t <= us(p.start) + withinUs
                }
                if (e.ts.getTime >= wmMs) cancels = e.ts :: cancels
              }
              // advance prefix partials (greedy-first, PatternMatch
              // rules; per-event optional-skip decision, detectOpt rules)
              partials = partials.flatMap { p =>
                val next = p.ids.length
                val inWin = next < n &&
                  t > us(p.last) && t <= us(p.start) + withinUs
                // steps consumed by this event, in CHAIN order (the skip
                // case consumes two: the skipped optional as None, then
                // the successor's pick) — Nil = no move
                val take: List[(Option[Long], Option[Timestamp])] =
                  if (!inWin) Nil
                  else if (prefix(next)(e))
                    List((Some(e.event_id), Some(e.ts)))
                  else if (optional(next) && next + 1 < n &&
                      prefix(next + 1)(e))
                    List((None, None), (Some(e.event_id), Some(e.ts)))
                  else Nil
                if (take.isEmpty) List(p)
                else {
                  val ids2 = take.map(_._1) reverse_::: p.ids
                  val tss2 = take.map(_._2) reverse_::: p.tss
                  if (ids2.length == n) {
                    // completed prefix: pre-cancelled if a completion
                    // inside (e.ts, st + within] was already processed
                    val preCancelled = cancels.exists(c =>
                      us(c) > t && us(c) <= us(p.start) + withinUs)
                    if (!preCancelled)
                      pending = OptChainAbsPartial(ids2, tss2,
                        p.start, e.ts) :: pending
                    Nil
                  } else List(OptChainAbsPartial(ids2, tss2, p.start, e.ts))
                }
              }
              if (prefix.head(e))
                partials = OptChainAbsPartial(List(Some(e.event_id)),
                  List(Some(e.ts)), e.ts, e.ts) :: partials
            }
          }

          // watermark-proven absences emit (timer-driven or piggybacked
          // on an input batch — whichever sees the watermark first)
          val wmUs = wmMs * 1000L
          // inclusive <=: a completion must have ts <= st+within, and
          // Spark drops stateful late rows at ts <= watermark
          // (LessThanOrEqual predicate, verified against the 4.1.2
          // bytecode — see SkipMatch.greedyScan's scaladoc), so once
          // wm >= st+within no admissible completion can still arrive.
          // ADVICE r7 asked for strict < on the premise that rows AT
          // the watermark are kept; that premise is false. The timer
          // path's +1ms is merely conservative (one extra tick), kept
          // as is.
          val (due, keep) = pending.partition { p =>
            us(p.start) + withinUs <= wmUs
          }
          due.sortBy(p => (us(p.start), p.ids.last.get))
            .foreach { p =>
              out += OptChainAbsence(user, p.ids.reverse, p.tss.reverse,
                p.start, p.last)
            }
          pending = keep
          // prune partials whose window can no longer complete
          partials = partials.filter(p => us(p.start) + withinUs >= wmUs)

          if (partials.isEmpty && pending.isEmpty && cancels.isEmpty)
            state.remove()
          else {
            state.update(OptChainAbsState(partials, pending, cancels))
            if (pending.nonEmpty) {
              val nextMs = pending
                .map(p => (us(p.start) + withinUs) / 1000L + 1)
                .min
              state.setTimeoutTimestamp(math.max(nextMs, wmMs + 1))
            }
          }
          out.result().iterator
      }
  }
}
