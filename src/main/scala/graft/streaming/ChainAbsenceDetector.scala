package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** An emitted chain absence: a fully matched N-1-step prefix with NO
  * completion inside the anchor's window. `step_ids`/`step_ts` are the
  * prefix picks in order. */
case class ChainAbsence(user_id: Long, step_ids: Seq[Long],
    start_ts: Timestamp, end_ts: Timestamp)

/** State: open prefix partials (ids-so-far reversed, anchor ts, last ts),
  * completed prefixes awaiting the absence verdict, and recent
  * completion-class events retained for late-completing prefixes. */
case class ChainAbsState(
    partials: List[(List[Long], Timestamp, Timestamp)],
    pending: List[(List[Long], Timestamp, Timestamp)],
    cancels: List[Timestamp])

/** Streaming `e1 THEN e2 … THEN NOT eN` (r7) — absence after a matched
  * multi-step prefix, the form [[ContinuousQueries.submitPattern]]
  * previously rejected. Composes the [[PatternMatch]] prefix machinery
  * with [[AbsenceDetector]]'s timer discipline:
  *
  *  - the N-1-step prefix advances greedily exactly like PatternMatch
  *    (every `e1` anchors a partial; each partial takes the FIRST event
  *    of its next class with strictly increasing ts, all inside
  *    `start + within`);
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
  * chained rank-1 prefix); ChainAbsenceSpec pins replay ≡ batch. State
  * per key is O(open partials + pending windows + lateness-bounded
  * cancels) — bounded for unbounded streams. */
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
    require(preds.length >= 3,
      "chain absence needs >= 2 prefix steps + the absent step " +
        "(2-step absence is AbsenceDetector)")
    val prefix = preds.init
    val absent = preds.last
    val n = prefix.length
    val withinUs = withinMs * 1000L
    implicit val matchEnc = Encoders.product[ChainAbsence]
    implicit val stateEnc = Encoders.product[ChainAbsState]
    implicit val keyEnc = Encoders.scalaLong

    // pattern-pruned before the shuffle: only events some step predicate
    // accepts carry state. Safe for PLAIN chains (non-matching events
    // are skipped over, never run-breakers) — quantified chains, where
    // any event breaks a run, never route here.
    events.filter(e => preds.exists(_(e)))
      .withWatermark("ts", lateness)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[ChainAbsState, ChainAbsence](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (user: Long, it: Iterator[CepEvent], state: GroupState[ChainAbsState]) =>
          val prev = state.getOption.getOrElse(ChainAbsState(Nil, Nil, Nil))
          var partials = prev.partials
          var pending = prev.pending
          val wmMs = state.getCurrentWatermarkMs()
          // cancels bounded by the lateness horizon: any future prefix
          // completion has last_ts > wm, and its cancellers have ts
          // beyond that
          var cancels = prev.cancels.filter(_.getTime >= wmMs)
          val out = List.newBuilder[ChainAbsence]

          if (!state.hasTimedOut) {
            val batch = it.toArray.sortBy(e => (us(e.ts), e.event_id))
            batch.foreach { e =>
              val t = us(e.ts)
              if (absent(e)) {
                // a completion cancels every pending prefix whose tail
                // precedes it inside the window
                pending = pending.filterNot { case (_, st, last) =>
                  t > us(last) && t <= us(st) + withinUs
                }
                if (e.ts.getTime >= wmMs) cancels = e.ts :: cancels
              }
              // advance prefix partials (greedy-first, PatternMatch rules)
              partials = partials.flatMap { case p @ (ids, st, last) =>
                val next = ids.length
                if (next < n && prefix(next)(e) &&
                    t > us(last) && t <= us(st) + withinUs) {
                  val ids2 = e.event_id :: ids
                  if (ids2.length == n) {
                    // completed prefix: pre-cancelled if a completion
                    // inside (e.ts, st + within] was already processed
                    val preCancelled = cancels.exists(c =>
                      us(c) > t && us(c) <= us(st) + withinUs)
                    if (!preCancelled) pending = (ids2, st, e.ts) :: pending
                    Nil
                  } else List((ids2, st, e.ts))
                } else List(p)
              }
              if (prefix.head(e))
                partials = (List(e.event_id), e.ts, e.ts) :: partials
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
          val (due, keep) = pending.partition { case (_, st, _) =>
            us(st) + withinUs <= wmUs
          }
          due.sortBy { case (ids, st, _) => (us(st), ids.last) }
            .foreach { case (ids, st, last) =>
              out += ChainAbsence(user, ids.reverse, st, last)
            }
          pending = keep
          // prune partials whose window can no longer complete
          partials = partials.filter { case (_, st, _) =>
            us(st) + withinUs >= wmUs
          }

          if (partials.isEmpty && pending.isEmpty && cancels.isEmpty)
            state.remove()
          else {
            state.update(ChainAbsState(partials, pending, cancels))
            if (pending.nonEmpty) {
              val nextMs = pending
                .map { case (_, st, _) => (us(st) + withinUs) / 1000L + 1 }
                .min
              state.setTimeoutTimestamp(math.max(nextMs, wmMs + 1))
            }
          }
          out.result().iterator
      }
  }
}
