package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** A completed N-step pattern match: one event id per step, in order. */
case class SeqMatch(user_id: Long, step_ids: Seq[Long],
    start_ts: Timestamp, end_ts: Timestamp)

/** Partial-match state: for each open partial, the ids matched so far and
  * the timestamps of the first and last matched events. */
case class PatternState(partials: List[(List[Long], Timestamp, Timestamp)])

/** A measured N-step match (r7 MEASURES-lite): the matched ids plus ONE
  * aggregate over the span — every event of the key between the match's
  * first and last rows in (ts, id) order, inclusive, any type. */
case class MeasureMatch(user_id: Long, step_ids: Seq[Long],
    start_ts: Timestamp, end_ts: Timestamp, measure: Double)

/** One open measured partial: ids so far (reversed), anchor/last ts+id,
  * and the span accumulators (sum/cnt/min/max over `value`). */
case class MeasurePartial(ids: List[Long], start: Timestamp,
    last: Timestamp, sum: Double, cnt: Long, mn: Double, mx: Double)

case class MeasureState(partials: List[MeasurePartial])

/** An N-step match whose optional steps may be absent: one entry per
  * step — the matched event id/ts, or None for a skipped optional step
  * (r7, the streaming twin of the batch composite-pivot rewrite). */
case class OptSeqMatch(user_id: Long, step_ids: Seq[Option[Long]],
    step_ts: Seq[Option[Timestamp]], start_ts: Timestamp, end_ts: Timestamp)

/** One open partial for the optional-step scan (ids/tss reversed). */
case class OptPartial(ids: List[Option[Long]], tss: List[Option[Timestamp]],
    start: Timestamp, last: Timestamp)

case class OptPatternState(partials: List[OptPartial])

/** N-step CEP pattern detection (MATCH_RECOGNIZE-lite; SURVEY §2.9 C6
  * generalized): detect `steps.head → steps(1) → … → steps.last` per key
  * within a time budget, events in between allowed.
  *
  * Semantics (deterministic, and for 2 steps identical to [[CepSequence]]):
  * events are processed in (ts, event_id) order; every event matching
  * `steps.head` opens a partial; each partial advances greedily on the
  * FIRST event matching its next step with ts strictly increasing; a
  * partial completes when its last step matches within
  * `start_ts + withinMs`. One event may advance several partials
  * (each anchored at a different start event), so every start event gets
  * its earliest completion — "every match, skip to next row".
  *
  * State is pruned to partials whose window can still complete, so per-key
  * state is O(open starts in the window) — bounded for unbounded streams.
  */
object PatternMatch {
  private def us(t: Timestamp): Long =
    t.getTime / 1000 * 1000000L + t.getNanos / 1000

  /** Type-name steps (the common case). */
  def detect(events: Dataset[CepEvent], steps: Seq[String], withinMs: Long)
      : Dataset[SeqMatch] = {
    val preds = steps.map(t => (e: CepEvent) => e.event_type == t)
    detectWhere(events, preds, withinMs)
  }

  /** Predicate steps — full CEP conditions per step (e.g. "a purchase
    * over $100 after a signup"). Predicates must be serializable pure
    * functions of the event. */
  def detectWhere(events: Dataset[CepEvent],
      steps: Seq[CepEvent => Boolean], withinMs: Long): Dataset[SeqMatch] = {
    require(steps.length >= 2, "a pattern needs at least 2 steps")
    implicit val matchEnc = Encoders.product[SeqMatch]
    implicit val stateEnc = Encoders.product[PatternState]
    implicit val keyEnc = Encoders.scalaLong
    val withinUs = withinMs * 1000L
    val n = steps.length

    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[PatternState, SeqMatch](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (user: Long, it: Iterator[CepEvent], state: GroupState[PatternState]) =>
          var partials = state.getOption.map(_.partials).getOrElse(Nil)
          val out = List.newBuilder[SeqMatch]
          val batch = it.toArray.sortBy(e => (us(e.ts), e.event_id))
          var maxTs = 0L
          batch.foreach { e =>
            val t = us(e.ts)
            if (t > maxTs) maxTs = t
            // advance existing partials (greedy-first: a partial consumes
            // the first event matching its next step)
            partials = partials.flatMap { case p @ (ids, st, last) =>
              val next = ids.length // 0-based index of the awaited step
              if (next < n && steps(next)(e) &&
                  t > us(last) && t <= us(st) + withinUs) {
                val ids2 = e.event_id :: ids
                if (ids2.length == n) {
                  out += SeqMatch(user, ids2.reverse, st, e.ts)
                  Nil // completed
                } else List((ids2, st, e.ts))
              } else List(p)
            }
            // open a new partial on a start event
            if (steps.head(e))
              partials = (List(e.event_id), e.ts, e.ts) :: partials
          }
          // watermark horizon when configured (late events can still
          // advance a partial); batch max otherwise — see CepSequence
          val horizon = scala.util.Try(state.getCurrentWatermarkMs() * 1000L)
            .getOrElse(maxTs)
          partials = partials.filter { case (_, st, _) =>
            us(st) + withinUs >= horizon
          }
          state.update(PatternState(partials))
          out.result().iterator
      }
  }

  /** MEASURES-lite chains (r7): [[detectWhere]] scan rules plus one
    * span aggregate — while a partial is open, EVERY event of the key
    * (any type, conditions aside) folds into its accumulators; the
    * completing event is included, and the anchor seeds them. `fn` ∈
    * SUM|AVG|MIN|MAX|COUNT over the converter schema's `value` column
    * (COUNT counts span events). Matches the batch lexicographic-span
    * join exactly on in-order replay (MeasureSpec law in
    * CepSqlSpec/SubmitSqlSpec); out-of-order span events inside the
    * lateness bound still advance STEPS but cannot retro-enter an
    * already-accumulated span — batch is authoritative there. */
  def detectMeasure(events: Dataset[CepEvent],
      steps: Seq[CepEvent => Boolean], withinMs: Long, fn: String)
      : Dataset[MeasureMatch] = {
    require(steps.length >= 2, "a pattern needs at least 2 steps")
    val fnU = fn.toUpperCase(java.util.Locale.ROOT)
    require(Set("SUM", "AVG", "MIN", "MAX", "COUNT")(fnU),
      s"unsupported measure fn '$fn'")
    implicit val matchEnc = Encoders.product[MeasureMatch]
    implicit val stateEnc = Encoders.product[MeasureState]
    implicit val keyEnc = Encoders.scalaLong
    val withinUs = withinMs * 1000L
    val n = steps.length

    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[MeasureState, MeasureMatch](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (user: Long, it: Iterator[CepEvent], state: GroupState[MeasureState]) =>
          var partials = state.getOption.map(_.partials).getOrElse(Nil)
          val out = List.newBuilder[MeasureMatch]
          val batch = it.toArray.sortBy(e => (us(e.ts), e.event_id))
          var maxTs = 0L
          def result(p: MeasurePartial): Double = fnU match {
            case "SUM"   => p.sum
            case "AVG"   => p.sum / p.cnt
            case "MIN"   => p.mn
            case "MAX"   => p.mx
            case _       => p.cnt.toDouble
          }
          batch.foreach { e =>
            val t = us(e.ts)
            if (t > maxTs) maxTs = t
            partials = partials.flatMap { p =>
              // every event inside the open span accumulates first
              val acc = p.copy(sum = p.sum + e.value, cnt = p.cnt + 1,
                mn = math.min(p.mn, e.value), mx = math.max(p.mx, e.value))
              val next = p.ids.length
              if (next < n && steps(next)(e) &&
                  t > us(p.last) && t <= us(p.start) + withinUs) {
                val ids2 = e.event_id :: acc.ids
                if (ids2.length == n) {
                  out += MeasureMatch(user, ids2.reverse, acc.start, e.ts,
                    result(acc))
                  Nil
                } else List(acc.copy(ids = ids2, last = e.ts))
              } else List(acc)
            }
            if (steps.head(e))
              // the anchor event seeds its own partial's accumulators
              partials = MeasurePartial(List(e.event_id), e.ts, e.ts,
                e.value, 1L, e.value, e.value) :: partials
          }
          val horizon = scala.util.Try(state.getCurrentWatermarkMs() * 1000L)
            .getOrElse(maxTs)
          partials = partials.filter(p => us(p.start) + withinUs >= horizon)
          if (partials.isEmpty) state.remove()
          else state.update(MeasureState(partials))
          out.result().iterator
      }
  }

  /** Optional-step chains (r7, `ev?` — plain chains only): the scan
    * rules of [[detectWhere]] plus, when the awaited step is optional,
    * the NEXT step's class may claim the event instead, skipping the
    * optional step (regex-scan greedy: the optional class is tried
    * first, so an event in both classes counts as the optional match).
    * This decides per event — no waiting on window expiry — and matches
    * the batch composite-pivot rewrite exactly (OptChainSpec pins it).
    *
    * `optional(i)` marks step i optional. Callers guarantee the
    * [[CepSql.parsePattern]] shape: never on the first or last step,
    * never consecutive (so a skipped step's successor is concrete). */
  def detectOpt(events: Dataset[CepEvent],
      steps: Seq[CepEvent => Boolean], optional: Seq[Boolean],
      withinMs: Long): Dataset[OptSeqMatch] = {
    require(steps.length >= 2, "a pattern needs at least 2 steps")
    require(optional.length == steps.length,
      "one optional flag per step")
    require(!optional.head && !optional.last,
      "optional steps are mid-chain only")
    require(!optional.sliding(2).exists(p => p.forall(identity)),
      "consecutive optional steps are not supported")
    implicit val matchEnc = Encoders.product[OptSeqMatch]
    implicit val stateEnc = Encoders.product[OptPatternState]
    implicit val keyEnc = Encoders.scalaLong
    val withinUs = withinMs * 1000L
    val n = steps.length

    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[OptPatternState, OptSeqMatch](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (user: Long, it: Iterator[CepEvent], state: GroupState[OptPatternState]) =>
          var partials = state.getOption.map(_.partials).getOrElse(Nil)
          val out = List.newBuilder[OptSeqMatch]
          val batch = it.toArray.sortBy(e => (us(e.ts), e.event_id))
          var maxTs = 0L
          batch.foreach { e =>
            val t = us(e.ts)
            if (t > maxTs) maxTs = t
            partials = partials.flatMap { p =>
              val next = p.ids.length
              val inWin = t > us(p.last) && t <= us(p.start) + withinUs
              def adv(p2: OptPartial): List[OptPartial] =
                if (p2.ids.length == n) {
                  out += OptSeqMatch(user, p2.ids.reverse, p2.tss.reverse,
                    p2.start, e.ts)
                  Nil
                } else List(p2)
              if (!inWin || next >= n) List(p)
              else if (steps(next)(e))
                adv(OptPartial(Some(e.event_id) :: p.ids,
                  Some(e.ts) :: p.tss, p.start, e.ts))
              else if (optional(next) && steps(next + 1)(e))
                // skip the optional step: this event IS the successor's
                adv(OptPartial(Some(e.event_id) :: None :: p.ids,
                  Some(e.ts) :: None :: p.tss, p.start, e.ts))
              else List(p)
            }
            if (steps.head(e))
              partials = OptPartial(List(Some(e.event_id)),
                List(Some(e.ts)), e.ts, e.ts) :: partials
          }
          val horizon = scala.util.Try(state.getCurrentWatermarkMs() * 1000L)
            .getOrElse(maxTs)
          partials = partials.filter(p => us(p.start) + withinUs >= horizon)
          if (partials.isEmpty) state.remove()
          else state.update(OptPatternState(partials))
          out.result().iterator
      }
  }
}
