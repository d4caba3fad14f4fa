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

/** A multi-measured N-step match (r8): `vals(i)` is measure i's value in
  * the declared MEASURES order (MATCH_NUMBER as a double — exact for any
  * realistic count; [[ContinuousQueries]] casts it back to long). */
case class MeasureNMatch(user_id: Long, step_ids: Seq[Long],
    start_ts: Timestamp, end_ts: Timestamp, vals: Seq[Double])

/** One open multi-measured partial: ids AND per-step captured column
  * vectors (both reversed; one slot per distinct class-ref column),
  * anchor/last ts, and the span accumulators — one sum/min/max slot per
  * distinct aggregated column (r8: measures read ANY numeric converter
  * column, not just `value`), one shared count. */
case class MeasureNPartial(ids: List[Long], cvals: List[Seq[Double]],
    start: Timestamp, last: Timestamp,
    sums: Seq[Double], cnt: Long, mns: Seq[Double], mxs: Seq[Double])

/** A completed match held back for MATCH_NUMBER ordering (ids/cvals in
  * chain order). */
case class MeasureNDone(ids: List[Long], cvals: List[Seq[Double]],
    start: Timestamp, end: Timestamp,
    sums: Seq[Double], cnt: Long, mns: Seq[Double], mxs: Seq[Double])

/** `counter` is the last assigned match number — it must survive even
  * when no partials/done remain, or numbering would restart. */
case class MeasureNState(partials: List[MeasureNPartial],
    done: List[MeasureNDone], counter: Long,
    // completed positive prefixes awaiting the absent form's watermark
    // verdict (r14) — accumulators frozen at the last positive match.
    // NOTE: adding this field breaks state-store schema compatibility
    // with pre-r14 checkpoints of measure queries (MIGRATION.md §4).
    waiting: List[MeasureNDone] = Nil)

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

  /** Numeric accessor for a converter-schema column — the r8 lift of the
    * value-only MEASURES restriction. `event_id`/`user_id` are exact as
    * doubles (< 2^53); non-numeric columns (`ts`, `event_type`, anything
    * outside the converter schema) stay batch-only, rejected loudly. */
  private def numSel(c: String): CepEvent => Double =
    c.toLowerCase(java.util.Locale.ROOT) match {
      case "value"    => _.value
      case "event_id" => _.event_id.toDouble
      case "user_id"  => _.user_id.toDouble
      case other => throw new IllegalArgumentException(
        s"streaming measures/conditions read the converter schema's " +
          s"numeric columns (value, event_id, user_id) — got '$other'; " +
          "run the batch rewrite via CepSql.sql")
    }

  /** [[numSel]] for [[ContinuousQueries]]' step-condition dispatch. */
  private[streaming] def numColumn(c: String): CepEvent => Double = numSel(c)

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
    val fnU = fn.toUpperCase(java.util.Locale.ROOT)
    require(Set("SUM", "AVG", "MIN", "MAX", "COUNT")(fnU),
      s"unsupported measure fn '$fn'")
    implicit val matchEnc = Encoders.product[MeasureMatch]
    detectMeasures(events, steps, withinMs,
      Seq(CepSql.SpanAgg(fnU, if (fnU == "COUNT") "*" else "value",
        "measure")))
      .map(m => MeasureMatch(m.user_id, m.step_ids, m.start_ts, m.end_ts,
        m.vals.head))
  }

  /** Multi-measure chains (r8): [[detectMeasure]]'s scan generalized to
    * the full [[CepSql.Measure]] list — several span aggregates (they
    * share one set of accumulators), per-class references (step i's
    * matched `value` is captured as the chain advances), and
    * `MATCH_NUMBER()`.
    *
    * MATCH_NUMBER changes the emission discipline: batch numbers matches
    * in (ts_1, id_1) order per key, so a match may only take its number
    * once no earlier-anchored match can still appear. A completed match
    * is therefore HELD until (a) its own window has closed behind the
    * watermark (no later completion for an earlier anchor can beat it —
    * any still-open earlier anchor's window closes no later than this
    * one's) and (b) no still-open partial is anchored before it. Numbered
    * release is watermark-driven via an event-time timer, so it needs a
    * WATERMARKED input ([[ContinuousQueries.submitPattern]] provides
    * one); without MATCH_NUMBER the r7 behavior is unchanged — matches
    * emit the moment they complete, watermark optional (batch-max
    * fallback). The per-key state with MATCH_NUMBER keeps the counter
    * alive forever (one long — numbering must not restart); partials and
    * held matches stay bounded by the window as before. */
  /** `absentPred` (r14): the trailing NOT step's predicate — `steps`
    * then lists only the POSITIVE prefix. A partial completing the
    * prefix parks with FROZEN accumulators (the batch span covers
    * anchor .. the last positive match); an absent-class event strictly
    * after that match and inside the anchor window kills it; the
    * no-follow verdict emits once the watermark passes the anchor
    * deadline (timer-driven — a WATERMARKED streaming input is
    * required; matches the batch rewrite's anti-join-wrapped measures,
    * q_measure_absent). MATCH_NUMBER composes: verdicts join the held
    * list and release in (ts_1, id_1) order. */
  def detectMeasures(events: Dataset[CepEvent],
      steps: Seq[CepEvent => Boolean], withinMs: Long,
      measures: Seq[CepSql.Measure],
      absentPred: Option[CepEvent => Boolean] = None)
      : Dataset[MeasureNMatch] = {
    val absent = absentPred.isDefined
    require(steps.length >= 2 || (absent && steps.nonEmpty),
      "a pattern needs at least 2 steps")
    require(!absent || events.isStreaming,
      "the absent measures form needs a STREAMING watermarked input " +
        "(no-Z verdicts are timer-driven; for batch input use the " +
        "batch rewrite via CepSql.sql)")
    require(measures.nonEmpty, "at least one measure")
    val n = steps.length
    measures.foreach {
      case CepSql.SpanAgg(fn, c, _) =>
        require(Set("SUM", "AVG", "MIN", "MAX", "COUNT")(fn),
          s"unsupported measure fn '$fn'")
        if (c != "*") numSel(c) // throws loudly on a non-numeric column
      case CepSql.ClassRef(_, c, step, _) =>
        numSel(c)
        require(step >= 1 && step <= n, s"class-ref step $step out of range")
      case CepSql.MatchNum(_) => ()
    }
    // one accumulator slot per DISTINCT aggregated column; one capture
    // slot per distinct class-ref column — `MEASURES SUM(value),
    // MAX(event_id), b.event_id` costs two agg slots + one capture slot
    val aggCols = measures.collect {
      case CepSql.SpanAgg(fn, c, _) if fn != "COUNT" && c != "*" =>
        c.toLowerCase(java.util.Locale.ROOT)
    }.distinct
    val refCols = measures.collect { case CepSql.ClassRef(_, c, _, _) =>
      c.toLowerCase(java.util.Locale.ROOT)
    }.distinct
    val aggSels = aggCols.map(numSel)
    val refSels = refCols.map(numSel)
    val hasNum = measures.exists(_.isInstanceOf[CepSql.MatchNum])
    implicit val matchEnc = Encoders.product[MeasureNMatch]
    implicit val stateEnc = Encoders.product[MeasureNState]
    implicit val keyEnc = Encoders.scalaLong
    val withinUs = withinMs * 1000L
    val timeoutConf =
      if (hasNum || absent) GroupStateTimeout.EventTimeTimeout()
      else GroupStateTimeout.NoTimeout()

    def vals(d: MeasureNDone, no: Long): Seq[Double] = measures.map {
      case CepSql.SpanAgg(fn, c, _) =>
        lazy val i = aggCols.indexOf(c.toLowerCase(java.util.Locale.ROOT))
        fn match {
          case "SUM" => d.sums(i)
          case "AVG" => d.sums(i) / d.cnt
          case "MIN" => d.mns(i)
          case "MAX" => d.mxs(i)
          case _     => d.cnt.toDouble
        }
      case CepSql.ClassRef(_, c, step, _) =>
        d.cvals(step - 1)(
          refCols.indexOf(c.toLowerCase(java.util.Locale.ROOT)))
      case CepSql.MatchNum(_) => no.toDouble
    }

    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[MeasureNState, MeasureNMatch](
        OutputMode.Append(), timeoutConf) {
        (user: Long, it: Iterator[CepEvent], state: GroupState[MeasureNState]) =>
          val prev = state.getOption.getOrElse(MeasureNState(Nil, Nil, 0L))
          var partials = prev.partials
          var done = prev.done
          var counter = prev.counter
          var waiting = prev.waiting
          val out = List.newBuilder[MeasureNMatch]
          val batch =
            if (state.hasTimedOut) Array.empty[CepEvent]
            else it.toArray.sortBy(e => (us(e.ts), e.event_id))
          var maxTs = 0L
          batch.foreach { e =>
            val t = us(e.ts)
            if (t > maxTs) maxTs = t
            val ev = aggSels.map(_(e))
            partials = partials.flatMap { p =>
              // every event inside the open span accumulates first
              val acc = p.copy(
                sums = p.sums.lazyZip(ev).map(_ + _), cnt = p.cnt + 1,
                mns = p.mns.lazyZip(ev).map(math.min),
                mxs = p.mxs.lazyZip(ev).map(math.max))
              val next = p.ids.length
              if (next < n && steps(next)(e) &&
                  t > us(p.last) && t <= us(p.start) + withinUs) {
                val ids2 = e.event_id :: acc.ids
                val cv2 = refSels.map(_(e)) :: acc.cvals
                if (ids2.length == n) {
                  val d = MeasureNDone(ids2.reverse, cv2.reverse,
                    acc.start, e.ts, acc.sums, acc.cnt, acc.mns, acc.mxs)
                  // absent (r14): the completed PREFIX parks with
                  // frozen accumulators until the watermark verdict
                  if (absent) waiting = d :: waiting
                  else if (hasNum) done = d :: done
                  else out += MeasureNMatch(user, d.ids, d.start, d.end,
                    vals(d, 0L))
                  Nil
                } else List(acc.copy(ids = ids2, cvals = cv2, last = e.ts))
              } else List(acc)
            }
            if (steps.head(e)) {
              // the anchor event seeds its own partial's accumulators;
              // a 1-step positive prefix (`a THEN NOT b`) is complete
              // AT the anchor — park it directly
              if (n == 1 && absent)
                waiting = MeasureNDone(List(e.event_id),
                  List(refSels.map(_(e))), e.ts, e.ts, ev, 1L, ev, ev) ::
                  waiting
              else
                partials = MeasureNPartial(List(e.event_id),
                  List(refSels.map(_(e))), e.ts, e.ts,
                  ev, 1L, ev, ev) :: partials
            }
            // absent kill scan (r14): a NOT-class event strictly after
            // a parked prefix's last positive match and inside its
            // anchor window kills it — the batch anti join verbatim
            absentPred.foreach { np =>
              if (np(e))
                waiting = waiting.filter(d =>
                  !(t > us(d.end) && t <= us(d.start) + withinUs))
            }
          }
          val horizon = scala.util.Try(state.getCurrentWatermarkMs() * 1000L)
            .getOrElse(maxTs)
          partials = partials.filter(p => us(p.start) + withinUs >= horizon)
          // absent verdicts (r14): once the watermark passes a parked
          // prefix's anchor deadline STRICTLY, no admissible NOT-class
          // event can still kill it — emit (or hold for numbering)
          if (absent) {
            val (ripe, still) = waiting.partition(d =>
              us(d.start) + withinUs < horizon)
            waiting = still
            ripe.foreach { d =>
              if (hasNum) done = d :: done
              else out += MeasureNMatch(user, d.ids, d.start, d.end,
                vals(d, 0L))
            }
          }
          if (hasNum) {
            // numbered release: window closed AND no open partial is
            // anchored before it ((ts, id_1) order — such a partial
            // could still complete into an earlier-numbered match)
            val minOpen = (partials.map(p => (us(p.start), p.ids.last)) ++
              waiting.map(d => (us(d.start), d.ids.head)))
              .minOption
            val releasable = (d: MeasureNDone) =>
              us(d.start) + withinUs <= horizon &&
                minOpen.forall(o =>
                  Ordering[(Long, Long)].gt(o, (us(d.start), d.ids.head)))
            val (rel, keep) = done.partition(releasable)
            rel.sortBy(d => (us(d.start), d.ids.head)).foreach { d =>
              counter += 1
              out += MeasureNMatch(user, d.ids, d.start, d.end,
                vals(d, counter))
            }
            done = keep
          }
          if (partials.isEmpty && done.isEmpty && waiting.isEmpty &&
              counter == 0L)
            state.remove()
          else {
            state.update(MeasureNState(partials, done, counter, waiting))
            if ((hasNum || absent) &&
                (done.nonEmpty || partials.nonEmpty || waiting.nonEmpty)) {
              // wake when the earliest still-relevant window closes
              val targetMs = (done.map(d => us(d.start)) ++
                waiting.map(d => us(d.start)) ++
                partials.map(p => us(p.start)))
                .map(_ / 1000L + withinMs + 1).min
              state.setTimeoutTimestamp(
                math.max(targetMs, state.getCurrentWatermarkMs() + 1))
            }
          }
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
