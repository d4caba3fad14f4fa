package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, Row}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.operators.SkipMatch
import graft.operators.SkipMatch.Ev

/** One buffered pattern-relevant event (mask: bit j = in step j's class). */
case class SkipBufEvent(id: Long, ts: Timestamp, mask: Int)

/** Per-key skip-past state: the undecided event buffer plus the last
  * consumed row ((ts µs, id) of the previous match's final pick). */
case class SkipDetState(buf: List[SkipBufEvent], lastTsUs: Long,
    lastId: Long)

/** Streaming AFTER MATCH SKIP PAST LAST ROW (r7) — the continuous twin of
  * [[graft.operators.SkipMatch]], sharing its greedy core verbatim.
  *
  * Greedy non-overlapping matching is ORDER-dependent: one late event can
  * change every subsequent match of its key. Correctness therefore hangs
  * on the finalization horizon (the event-time watermark): a completed
  * chain is emitted only once its anchor and every pick are at or below
  * the watermark (any future event must carry ts > watermark, so no
  * earlier-sorting pick can still arrive); a failed anchor unblocks its
  * successors only once its whole window is below the watermark. The
  * first anchor that can do neither blocks the scan, and an event-time
  * timeout re-runs it when the watermark passes the blocking window —
  * emission needs no further input rows for the key.
  *
  * State per key is the undecided suffix of the event buffer — bounded by
  * window + lateness — and the state row is REMOVED when the buffer
  * drains (future anchors sort after the watermark, which already exceeds
  * the last consumed row, so `lastTsUs` need not outlive the buffer).
  * Without a watermark (in-order replay / batch smoke), the per-key batch
  * maximum is the horizon — the same contract every other detector here
  * uses.
  */
object SkipDetector {
  private def us(t: Timestamp): Long =
    t.getTime / 1000 * 1000000L + t.getNanos / 1000

  /** `steps`: one event-type class per step (size > 1 = alternation).
    * Output rows: (user_id, id_1…id_n, ts_1…ts_n), the
    * [[graft.operators.SkipMatch]] schema. */
  def detect(events: Dataset[CepEvent], steps: Seq[Set[String]],
      withinMs: Long, watermarkDelay: Option[String] = None): DataFrame =
    detectWhere(events,
      steps.map(cls => (e: CepEvent) => cls.contains(e.event_type)),
      withinMs, watermarkDelay)

  /** Predicate form (r8, DEFINE-lite conditions on the skip-past arm):
    * the step bitmask is computed from the predicates (bit j = predicate
    * j accepts the event), so a same-class event outside its condition
    * is invisible to step j — exactly [[SkipMatch.matchChain]]'s
    * `type AND cond` mask; the greedy core is shared unchanged. */
  def detectWhere(events: Dataset[CepEvent],
      preds: Seq[CepEvent => Boolean], withinMs: Long,
      watermarkDelay: Option[String] = None): DataFrame = {
    require(preds.length >= 2, "a pattern needs at least 2 steps")
    val n = preds.length
    val predArr = preds.toArray
    def maskOf(e: CepEvent): Int = {
      var mask = 0
      var j = 0
      while (j < n) {
        if (predArr(j)(e)) mask |= 1 << j
        j += 1
      }
      mask
    }
    val withinUs = withinMs * 1000L
    val wmEnabled = watermarkDelay.isDefined && events.isStreaming

    implicit val stateEnc = Encoders.product[SkipDetState]
    implicit val rowEnc = Encoders.row(SkipMatch.outSchema("user_id", n))
    implicit val keyEnc = Encoders.scalaLong

    // mask-0 events are skipped by every greedyScan check — pruning them
    // before the shuffle is semantics-free, like matchChain's type filter
    val src0 = events.filter(e => maskOf(e) != 0)
    val src = if (wmEnabled) src0.withWatermark("ts", watermarkDelay.get)
              else src0
    val timeoutConf = if (wmEnabled) GroupStateTimeout.EventTimeTimeout()
                      else GroupStateTimeout.NoTimeout()

    src.groupByKey(_.user_id)
      .flatMapGroupsWithState[SkipDetState, Row](
        OutputMode.Append(), timeoutConf) {
        (user: Long, it: Iterator[CepEvent], state: GroupState[SkipDetState]) =>
          val prev = state.getOption.getOrElse(
            SkipDetState(Nil, Long.MinValue, Long.MinValue))
          var batchMax = Long.MinValue
          val fresh = if (state.hasTimedOut) Nil else it.map { e =>
            val t = us(e.ts)
            if (t > batchMax) batchMax = t
            SkipBufEvent(e.event_id, e.ts, maskOf(e))
          }.toList
          // INCLUSIVE horizon: greedyScan finalizes tsUs <= horizon.
          // Safe at the exact boundary because Spark drops late rows at
          // ts <= watermark (LessThanOrEqual predicate, verified against
          // the 4.1.2 bytecode — see greedyScan's scaladoc), so no event
          // with ts equal to the current watermark can arrive in a later
          // batch (ADVICE r7 investigated: its premise that rows at the
          // watermark are kept is false for stateful operators).
          val horizon =
            if (wmEnabled) state.getCurrentWatermarkMs() * 1000L
            else batchMax
          val evs = (prev.buf ++ fresh)
            .map(b => Ev(us(b.ts), b.id, b.ts, b.mask))
            .toArray
          java.util.Arrays.sort(evs,
            Ordering.by((e: Ev) => (e.tsUs, e.id)))
          val (matches, lastTs, lastId, pendingIdx) =
            SkipMatch.greedyScan(evs, n, withinUs,
              prev.lastTsUs, prev.lastId, horizon)
          // retain the undecided suffix: everything from the blocking
          // anchor onward (it may yet match, and later events may anchor
          // after it), plus anything above the horizon (not final). All
          // of it sorts after the last consumed row by construction.
          val keep =
            if (pendingIdx >= 0) evs.drop(pendingIdx)
            else evs.filter(_.tsUs > horizon)
          if (keep.isEmpty) state.remove()
          else {
            state.update(SkipDetState(
              keep.map(e => SkipBufEvent(e.id, e.ts, e.mask)).toList,
              lastTs, lastId))
            if (wmEnabled) {
              // wake when the watermark clears the blocking window (or,
              // with no anchor pending, once it passes the buffer so the
              // suffix can finalize and evict)
              val targetMs =
                if (pendingIdx >= 0)
                  (evs(pendingIdx).tsUs + withinUs) / 1000L + 1
                else keep.map(_.tsUs).max / 1000L + 1
              state.setTimeoutTimestamp(
                math.max(targetMs, state.getCurrentWatermarkMs() + 1))
            }
          }
          matches.iterator.map(picks => SkipMatch.toRow(user, picks))
      }.toDF()
  }
}
