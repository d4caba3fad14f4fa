package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** A completed quantified-pattern match: a maximal run of >= minLen
  * consecutive `runType` events, plus the first `followType` event within
  * the window after the run ended (None if none arrived in time). */
case class RunMatch(user_id: Long, run_len: Long, run_start: Timestamp,
    run_end: Timestamp, next_follow: Option[Timestamp])

/** The currently-open run (consecutive `runType` events, nothing between). */
case class OpenRun(count: Long, start: Timestamp, end: Timestamp)

/** A closed qualifying run awaiting its follow event or window expiry. */
case class PendingRun(count: Long, start: Timestamp, end: Timestamp)

case class RunDetState(open: Option[OpenRun], pending: List[PendingRun])

/** Quantified CEP pattern `A{minLen,} B?` per key — the streaming twin of
  * the batch key `q_cep_times` (SURVEY §2.9 C6c): maximal runs of
  * consecutive `runType` events (any other event breaks the run), emitted
  * once resolved with the first `followType` within `withinMs` after the
  * run's end, or with None once an event beyond the window proves no
  * follow can arrive (event-time clock, so replay-deterministic).
  *
  * Semantics match the batch gaps-and-islands formulation exactly under
  * the same (ts, event_id) total order: a run ends at the first
  * non-`runType` event; that event itself resolves the run when it is the
  * follow type and lands inside the window. State per key is one open run
  * + the pending runs whose window is still live — O(window), not
  * O(stream), so this runs unbounded (RocksDB state store at scale).
  */
object RunDetector {
  private def us(t: Timestamp): Long =
    t.getTime / 1000 * 1000000L + t.getNanos / 1000

  /** With `watermarkDelay` set (streaming), pending runs also flush via
    * EVENT-TIME TIMEOUT: once the global watermark proves no on-time
    * follow can still arrive (wm >= run_end + within), the run emits
    * `RunMatch(..., None)` even if its key never receives another event —
    * no per-key sentinel required. Open runs are NOT flushed by timeout:
    * a maximal run stays extendable until a non-run event closes it, and
    * emitting it early would under-report `run_len` vs batch. */
  def detect(events: Dataset[CepEvent], runType: String, minLen: Int,
      followType: String, withinMs: Long,
      watermarkDelay: Option[String] = None): Dataset[RunMatch] =
    detect(events, Set(runType), minLen, Set(followType), withinMs,
      watermarkDelay)

  /** Alternation form (r7): `runTypes`/`followTypes` are event-type
    * classes — a run is a maximal stretch of consecutive events whose
    * type is any member of `runTypes`. `maxLen` (r7, `{m,n}`/`{m}`) caps
    * the accepted run length with whole-run semantics: a maximal run
    * longer than the cap never qualifies (it is not truncated). */
  def detect(events: Dataset[CepEvent], runTypes: Set[String], minLen: Int,
      followTypes: Set[String], withinMs: Long,
      watermarkDelay: Option[String]): Dataset[RunMatch] =
    detect(events, runTypes, minLen, followTypes, withinMs, watermarkDelay,
      None)

  /** Bounded form: see `maxLen` note above. */
  def detect(events: Dataset[CepEvent], runTypes: Set[String], minLen: Int,
      followTypes: Set[String], withinMs: Long,
      watermarkDelay: Option[String],
      maxLen: Option[Int]): Dataset[RunMatch] =
    detectWhere(events, e => runTypes.contains(e.event_type), minLen,
      e => followTypes.contains(e.event_type), withinMs, watermarkDelay,
      maxLen)

  /** Predicate form (r8, DEFINE-lite conditions on the quantified-run
    * arm): `runPred`/`followPred` replace the class tests everywhere the
    * class tests appeared. For the run that means an event failing
    * `runPred` (wrong type OR failed condition) BREAKS the open run —
    * exactly the batch gaps-and-islands indicator, where the run
    * partition is `CASE WHEN <type AND cond> THEN 1 ELSE 0 END`; for the
    * follow it means a completion event outside the condition does not
    * resolve the run (but, failing `runPred` too, it still closes it). */
  def detectWhere(events: Dataset[CepEvent],
      runPred: CepEvent => Boolean, minLen: Int,
      followPred: CepEvent => Boolean, withinMs: Long,
      watermarkDelay: Option[String],
      maxLen: Option[Int]): Dataset[RunMatch] = {
    implicit val matchEnc = Encoders.product[RunMatch]
    implicit val stateEnc = Encoders.product[RunDetState]
    implicit val keyEnc = Encoders.scalaLong
    val withinUs = withinMs * 1000L
    val wmEnabled = watermarkDelay.isDefined && events.isStreaming
    val src = if (wmEnabled) events.withWatermark("ts", watermarkDelay.get)
              else events
    val timeoutConf = if (wmEnabled) GroupStateTimeout.EventTimeTimeout()
                      else GroupStateTimeout.NoTimeout()

    src.groupByKey(_.user_id)
      .flatMapGroupsWithState[RunDetState, RunMatch](
        OutputMode.Append(), timeoutConf) {
        (user: Long, it: Iterator[CepEvent], state: GroupState[RunDetState]) =>
          var open = state.getOption.flatMap(_.open)
          var pending = state.getOption.map(_.pending).getOrElse(Nil)
          val out = List.newBuilder[RunMatch]
          if (state.hasTimedOut) {
            // watermark-driven expiry: no event with ts <= wm can arrive,
            // so any window ending at/before wm is provably follow-less
            val wmUs = state.getCurrentWatermarkMs() * 1000L
            pending = pending.flatMap { p =>
              if (us(p.end) + withinUs <= wmUs) {
                out += RunMatch(user, p.count, p.start, p.end, None)
                Nil
              } else List(p)
            }
          } else {
            // with a watermark, a no-follow verdict may only be emitted
            // once the WATERMARK proves the window closed — a later-batch
            // follow inside the lateness bound could still resolve it
            // (Append mode cannot retract). Without one (in-order
            // replay), the event clock is the contract.
            val wmUs = if (wmEnabled) state.getCurrentWatermarkMs() * 1000L
                       else Long.MaxValue
            val batch = it.toArray.sortBy(e => (us(e.ts), e.event_id))
            batch.foreach { e =>
              val t = us(e.ts)
              // 1. a non-run event closes the open run (maximal-run island)
              if (!runPred(e)) {
                open.foreach { o =>
                  if (o.count >= minLen && maxLen.forall(o.count <= _))
                    pending = PendingRun(o.count, o.start, o.end) :: pending
                }
                open = None
              }
              // 2. resolve pendings: this event is the follow inside the
              //    window (events arrive time-ordered, so it's the FIRST),
              //    or its clock proves a window can no longer be met
              pending = pending.flatMap { p =>
                val end = us(p.end)
                if (followPred(e) && t > end &&
                    t <= end + withinUs) {
                  out += RunMatch(user, p.count, p.start, p.end, Some(e.ts))
                  Nil
                } else if (t > end + withinUs &&
                    (!wmEnabled || wmUs >= end + withinUs)) {
                  out += RunMatch(user, p.count, p.start, p.end, None)
                  Nil
                } else List(p)
              }
              // 3. a run event extends or opens the run
              if (runPred(e)) {
                open = open match {
                  case Some(o) => Some(OpenRun(o.count + 1, o.start, e.ts))
                  case None    => Some(OpenRun(1, e.ts, e.ts))
                }
              }
            }
          }
          if (open.isEmpty && pending.isEmpty)
            // nothing live for this key: REMOVE the state row so the
            // store stays O(keys-with-live-runs), not O(keys-ever-seen)
            state.remove()
          else {
            state.update(RunDetState(open, pending))
            if (wmEnabled && pending.nonEmpty) {
              // arm the timeout for the earliest pending window's expiry
              // (must be strictly beyond the current watermark)
              val nextMs = pending.map(p => (us(p.end) + withinUs) / 1000L + 1).min
              state.setTimeoutTimestamp(
                math.max(nextMs, state.getCurrentWatermarkMs() + 1))
            }
          }
          out.result().iterator
      }
  }
}
