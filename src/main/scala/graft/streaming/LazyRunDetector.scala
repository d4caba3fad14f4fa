package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout,
  OutputMode}

/** RELUCTANT quantified 2-step patterns `A{m,}? THEN [NOT] B` per key
  * (r10) — the streaming twin of the batch reluctant `runsSub`
  * formulation, closing the two loud r9 carve-outs (`{1,}?` and the
  * 2-step reluctant absence).
  *
  * Reluctant semantics make this a DIFFERENT machine from
  * [[RunDetector]] (greedy, maximal-run): the truncated run is the
  * maximal run's FIRST m events, so the match anchors the moment the
  * open run's count reaches m — run_len is exactly m, run_end is the
  * m-th event's timestamp, and the completion window opens from there,
  * while the run itself may keep extending (no further anchor until a
  * non-run event breaks it and a fresh island re-qualifies). The anchor
  * decision needs NO knowledge of the run's eventual length — maximal
  * count ≥ m is guaranteed once the m-th event is seen — which is
  * exactly why the UNBOUNDED lazy form streams while the bounded
  * `{m,n}?` cannot (its qualification depends on the final maximal
  * length; it stays loudly batch-only).
  *
  * Completion mirrors [[RunDetector]]: the first `followPred` event
  * with ts strictly after run_end inside the window resolves
  * `Some(b_ts)` (a same-class event later in the SAME run can be that
  * completion, exactly like the batch join over all completion-class
  * events); a no-follow verdict waits for the WATERMARK to prove the
  * window closed (event-time timers, so silent keys resolve). State is
  * one open-run counter + the pending anchors inside the live window —
  * O(window), not O(stream).
  */
object LazyRunDetector {
  private def us(t: java.sql.Timestamp): Long =
    t.getTime / 1000 * 1000000L + t.getNanos / 1000

  def detectWhere(events: Dataset[CepEvent],
      runPred: CepEvent => Boolean, minLen: Int,
      followPred: CepEvent => Boolean, withinMs: Long,
      watermarkDelay: Option[String]): Dataset[RunMatch] = {
    require(minLen >= 1, "a reluctant run needs {m,}? with m >= 1")
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
            val wmUs = state.getCurrentWatermarkMs() * 1000L
            pending = pending.flatMap { p =>
              if (us(p.end) + withinUs <= wmUs) {
                out += RunMatch(user, p.count, p.start, p.end, None)
                Nil
              } else List(p)
            }
          } else {
            val wmUs = if (wmEnabled) state.getCurrentWatermarkMs() * 1000L
                       else Long.MaxValue
            val batch = it.toArray.sortBy(e => (us(e.ts), e.event_id))
            batch.foreach { e =>
              val t = us(e.ts)
              // 1. a non-run event breaks the open run — nothing pends
              //    here: the anchor was already taken at the m-th event
              if (!runPred(e)) open = None
              // 2. resolve pending anchors: first follow inside the
              //    window, or event-clock/watermark expiry (the
              //    RunDetector discipline verbatim)
              pending = pending.flatMap { p =>
                val end = us(p.end)
                if (followPred(e) && t > end && t <= end + withinUs) {
                  out += RunMatch(user, p.count, p.start, p.end, Some(e.ts))
                  Nil
                } else if (t > end + withinUs &&
                    (!wmEnabled || wmUs >= end + withinUs)) {
                  out += RunMatch(user, p.count, p.start, p.end, None)
                  Nil
                } else List(p)
              }
              // 3. a run event extends or opens the run; reaching m
              //    anchors the truncated match ONCE per island
              if (runPred(e)) {
                open = open match {
                  case Some(o) => Some(OpenRun(o.count + 1, o.start, e.ts))
                  case None    => Some(OpenRun(1, e.ts, e.ts))
                }
                if (open.exists(_.count == minLen))
                  pending =
                    PendingRun(minLen, open.get.start, e.ts) :: pending
              }
            }
          }
          if (open.isEmpty && pending.isEmpty) state.remove()
          else {
            state.update(RunDetState(open, pending))
            if (wmEnabled && pending.nonEmpty) {
              val nextMs =
                pending.map(p => (us(p.end) + withinUs) / 1000L + 1).min
              state.setTimeoutTimestamp(
                math.max(nextMs, state.getCurrentWatermarkMs() + 1))
            }
          }
          out.result().iterator
      }
  }
}
