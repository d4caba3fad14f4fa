package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout,
  OutputMode}

/** A 3-way PERMUTE match, fields in MATCH order (the batch rewrite's
  * column set: anchor class name + the three event ids/timestamps). */
case class Permute3Match(user_id: Long, first_ev: String,
    id_1: Long, id_2: Long, id_3: Long,
    ts_1: Timestamp, ts_2: Timestamp, ts_3: Timestamp)

/** Per-anchor tracker: the anchor event plus BOTH candidate orders'
  * progress. `ids1`/`tss1` hold arm 1's post-anchor events (reversed,
  * newest first); same for arm 2. `held*` is arm 2's completed triple
  * waiting for arm 1's window to provably close (alternation
  * preference). */
case class P3Tracker(anchorId: Long, anchorTs: Timestamp, cls: Int,
    ids1: Seq[Long], tss1: Seq[Timestamp],
    ids2: Seq[Long], tss2: Seq[Timestamp],
    held: Boolean, heldIds: Seq[Long], heldTss: Seq[Timestamp])
case class P3State(trackers: List[P3Tracker])

/** Streaming `PERMUTE(a, b, c)` (r10) — the r9 batch rewrite's
  * semantics, per-partial: every a/b/c event ANCHORS a tracker; the
  * anchor's two candidate orders ((X, Y, Z) then (X, Z, Y), Y before Z
  * in listed order) advance independently over the SAME within-window
  * by the greedy rank-1 scan rule every chain detector shares (first
  * qualifying event per step, strictly later than the previous).
  * Alternation preference — "the second order fires only for anchors
  * the first left unmatched" — is the consumed-island suppressor
  * discipline: arm 1 completing EMITS immediately and kills the
  * tracker (any held arm 2 triple is discarded — listed order, not
  * temporal order, wins); arm 2 completing is HELD until the anchor's
  * window provably closes behind the watermark (arm 1 can then never
  * complete — its window IS the anchor's window), released by an
  * event-time timer so a silent key still resolves. Replay of the
  * events table ≡ the batch rewrite is pinned by SubmitSqlSpec;
  * checkpoint recovery of held triples by RecoverySpec.
  *
  * State is ∝ anchors inside the (within + lateness) horizon per key —
  * the same bound every other detector carries (windows behind the
  * watermark are pruned each invocation, timer-driven on idle keys).
  *
  * Lateness note (applies to every watermarked detector, found by the
  * r10 permute fuzz): with `withWatermark(ts, "0 seconds")`, an event
  * whose ts EQUALS the current watermark — an equal-ts tie whose twin
  * landed at the end of the previous micro-batch — is dropped by
  * Spark's late-row filter before any detector logic runs. Data dense
  * enough to carry same-timestamp ties needs a nonzero lateness at
  * least as wide as the tie granularity.
  *
  * Cites the reference MATCH_RECOGNIZE PERMUTE surface (SURVEY §2.9
  * C6); the rewrite itself is original (see CepSql.translatePermute3).
  */
object Permute3Detector {
  private def us(t: Timestamp): Long =
    t.getTime / 1000 * 1000000L + t.getNanos / 1000

  /** `names` are the three LISTED event classes (grammar-validated
    * distinct plain names); `events` must be watermarked (event-time
    * timers drive held-release and idle-key pruning). */
  def detect(events: Dataset[CepEvent], names: Seq[String],
      withinMs: Long): Dataset[Permute3Match] = {
    require(names.length == 3 && names.distinct.length == 3,
      "PERMUTE(a, b, c) needs three distinct event names")
    implicit val matchEnc = Encoders.product[Permute3Match]
    implicit val stateEnc = Encoders.product[P3State]
    implicit val keyEnc = Encoders.scalaLong
    val withinUs = withinMs * 1000L
    // for anchor class x, the other two classes in LISTED order:
    // arm 1 = (y, z), arm 2 = (z, y)
    val others: IndexedSeq[(Int, Int)] = IndexedSeq.tabulate(3) { x =>
      val rest = (0 until 3).filterNot(_ == x)
      (rest(0), rest(1))
    }

    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[P3State, Permute3Match](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (user: Long, it: Iterator[CepEvent], state: GroupState[P3State]) =>
          var trackers = state.getOption.map(_.trackers).getOrElse(Nil)
          val out = List.newBuilder[Permute3Match]
          def emit(tr: P3Tracker, ids: Seq[Long],
              tss: Seq[Timestamp]): Unit = {
            // ids/tss reversed (newest first) → restore MATCH order
            val Seq(i3, i2) = ids.take(2)
            val Seq(t3, t2) = tss.take(2)
            out += Permute3Match(user, names(tr.cls), tr.anchorId, i2, i3,
              tr.anchorTs, t2, t3)
          }
          val batch =
            if (state.hasTimedOut) Array.empty[CepEvent]
            else it.toArray.sortBy(e => (us(e.ts), e.event_id))
          var maxTs = 0L
          batch.foreach { e =>
            val t = us(e.ts)
            if (t > maxTs) maxTs = t
            val eCls = names.indexOf(e.event_type)
            if (eCls >= 0) {
              trackers = trackers.flatMap { tr =>
                val endUs = us(tr.anchorTs) + withinUs
                val (y, z) = others(tr.cls)
                // arm 1 first: listed-order preference — if this event
                // completes arm 1, the tracker resolves NOW
                val await1 = if (tr.ids1.isEmpty) y else z
                val last1 =
                  if (tr.tss1.isEmpty) us(tr.anchorTs) else us(tr.tss1.head)
                val adv1 = eCls == await1 && t > last1 && t <= endUs
                if (adv1 && tr.ids1.length == 1) {
                  emit(tr, e.event_id +: tr.ids1, e.ts +: tr.tss1)
                  Nil // arm 1 won; any held arm 2 triple is discarded
                } else {
                  var t2 = tr
                  if (adv1)
                    t2 = t2.copy(ids1 = e.event_id +: t2.ids1,
                      tss1 = e.ts +: t2.tss1)
                  // arm 2 (z, y) advances independently unless held
                  if (!t2.held) {
                    val await2 = if (t2.ids2.isEmpty) z else y
                    val last2 =
                      if (t2.tss2.isEmpty) us(t2.anchorTs)
                      else us(t2.tss2.head)
                    if (eCls == await2 && t > last2 && t <= endUs) {
                      if (t2.ids2.length == 1)
                        t2 = t2.copy(held = true,
                          heldIds = e.event_id +: t2.ids2,
                          heldTss = e.ts +: t2.tss2)
                      else
                        t2 = t2.copy(ids2 = e.event_id +: t2.ids2,
                          tss2 = e.ts +: t2.tss2)
                    }
                  }
                  List(t2)
                }
              }
              // every a/b/c event also anchors its own tracker
              trackers = P3Tracker(e.event_id, e.ts, eCls,
                Nil, Nil, Nil, Nil, held = false, Nil, Nil) :: trackers
            }
          }
          // windows provably closed behind the watermark: arm 1 can
          // never complete — release held arm 2 triples, prune the rest
          val horizon = scala.util.Try(state.getCurrentWatermarkMs() * 1000L)
            .getOrElse(maxTs)
          val (dead, live) = trackers.partition(tr =>
            us(tr.anchorTs) + withinUs < horizon)
          dead.filter(_.held)
            .sortBy(tr => (us(tr.anchorTs), tr.anchorId))
            .foreach(tr => emit(tr, tr.heldIds, tr.heldTss))
          trackers = live
          if (trackers.isEmpty) state.remove()
          else {
            state.update(P3State(trackers))
            // wake when the earliest open window closes (held release
            // and idle-key pruning must not wait for new key events)
            val targetMs = trackers
              .map(tr => us(tr.anchorTs) / 1000L + withinMs + 1).min
            state.setTimeoutTimestamp(
              math.max(targetMs, state.getCurrentWatermarkMs() + 1))
          }
          out.result().iterator
      }
  }
}
