package graft.streaming

import java.sql.{Date, Timestamp}

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout,
  OutputMode}

/** Streaming twins of the batch time-series keys (r9): LOCF gap-fill
  * (`q_gap_fill`) and daily time-weighted average (`q_twap`) as per-key
  * FORWARD-CARRY state machines — the discipline
  * [[graft.operators.TemporalJoins]]' forward-carry as-of join proves
  * batch-side: a value holds until the key's next event, so the only
  * state is the last observation (plus the open bucket's accumulator),
  * O(1) per key regardless of history.
  *
  * Both operators emit a bucket when a LATER-bucket event of the same
  * key arrives (the bucket is then provably closed); replaying the
  * events table in (ts, id) order reproduces the oracle-checked batch
  * keys exactly (StreamingTwinSpec law), with a far-future flush event
  * per key closing the final buckets. Out-of-order events WITHIN a
  * micro-batch are re-sorted; events arriving after their bucket closed
  * are dropped (batch is authoritative for retro data — the same
  * documented contract as the CEP detectors). */
object TimeSeriesOps {
  private def us(t: Timestamp): Long =
    t.getTime / 1000 * 1000000L + t.getNanos / 1000
  private def r4(x: Double): Double = math.floor(x * 1e4 + 0.5) / 1e4
  private val DayUs = 86400000000L
  private val HourUs = 3600000000L
  private val EpochDay2024 = java.time.LocalDate.of(2024, 1, 1).toEpochDay

  /** The batch keys' week bucket: floor((UTC day − 2024-01-01) / 7) —
    * floor division, matching `floor(datediff(...) / 7)` exactly
    * (including pre-epoch timestamps). */
  private def weekOf(tUs: Long): Long =
    Math.floorDiv(Math.floorDiv(tUs, DayUs) - EpochDay2024, 7L)

  case class TwapRow(user_id: Long, day: Date, n_events: Long,
      twap: Double)
  case class TwapState(day: Long, lastTs: Long, lastVal: Double,
      sumVD: Double, sumD: Long, n: Long)

  /** Daily TWAP per user: each event's value holds until the user's
    * next event, capped at the UTC day boundary — weights are exact
    * integer microseconds, only the final quotient rounds (4 dp), the
    * exact `q_twap` arithmetic. A day emits when a later-day event (or
    * the flush) proves it closed: the last value's segment runs to the
    * day end.
    *
    * `flushType` events (the replay sentinel, same contract as [[scd2]])
    * close the key's open day WITHOUT entering the accumulator — r10
    * ADVICE fix: previously the sentinel opened a phantom bucket
    * (day-of-flush, value 0.0) in state, which a later event would have
    * emitted as a fabricated TWAP row. */
  def twapDaily(events: Dataset[CepEvent],
      flushType: String = "zz_flush"): Dataset[TwapRow] = {
    implicit val rowEnc = Encoders.product[TwapRow]
    implicit val stEnc = Encoders.product[TwapState]
    implicit val keyEnc = Encoders.scalaLong
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[TwapState, TwapRow](OutputMode.Append(),
        GroupStateTimeout.NoTimeout()) {
        (user: Long, it: Iterator[CepEvent],
            state: GroupState[TwapState]) =>
          var st = state.getOption.orNull
          val out = List.newBuilder[TwapRow]
          def close(s: TwapState): TwapRow = {
            val d = (s.day + 1) * DayUs - s.lastTs
            TwapRow(user,
              Date.valueOf(java.time.LocalDate.ofEpochDay(s.day)), s.n,
              r4((s.sumVD + s.lastVal * d) / (s.sumD + d)))
          }
          it.toArray.sortBy(e => (us(e.ts), e.event_id)).foreach { e =>
            val t = us(e.ts)
            val d = Math.floorDiv(t, DayUs)
            if (e.event_type == flushType) {
              // horizon sentinel: close the open day, never accumulate
              if (st != null && d > st.day) { out += close(st); st = null }
            } else if (st == null)
              st = TwapState(d, t, e.value, 0.0, 0L, 1L)
            else if (d == st.day) {
              val dur = t - st.lastTs
              st = TwapState(d, t, e.value,
                st.sumVD + st.lastVal * dur, st.sumD + dur, st.n + 1)
            } else if (d > st.day) {
              out += close(st)
              st = TwapState(d, t, e.value, 0.0, 0L, 1L)
            } // d < st.day: retro event into a closed day — dropped
          }
          if (st == null) state.remove() else state.update(st)
          out.result().iterator
      }
  }

  case class EwmaRow(user_id: Long, ts: Timestamp, event_id: Long,
      ewma: Double)
  case class EwmaState(ring: Seq[Double])

  /** Per-user EWMA over the last 16 observations (the exact `q_ewma`
    * kernel: weights 0.75^k, k = 0 newest, numerator and denominator
    * folded in ascending-k order so the float sums are bit-identical to
    * the batch 16-lag window fold). State = a ≤16-value ring — O(1) per
    * key, the [[RollingStats]] discipline. */
  def ewma(events: Dataset[CepEvent]): Dataset[EwmaRow] = {
    implicit val rowEnc = Encoders.product[EwmaRow]
    implicit val stEnc = Encoders.product[EwmaState]
    implicit val keyEnc = Encoders.scalaLong
    val wts = (0 to 15).map(k => math.pow(0.75, k))
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[EwmaState, EwmaRow](OutputMode.Append(),
        GroupStateTimeout.NoTimeout()) {
        (user: Long, it: Iterator[CepEvent],
            state: GroupState[EwmaState]) =>
          var ring = state.getOption.map(_.ring).getOrElse(Nil)
          val out = List.newBuilder[EwmaRow]
          it.toArray.sortBy(e => (us(e.ts), e.event_id)).foreach { e =>
            ring = (e.value +: ring).take(16)
            // the batch fold adds a 0.0 term for each missing lag —
            // replicate term for term so the sum order is identical
            val num = (0 to 15).foldLeft(0.0)((a, k) =>
              a + (if (k < ring.length) ring(k) * wts(k) else 0.0))
            val den = (0 to 15).foldLeft(0.0)((a, k) =>
              a + (if (k < ring.length) wts(k) else 0.0))
            out += EwmaRow(user, e.ts, e.event_id, r4(num / den))
          }
          if (ring.isEmpty) state.remove()
          else state.update(EwmaState(ring))
          out.result().iterator
      }
  }

  case class CusumMark(user_id: Long, event_id: Long, cusum_hi: Double,
      cusum_lo: Double, is_alarm: Boolean)
  case class CusumState(pHi: Long, minHi: Long, pLo: Long, minLo: Long)

  /** Streaming twin of `q_cusum` (r12): two-sided CUSUM per key against
    * a CALIBRATED in-control mean — the standard SPC deployment: μ per
    * key is trained offline and shipped as a broadcast-sized map, and
    * the detector streams against it. The batch key computes μ from the
    * same window it scores, so replaying with the batch μ reproduces it
    * row-for-row (CusumTwinSpec law). State is four longs per key — the
    * running drift prefix sum and its running minimum for each side, in
    * exact 1e-4 integer units (the same prefix-sum identity the batch
    * windows use: s_t = P_t − min(0, min_{i≤t} P_i)) — CONSTANT, the
    * cdcCompact state class. Out-of-order within a micro-batch is
    * re-sorted; retro events are batch's concern (the documented twin
    * contract). */
  def cusumMarks(events: Dataset[CepEvent], mu: Map[Long, Double],
      k: Double = 25.0, hUnits: Long = 2500000L): Dataset[CusumMark] = {
    implicit val rowEnc = Encoders.product[CusumMark]
    implicit val stEnc = Encoders.product[CusumState]
    implicit val keyEnc = Encoders.scalaLong
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[CusumState, CusumMark](OutputMode.Append(),
        GroupStateTimeout.NoTimeout()) {
        (user: Long, it: Iterator[CepEvent],
            state: GroupState[CusumState]) =>
          // minHi/minLo start at 0: batch's least(0, min_{i≤t} P_i)
          var st = state.getOption.getOrElse(CusumState(0L, 0L, 0L, 0L))
          val m = mu.getOrElse(user, 0.0)
          val out = List.newBuilder[CusumMark]
          it.toArray.sortBy(e => (us(e.ts), e.event_id)).foreach { e =>
            val pHi = st.pHi +
              math.floor((e.value - m - k) * 1e4 + 0.5).toLong
            val pLo = st.pLo +
              math.floor((m - k - e.value) * 1e4 + 0.5).toLong
            st = CusumState(pHi, math.min(st.minHi, pHi),
              pLo, math.min(st.minLo, pLo))
            val sHi = pHi - st.minHi
            val sLo = pLo - st.minLo
            out += CusumMark(user, e.event_id, sHi.toDouble / 1e4,
              sLo.toDouble / 1e4, sHi > hUnits || sLo > hUnits)
          }
          state.update(st)
          out.result().iterator
      }
  }

  case class TransRow(user_id: Long, e1: String, e2: String)
  case class TransState(lastType: String)

  /** Per-user consecutive-event transitions (the stateful half of
    * `q_markov_trans`): carries only the user's last event type and
    * emits one (e1, e2) pair per consecutive pair in (ts, id) order.
    * The transition MATRIX (counts + row-normalized probabilities) is a
    * plain aggregation of these pairs — identical math on either
    * engine, so the twin law pins the pair multiset. */
  def transitions(events: Dataset[CepEvent]): Dataset[TransRow] = {
    implicit val rowEnc = Encoders.product[TransRow]
    implicit val stEnc = Encoders.product[TransState]
    implicit val keyEnc = Encoders.scalaLong
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[TransState, TransRow](OutputMode.Append(),
        GroupStateTimeout.NoTimeout()) {
        (user: Long, it: Iterator[CepEvent],
            state: GroupState[TransState]) =>
          var last = state.getOption.map(_.lastType).orNull
          val out = List.newBuilder[TransRow]
          it.toArray.sortBy(e => (us(e.ts), e.event_id)).foreach { e =>
            if (last != null) out += TransRow(user, last, e.event_type)
            last = e.event_type
          }
          if (last == null) state.remove()
          else state.update(TransState(last))
          out.result().iterator
      }
  }

  case class TriRow(user_id: Long, t1: String, t2: String, t3: String)
  case class TriState(t1: String, us1: Long, t2: String, us2: Long,
      has: Int)

  /** Path-trigram markers (the streaming twin of `q_path_trigrams`'s
    * two-lead window): per user, one mark per 3-step path whose BOTH
    * step gaps are within `gapMs` — state is just the last two events'
    * (type, ts), O(1), the [[transitions]] discipline lifted one
    * order. The batch key's top-20 panel is a plain count of the mark
    * multiset under the same (cnt DESC, t1, t2, t3) order; no flush
    * needed (every mark is emitted by its own third event). */
  def trigramMarks(events: Dataset[CepEvent], gapMs: Long)
      : Dataset[TriRow] = {
    implicit val rowEnc = Encoders.product[TriRow]
    implicit val stEnc = Encoders.product[TriState]
    implicit val keyEnc = Encoders.scalaLong
    val gapUs = gapMs * 1000L
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[TriState, TriRow](OutputMode.Append(),
        GroupStateTimeout.NoTimeout()) {
        (user: Long, it: Iterator[CepEvent],
            state: GroupState[TriState]) =>
          var st = state.getOption.orNull
          val out = List.newBuilder[TriRow]
          it.toArray.sortBy(e => (us(e.ts), e.event_id)).foreach { e =>
            val t = us(e.ts)
            if (st != null && st.has >= 2 && t - st.us2 <= gapUs &&
                st.us2 - st.us1 <= gapUs)
              out += TriRow(user, st.t1, st.t2, e.event_type)
            st = if (st == null) TriState(null, 0L, e.event_type, t, 1)
                 else TriState(st.t2, st.us2, e.event_type, t,
                   math.min(st.has + 1, 2))
          }
          if (st == null) state.remove() else state.update(st)
          out.result().iterator
      }
  }

  case class Scd2Row(user_id: Long, event_id: Long,
      valid_from: Timestamp, valid_to: Timestamp, event_type: String,
      value: Double, is_current: Boolean)
  case class Scd2State(id: Long, fromUs: Long, typ: String, v: Double)

  /** Streaming SCD type-2 interval builder (the twin of `q_scd2`'s
    * lead() pass): each change-log row CLOSES the key's previous
    * interval (valid_to = the new row's ts) and opens its own. The
    * open interval emits with a NULL valid_to + is_current when a
    * flush event (any later row, e.g. the replay sentinel) proves the
    * stream ended — on a live stream the current row simply stays in
    * state. State = the last row per key, O(1). */
  def scd2(events: Dataset[CepEvent], flushType: String = "zz_flush")
      : Dataset[Scd2Row] = {
    implicit val rowEnc = Encoders.product[Scd2Row]
    implicit val stEnc = Encoders.product[Scd2State]
    implicit val keyEnc = Encoders.scalaLong
    def tsOf(u: Long): Timestamp = {
      val t = new Timestamp(Math.floorDiv(u, 1000000L) * 1000L)
      t.setNanos((Math.floorMod(u, 1000000L) * 1000L).toInt)
      t
    }
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[Scd2State, Scd2Row](OutputMode.Append(),
        GroupStateTimeout.NoTimeout()) {
        (user: Long, it: Iterator[CepEvent],
            state: GroupState[Scd2State]) =>
          var st = state.getOption.orNull
          val out = List.newBuilder[Scd2Row]
          it.toArray.sortBy(e => (us(e.ts), e.event_id)).foreach { e =>
            if (e.event_type == flushType) {
              if (st != null) {
                out += Scd2Row(user, st.id, tsOf(st.fromUs), null,
                  st.typ, st.v, is_current = true)
                st = null
              }
            } else {
              if (st != null)
                out += Scd2Row(user, st.id, tsOf(st.fromUs), e.ts,
                  st.typ, st.v, is_current = false)
              st = Scd2State(e.event_id, us(e.ts), e.event_type, e.value)
            }
          }
          if (st == null) state.remove()
          else state.update(st)
          out.result().iterator
      }
  }

  case class SessionRow(user_id: Long, event_id: Long, ts: Timestamp,
      session_id: Long)
  case class SessionState(lastUs: Long, counter: Long)

  /** Per-event session ordinals under an inactivity gap (the streaming
    * twin of `q_sessionize`'s gaps-and-islands windows): state = the
    * user's last event time + running session counter, O(1). A new
    * session starts when the gap from the previous event exceeds
    * `gapMs`; the counter IS the batch running-sum-of-starts. */
  def sessionize(events: Dataset[CepEvent], gapMs: Long)
      : Dataset[SessionRow] = {
    implicit val rowEnc = Encoders.product[SessionRow]
    implicit val stEnc = Encoders.product[SessionState]
    implicit val keyEnc = Encoders.scalaLong
    val gapUs = gapMs * 1000L
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionRow](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (user: Long, it: Iterator[CepEvent],
            state: GroupState[SessionState]) =>
          var st = state.getOption.getOrElse(SessionState(Long.MinValue,
            0L))
          val out = List.newBuilder[SessionRow]
          it.toArray.sortBy(e => (us(e.ts), e.event_id)).foreach { e =>
            val t = us(e.ts)
            val fresh = st.lastUs == Long.MinValue || t - st.lastUs > gapUs
            st = SessionState(t, if (fresh) st.counter + 1 else st.counter)
            out += SessionRow(user, e.event_id, e.ts, st.counter)
          }
          if (st.lastUs == Long.MinValue) state.remove()
          else state.update(st)
          out.result().iterator
      }
  }

  case class FunnelRow(user_id: Long, stage: Int, t1: Timestamp,
      t2: Timestamp, t3: Timestamp)
  case class FunnelState(u1: Long, u2: Long, u3: Long)

  /** Online 3-stage funnel tracker (the stateful twin of `q_funnel`'s
    * per-user CTE chain): stage k's timestamp is the user's FIRST
    * stage-k event STRICTLY after stage k-1's — in-order arrival makes
    * "first qualifying" and "min qualifying" the same event, which is
    * the twin law. State = up to three micros, O(1); a row emits each
    * time the user ADVANCES a stage, so the user's latest row is their
    * current funnel position (no flush needed). */
  def funnelStages(events: Dataset[CepEvent], s1: String, s2: String,
      s3: String): Dataset[FunnelRow] = {
    implicit val rowEnc = Encoders.product[FunnelRow]
    implicit val stEnc = Encoders.product[FunnelState]
    implicit val keyEnc = Encoders.scalaLong
    def tsOf(u: Long): Timestamp =
      if (u == 0L) null
      else {
        val t = new Timestamp(Math.floorDiv(u, 1000000L) * 1000L)
        t.setNanos((Math.floorMod(u, 1000000L) * 1000L).toInt)
        t
      }
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[FunnelState, FunnelRow](OutputMode.Append(),
        GroupStateTimeout.NoTimeout()) {
        (user: Long, it: Iterator[CepEvent],
            state: GroupState[FunnelState]) =>
          var st = state.getOption.getOrElse(FunnelState(0L, 0L, 0L))
          val out = List.newBuilder[FunnelRow]
          it.toArray.sortBy(e => (us(e.ts), e.event_id)).foreach { e =>
            val t = us(e.ts)
            val advanced =
              if (st.u1 == 0L && e.event_type == s1) {
                st = st.copy(u1 = t); true
              } else if (st.u1 != 0L && st.u2 == 0L &&
                  e.event_type == s2 && t > st.u1) {
                st = st.copy(u2 = t); true
              } else if (st.u2 != 0L && st.u3 == 0L &&
                  e.event_type == s3 && t > st.u2) {
                st = st.copy(u3 = t); true
              } else false
            if (advanced) {
              val stage = if (st.u3 != 0L) 3 else if (st.u2 != 0L) 2
                else 1
              out += FunnelRow(user, stage, tsOf(st.u1), tsOf(st.u2),
                tsOf(st.u3))
            }
          }
          if (st == FunnelState(0L, 0L, 0L)) state.remove()
          else state.update(st)
          out.result().iterator
      }
  }

  case class ChurnMark(user_id: Long, week: Long, retained: Boolean)
  case class ChurnState(lastWeek: Long)

  /** Weekly retention markers (the streaming twin of `q_churn`'s
    * distinct-frame self-join): per user, one `retained = false` mark
    * on the FIRST event of each active week, plus a `retained = true`
    * mark for week w when the user turns active in week w+1 — the
    * keyed two-week state machine (state = the user's last active
    * week, O(1)). The batch panel is a plain aggregation of the marks:
    * active(w) = count(!retained), retained(w) = count(retained),
    * churned/rate derived — identical math on either engine, so the
    * twin law pins the mark multiset (StreamingTwinSpec). No flush
    * needed: the final week has no week+1 events in EITHER engine, so
    * it churns everyone by construction. Retro events into an already
    *-passed week are dropped (batch authoritative, the shared
    * contract). */
  def churnMarks(events: Dataset[CepEvent]): Dataset[ChurnMark] = {
    implicit val rowEnc = Encoders.product[ChurnMark]
    implicit val stEnc = Encoders.product[ChurnState]
    implicit val keyEnc = Encoders.scalaLong
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[ChurnState, ChurnMark](OutputMode.Append(),
        GroupStateTimeout.NoTimeout()) {
        (user: Long, it: Iterator[CepEvent],
            state: GroupState[ChurnState]) =>
          var last = state.getOption.map(_.lastWeek)
            .getOrElse(Long.MinValue)
          val out = List.newBuilder[ChurnMark]
          it.toArray.sortBy(e => (us(e.ts), e.event_id)).foreach { e =>
            val w = weekOf(us(e.ts))
            if (last == Long.MinValue || w > last) {
              out += ChurnMark(user, w, retained = false)
              if (last != Long.MinValue && w == last + 1)
                out += ChurnMark(user, last, retained = true)
              last = w
            } // w <= last: same week (already marked) or retro — drop
          }
          if (last == Long.MinValue) state.remove()
          else state.update(ChurnState(last))
          out.result().iterator
      }
  }

  case class CohortMark(user_id: Long, cohort_week: Long,
      week_offset: Long)
  case class CohortState(firstDay: Long, lastOffset: Long)

  /** Cohort-cell markers (the streaming twin of `q_cohort`'s
    * first-seen self-join): per user, one mark per NEW week-offset
    * cell — cohort_week is fixed by the user's first event (floor
    * week of their first UTC day), week_offset = floor((day −
    * firstDay)/7). In (ts, id) order the offset is monotone
    * nondecreasing, so state is just (firstDay, lastOffset), O(1), and
    * "first event of a new offset" emits exactly one mark per
    * (user, offset) — the batch panel's countDistinct(user) per cell
    * is then a plain count of marks. No flush needed (every mark is
    * emitted by its own triggering event). */
  def cohortMarks(events: Dataset[CepEvent]): Dataset[CohortMark] = {
    implicit val rowEnc = Encoders.product[CohortMark]
    implicit val stEnc = Encoders.product[CohortState]
    implicit val keyEnc = Encoders.scalaLong
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[CohortState, CohortMark](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (user: Long, it: Iterator[CepEvent],
            state: GroupState[CohortState]) =>
          var st = state.getOption.orNull
          val out = List.newBuilder[CohortMark]
          it.toArray.sortBy(e => (us(e.ts), e.event_id)).foreach { e =>
            val day = Math.floorDiv(us(e.ts), DayUs)
            if (st == null) {
              st = CohortState(day, 0L)
              out += CohortMark(user,
                Math.floorDiv(day - EpochDay2024, 7L), 0L)
            } else {
              val off = Math.floorDiv(day - st.firstDay, 7L)
              if (off > st.lastOffset) {
                out += CohortMark(user,
                  Math.floorDiv(st.firstDay - EpochDay2024, 7L), off)
                st = st.copy(lastOffset = off)
              } // off <= lastOffset: same cell (marked) or retro — drop
            }
          }
          if (st == null) state.remove() else state.update(st)
          out.result().iterator
      }
  }

  case class AdoptMark(user_id: Long, day: Long)
  case class AdoptSeen(seen: Boolean)

  /** First-seen markers (the streaming twin of `q_cum_adoption`'s
    * triangular-join panel — the classic streaming-growth counter):
    * per user, exactly ONE mark carrying the UTC epoch-day of their
    * first event. The batch panel is then plain arithmetic over marks:
    * new_users(d) = marks on day d, cum_users(d) = running sum in day
    * order — identical on either engine, so the twin law pins the mark
    * multiset (StreamingTwinSpec). State is one boolean per seen user
    * — the true cost of any exact distinct-growth counter; it grows
    * with user cardinality, never with event volume (100 TB: state ∝
    * users, sharded by the groupByKey hash; swap to an HLL pane sketch
    * — the q_sliding_distinct discipline — when approximate counts
    * suffice). Retro events (an earlier day arriving after the user
    * was marked) are dropped: batch is authoritative, the shared
    * contract. */
  def adoptionMarks(events: Dataset[CepEvent]): Dataset[AdoptMark] = {
    implicit val rowEnc = Encoders.product[AdoptMark]
    implicit val stEnc = Encoders.product[AdoptSeen]
    implicit val keyEnc = Encoders.scalaLong
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[AdoptSeen, AdoptMark](OutputMode.Append(),
        GroupStateTimeout.NoTimeout()) {
        (user: Long, it: Iterator[CepEvent],
            state: GroupState[AdoptSeen]) =>
          if (state.exists) Iterator.empty
          else {
            val first = it.minBy(e => (us(e.ts), e.event_id))
            state.update(AdoptSeen(true))
            Iterator.single(
              AdoptMark(user, Math.floorDiv(us(first.ts), DayUs)))
          }
      }
  }

  case class CdcRow(user_id: Long, last_type: String, last_value: Double,
      last_ts_us: Long, n_versions: Long, first_ts_us: Long,
      deleted: Boolean)
  case class CdcState(op: String, etype: String, value: Double,
      tsUs: Long, eventId: Long, firstUs: Long, n: Long)

  /** Streaming CDC compaction (the twin of `q_cdc_apply`): per key the
    * state is ONE compacted row — latest (ts, event_id) entry's op and
    * payload plus the version count and first-seen time — exactly what
    * log compaction retains; each micro-batch folds its entries into
    * the state and re-emits the key's current row (Update mode, the
    * upsert-sink contract: downstream keeps the newest row per key,
    * `deleted` rows drop). Arrival order within and across batches is
    * immaterial — newest-wins resolution is commutative — so, unlike
    * the carry twins, this one needs no retro-drop caveat: replay in
    * ANY order converges to the batch key's exact output. 100 TB:
    * state ∝ keys, never log depth — the same bound the batch max_by
    * aggregation's map-side combine enforces. */
  def cdcCompact(events: Dataset[CepEvent]): Dataset[CdcRow] = {
    implicit val rowEnc = Encoders.product[CdcRow]
    implicit val stEnc = Encoders.product[CdcState]
    implicit val keyEnc = Encoders.scalaLong
    def opOf(t: String) = t match {
      case "signup" => "I"; case "error" => "D"; case _ => "U" }
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[CdcState, CdcRow](OutputMode.Update(),
        GroupStateTimeout.NoTimeout()) {
        (user: Long, it: Iterator[CepEvent],
            state: GroupState[CdcState]) =>
          var st = state.getOption.orNull
          it.foreach { e =>
            val u = us(e.ts)
            if (st == null)
              st = CdcState(opOf(e.event_type), e.event_type, e.value,
                u, e.event_id, u, 1L)
            else {
              val newer = u > st.tsUs ||
                (u == st.tsUs && e.event_id > st.eventId)
              st =
                if (newer) st.copy(op = opOf(e.event_type),
                  etype = e.event_type, value = e.value, tsUs = u,
                  eventId = e.event_id,
                  firstUs = math.min(st.firstUs, u), n = st.n + 1L)
                else st.copy(firstUs = math.min(st.firstUs, u),
                  n = st.n + 1L)
            }
          }
          state.update(st)
          Iterator.single(CdcRow(user, st.etype, st.value, st.tsUs,
            st.n, st.firstUs, st.op == "D"))
      }
  }

  case class FcRow(event_type: String, week: Long, cnt: Long,
      fc: Option[Long])
  case class FcState(prevCnt: Long, hasPrev: Boolean, curWeek: Long,
      curCnt: Long, open: Boolean)

  /** Weekly per-type counts with the previous OBSERVED week's count
    * carried as the seasonal-naive forecast (the streaming twin of
    * `q_forecast_naive`'s lag(1) window) — the EWMA ring discipline
    * reduced to one scalar: state = (previous week's count, the open
    * week's accumulator), O(1) per type. A week emits when a
    * later-week event of the type proves it closed; `fc` is None for
    * the type's first observed week, exactly lag(1)'s null. The MAPE
    * backtest panel is a plain aggregation of these rows. Flush: the
    * type-keyed sentinel (`user_id == flushUser`, the [[locfHourly]]
    * discipline) closes the open week without entering the
    * accumulator. */
  def weeklyForecast(events: Dataset[CepEvent],
      flushUser: Long = -1L): Dataset[FcRow] = {
    implicit val rowEnc = Encoders.product[FcRow]
    implicit val stEnc = Encoders.product[FcState]
    implicit val keyEnc = Encoders.STRING
    events.groupByKey(_.event_type)
      .flatMapGroupsWithState[FcState, FcRow](OutputMode.Append(),
        GroupStateTimeout.NoTimeout()) {
        (ty: String, it: Iterator[CepEvent],
            state: GroupState[FcState]) =>
          var st = state.getOption.getOrElse(
            FcState(0L, hasPrev = false, 0L, 0L, open = false))
          val out = List.newBuilder[FcRow]
          def close(): Unit = {
            out += FcRow(ty, st.curWeek, st.curCnt,
              if (st.hasPrev) Some(st.prevCnt) else None)
            st = st.copy(prevCnt = st.curCnt, hasPrev = true,
              open = false)
          }
          it.toArray.sortBy(e => (us(e.ts), e.event_id)).foreach { e =>
            val w = weekOf(us(e.ts))
            if (e.user_id == flushUser) {
              if (st.open && w > st.curWeek) close()
            } else if (!st.open)
              st = st.copy(curWeek = w, curCnt = 1L, open = true)
            else if (w == st.curWeek)
              st = st.copy(curCnt = st.curCnt + 1)
            else if (w > st.curWeek) {
              close()
              st = st.copy(curWeek = w, curCnt = 1L, open = true)
            } // w < curWeek: retro event into a closed week — dropped
          }
          if (!st.open && !st.hasPrev) state.remove()
          else state.update(st)
          out.result().iterator
      }
  }

  case class PsiRow(event_type: String, n_first: Long, n_second: Long,
      psi: Double)
  case class PsiState(c0: Seq[Long], c1: Seq[Long])

  /** Streaming twin of `q_psi` (r14, verdict #5 — the drift-panel
    * stance EXECUTED): the maintained state per event type is exactly
    * the batch key's input — the 10-bucket × 2-side count cells (20
    * longs, CONSTANT per key; integer adds commute, so arrival order
    * and cross-batch splits are immaterial, the cdcCompact class) —
    * and each micro-batch re-derives the smoothed p/q + PSI fold from
    * those cells at constant cost, emitting the key's current panel
    * row (Update mode, upsert-sink contract: downstream keeps the
    * newest row per type — `n_first + n_second` is monotone, so the
    * max-count row IS the newest). Replaying the events table
    * reproduces the oracle-checked batch key exactly
    * (StreamingTwinSpec law; checkpoint-recovery pinned in
    * RecoverySpec). Bucket/side arithmetic is the batch key's
    * verbatim: bucket = least(9, floor(value/33)), side = ts before /
    * from 2024-01-16 UTC, add-1 smoothing on the full 10-bucket spine,
    * psi folded in ascending bucket order, 4-dp round. */
  def psiMarks(events: Dataset[CepEvent]): Dataset[PsiRow] = {
    implicit val rowEnc = Encoders.product[PsiRow]
    implicit val stEnc = Encoders.product[PsiState]
    implicit val keyEnc = Encoders.STRING
    val cutUs = java.time.LocalDateTime.of(2024, 1, 16, 0, 0)
      .toInstant(java.time.ZoneOffset.UTC).toEpochMilli * 1000L
    events.groupByKey(_.event_type)
      .flatMapGroupsWithState[PsiState, PsiRow](OutputMode.Update(),
        GroupStateTimeout.NoTimeout()) {
        (ty: String, it: Iterator[CepEvent],
            state: GroupState[PsiState]) =>
          val c0 = state.getOption.map(_.c0.toArray)
            .getOrElse(Array.fill(10)(0L))
          val c1 = state.getOption.map(_.c1.toArray)
            .getOrElse(Array.fill(10)(0L))
          it.foreach { e =>
            val b = math.min(9L, math.floor(e.value / 33.0).toLong).toInt
            if (us(e.ts) < cutUs) c0(b) += 1L else c1(b) += 1L
          }
          state.update(PsiState(c0.toSeq, c1.toSeq))
          val t0 = c0.sum
          val t1 = c1.sum
          var psi = 0.0
          var b = 0
          while (b < 10) {
            val p = (c0(b) + 1).toDouble / (t0 + 10)
            val q = (c1(b) + 1).toDouble / (t1 + 10)
            psi += (p - q) * math.log(p / q)
            b += 1
          }
          Iterator.single(PsiRow(ty, t0, t1, r4(psi)))
      }
  }

  case class LocfRow(event_type: String, h: Timestamp, filled: Double,
      is_observed: Boolean)
  case class LocfState(hour: Long, sum: Double, cnt: Long)

  /** Hourly LOCF fill per event type: the hourly average (4-dp, the
    * exact `q_gap_fill` rounding) for observed hours, the LAST observed
    * average carried forward for interior gap hours. An hour emits —
    * followed by its trailing gap rows — when a later-hour event of the
    * type arrives. Domain note: the batch key fills a GLOBAL
    * [min, max]-hour spine for every type; the stream fills from each
    * type's first observation onward (it cannot know the global lo
    * before seeing it) — the twin law compares on that common domain,
    * and a flush at (global hi + 1 h) extends every type's carry to the
    * spine's end.
    *
    * The operator is keyed by event_type, so the flush sentinel must
    * RIDE the type it flushes — it is marked by `user_id == flushUser`
    * (reserved negative id, the [[scd2]]/[[twapDaily]] flushType
    * discipline adapted to a type-keyed stream). A sentinel closes and
    * emits every bucket strictly before its hour but never opens one —
    * r10 ADVICE fix: previously the sentinel entered state as a real
    * observation (hour-of-flush, value 0.0) that a later event would
    * have emitted as a fabricated bucket. */
  def locfHourly(events: Dataset[CepEvent],
      flushUser: Long = -1L): Dataset[LocfRow] = {
    implicit val rowEnc = Encoders.product[LocfRow]
    implicit val stEnc = Encoders.product[LocfState]
    implicit val keyEnc = Encoders.STRING
    events.groupByKey(_.event_type)
      .flatMapGroupsWithState[LocfState, LocfRow](OutputMode.Append(),
        GroupStateTimeout.NoTimeout()) {
        (ty: String, it: Iterator[CepEvent],
            state: GroupState[LocfState]) =>
          var st = state.getOption.orNull
          val out = List.newBuilder[LocfRow]
          def tsOf(h: Long) = new Timestamp(h / 1000L)
          it.toArray.sortBy(e => (us(e.ts), e.event_id)).foreach { e =>
            val h = Math.floorDiv(us(e.ts), HourUs) * HourUs
            if (e.user_id == flushUser) {
              // horizon sentinel: emit the open hour + its trailing gap
              // rows up to (but excluding) the sentinel hour, then clear
              if (st != null && h > st.hour) {
                val obs = r4(st.sum / st.cnt)
                out += LocfRow(ty, tsOf(st.hour), obs, is_observed = true)
                var g = st.hour + HourUs
                while (g < h) {
                  out += LocfRow(ty, tsOf(g), obs, is_observed = false)
                  g += HourUs
                }
                st = null
              }
            } else if (st == null) st = LocfState(h, e.value, 1L)
            else if (h == st.hour)
              st = LocfState(h, st.sum + e.value, st.cnt + 1)
            else if (h > st.hour) {
              val obs = r4(st.sum / st.cnt)
              out += LocfRow(ty, tsOf(st.hour), obs, is_observed = true)
              var g = st.hour + HourUs
              while (g < h) {
                out += LocfRow(ty, tsOf(g), obs, is_observed = false)
                g += HourUs
              }
              st = LocfState(h, e.value, 1L)
            } // h < st.hour: retro event into a closed hour — dropped
          }
          if (st == null) state.remove() else state.update(st)
          out.result().iterator
      }
  }
}
