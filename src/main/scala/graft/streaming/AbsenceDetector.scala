package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, ListState, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues}

/** An emitted absence: a `first` event with NO `second` within the window. */
case class AbsenceMatch(user_id: Long, sid: Long, s_ts: Timestamp)

/** A second-type event retained for late-first cancellation (pruned to
  * the watermark lateness horizon). */
case class SeenSecond(ts: Timestamp)

/** CEP negation / absence pattern (streaming twin of `q_cep_absence`):
  * emit each `first` event for which no `second` arrives within
  * `withinMs`. This is the pattern that REQUIRES timers — a match is
  * known only when the deadline passes with nothing seen, so the emit is
  * driven by the watermark crossing s_ts + within, not by any input row.
  * (The reference's processing-time engine could only approximate this;
  * event-time timers make it exact.) Requires the RocksDB provider.
  */
class AbsenceProcessor(firstP: CepEvent => Boolean,
    secondP: CepEvent => Boolean, withinMs: Long)
    extends StatefulProcessor[Long, CepEvent, AbsenceMatch] {
  def this(firsts: Set[String], seconds: Set[String], withinMs: Long) =
    this((e: CepEvent) => firsts.contains(e.event_type),
      (e: CepEvent) => seconds.contains(e.event_type), withinMs)
  def this(first: String, second: String, withinMs: Long) =
    this(Set(first), Set(second), withinMs)
  @transient private var open: ListState[OpenFirst] = _
  @transient private var seen: ListState[SeenSecond] = _

  private def us(t: Timestamp): Long =
    t.getTime / 1000 * 1000000L + t.getNanos / 1000

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
    open = getHandle.getListState[OpenFirst]("absence_open",
      Encoders.product[OpenFirst], TTLConfig.NONE)
    seen = getHandle.getListState[SeenSecond]("absence_seconds",
      Encoders.product[SeenSecond], TTLConfig.NONE)
  }

  override def handleInputRows(key: Long, rows: Iterator[CepEvent],
      timers: TimerValues): Iterator[AbsenceMatch] = {
    var opens = if (open.exists()) open.get().toList else Nil
    // seconds RETAINED across batches: a first may arrive LATE (inside
    // the watermark lateness) after its cancelling second was already
    // processed — without this memory it would emit a false absence.
    // Only seconds beyond the watermark can matter (any future first has
    // ts > wm, and its cancelling second has ts > that), so the list is
    // bounded by the lateness horizon.
    val wmMs = timers.getCurrentWatermarkInMs()
    var secs = (if (seen.exists()) seen.get().toList else Nil)
      .filter(_.ts.getTime >= wmMs)
    val batch = rows.toArray.sortBy(e => (us(e.ts), e.event_id))
    batch.foreach { e =>
      val t = us(e.ts)
      if (secondP(e)) {
        // a second cancels every open first whose window covers it
        opens = opens.filterNot(o =>
          t > us(o.ts) && t <= us(o.ts) + withinMs * 1000L)
        if (e.ts.getTime >= wmMs) secs = SeenSecond(e.ts) :: secs
      }
      if (firstP(e)) {
        // an already-seen second inside this first's window means the
        // absence can never be confirmed — don't open it at all
        val preCancelled = secs.exists(s =>
          us(s.ts) > t && us(s.ts) <= t + withinMs * 1000L)
        if (!preCancelled) {
          opens = OpenFirst(e.event_id, e.ts) :: opens
          // +1 ms: getTime truncates the microsecond part, so the true
          // (micro-precision) deadline lies inside the truncated ms — the
          // timer must fire strictly after it
          getHandle.registerTimer(e.ts.getTime + withinMs + 1)
        }
      }
    }
    if (opens.isEmpty) open.clear() else open.put(opens.toArray)
    if (secs.isEmpty) seen.clear() else seen.put(secs.toArray)
    Iterator.empty
  }

  override def handleExpiredTimer(key: Long, timers: TimerValues,
      info: ExpiredTimerInfo): Iterator[AbsenceMatch] = {
    val expiryMs = info.getExpiryTimeInMs()
    val opens = if (open.exists()) open.get().toList else Nil
    // every open first whose window has fully elapsed is a confirmed
    // absence (its second never arrived — else it would have been
    // removed). Compare in the same ms domain the timer was registered in.
    val (due, keep) = opens.partition(o =>
      o.ts.getTime + withinMs + 1 <= expiryMs)
    if (keep.isEmpty) open.clear() else open.put(keep.toArray)
    due.sortBy(o => (us(o.ts), o.id))
      .map(o => AbsenceMatch(key, o.id, o.ts)).iterator
  }
}

object AbsenceDetector {
  def detect(events: Dataset[CepEvent], first: String, second: String,
      withinMs: Long, lateness: String): Dataset[AbsenceMatch] =
    detect(events, Set(first), Set(second), withinMs, lateness)

  /** Alternation form (r7): event-type classes per step. */
  def detect(events: Dataset[CepEvent], firsts: Set[String],
      seconds: Set[String], withinMs: Long, lateness: String)
      : Dataset[AbsenceMatch] =
    detectWhere(events, e => firsts.contains(e.event_type),
      e => seconds.contains(e.event_type), withinMs, lateness)

  /** Predicate form (r8, DEFINE-lite conditions on the absence arm):
    * the predicates replace the class tests — only a CONDITION-SATISFYING
    * second cancels an open first (a same-class event outside its
    * condition is invisible, exactly like the batch anti join's
    * `type AND cond` predicate), and only a condition-satisfying first
    * opens a window. */
  def detectWhere(events: Dataset[CepEvent], firstP: CepEvent => Boolean,
      secondP: CepEvent => Boolean, withinMs: Long, lateness: String)
      : Dataset[AbsenceMatch] = {
    implicit val enc = Encoders.product[AbsenceMatch]
    implicit val keyEnc = Encoders.scalaLong
    events.withWatermark("ts", lateness)
      .groupByKey(_.user_id)
      .transformWithState(new AbsenceProcessor(firstP, secondP, withinMs),
        TimeMode.EventTime(), OutputMode.Append())
  }
}
