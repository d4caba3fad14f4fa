package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** A typed event row for the CEP state machine (mirrors the events table). */
case class CepEvent(event_id: Long, ts: Timestamp, user_id: Long,
    event_type: String, value: Double)

/** One detected sequence: `first` (e.g. signup) followed by the FIRST
  * matching `second` (e.g. purchase) within `withinMs`, per key. */
case class CepMatch(user_id: Long, sid: Long, pid: Long,
    s_ts: Timestamp, p_ts: Timestamp)

/** State: open first-step events awaiting their match. */
case class CepState(open: List[(Long, Timestamp)])

/** CEP sequence detection over an event stream (SURVEY §2.9 C6) — the
  * streaming twin of the batch key `q_cep_seq`, and the re-expression of
  * the reference's continuous pattern semantics as an arbitrary-stateful
  * Structured Streaming operator.
  *
  * Semantics (identical to the batch formulation): for every event of type
  * `first`, emit a match with the FIRST subsequent event of type `second`
  * by the same user with `0 < p.ts - s.ts <= within` (AFTER MATCH SKIP TO
  * NEXT ROW: each `first` matches at most once; one `second` may complete
  * several pending `first`s).
  *
  * Implementation: `flatMapGroupsWithState` keyed by user. Per micro-batch
  * the group's events are sorted by (ts, event_id) — within-batch disorder
  * is handled; cross-batch disorder is bounded by the source watermark, and
  * state is pruned to `within` behind the newest event seen, so state size
  * is O(open firsts in the window) per key regardless of stream length —
  * the property that lets this run unbounded at cluster scale (RocksDB
  * state store; see [[StreamingConf]]).
  */
object CepSequence {
  /** Micros since epoch (getTime carries millis; getNanos the sub-second). */
  private def us(t: Timestamp): Long =
    t.getTime / 1000 * 1000000L + t.getNanos / 1000

  def detect(events: Dataset[CepEvent], first: String, second: String,
      withinMs: Long): Dataset[CepMatch] =
    detect(events, Set(first), Set(second), withinMs)

  /** Alternation form (r7): `firsts`/`seconds` are event-type classes —
    * a step matches any member (the `click|view` dialect surface). */
  def detect(events: Dataset[CepEvent], firsts: Set[String],
      seconds: Set[String], withinMs: Long): Dataset[CepMatch] = {
    implicit val matchEnc = Encoders.product[CepMatch]
    implicit val stateEnc = Encoders.product[CepState]
    implicit val keyEnc = Encoders.scalaLong

    val withinUs = withinMs * 1000L

    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[CepState, CepMatch](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (user: Long, it: Iterator[CepEvent], state: GroupState[CepState]) =>
          var open = state.getOption.map(_.open).getOrElse(Nil)
          val out = List.newBuilder[CepMatch]
          val batch = it.toArray.sortBy(e => (us(e.ts), e.event_id))
          var maxTs = 0L
          batch.foreach { e =>
            val t = us(e.ts)
            if (t > maxTs) maxTs = t
            if (seconds.contains(e.event_type)) {
              val (hit, miss) = open.partition { case (_, sTs) =>
                t > us(sTs) && t <= us(sTs) + withinUs
              }
              hit.foreach { case (sid, sTs) =>
                out += CepMatch(user, sid, e.event_id, sTs, e.ts)
              }
              open = miss
            }
            if (firsts.contains(e.event_type)) open = (e.event_id, e.ts) :: open
          }
          // prune firsts that can no longer match (bounded state). The
          // horizon is the WATERMARK when one is configured — a late
          // second with ts < batch-max can still legally arrive, so
          // pruning by batch-max would drop firsts it could complete;
          // without a watermark (in-order replay / batch) the batch max
          // is the contract.
          val horizon = scala.util.Try(state.getCurrentWatermarkMs() * 1000L)
            .getOrElse(maxTs)
          open = open.filter { case (_, sTs) => us(sTs) + withinUs >= horizon }
          state.update(CepState(open))
          out.result().iterator
      }
  }
}
