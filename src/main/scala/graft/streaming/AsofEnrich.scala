package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** A left event enriched with the latest preceding right event (or none). */
case class AsofMatch(err_id: Long, user_id: Long, err_ts: Timestamp,
    click_id: Option[Long], click_ts: Option[Timestamp])

/** The latest right event seen so far for a key. */
case class LatestRight(id: Long, ts: Timestamp)

/** Streaming as-of enrichment (SURVEY §2.3 J8, streaming form): each
  * `leftType` event is emitted with the LATEST `rightType` event at/before
  * it for the same key — the streaming twin of
  * [[graft.operators.TemporalJoins.asofJoinBackwardCarry]], and the CEP
  * form of "enrich a fact stream with the most recent dimension state".
  *
  * Semantics match the batch carry/theta forms exactly under the same
  * (ts, side, event_id) total order: a right event at the SAME timestamp
  * as a left event is eligible (<=), ties among rights break by max id.
  * State per key is ONE (id, ts) pair — O(keys), not O(stream): the
  * reference kept this in Redis; here it's a state-store row.
  *
  * Within-batch disorder is handled by sorting the group's batch;
  * cross-batch late RIGHT events (older than the retained latest) are
  * ignored by the monotonic update rule, matching what a watermark-late
  * event would experience anywhere else in the engine.
  *
  * State retention: by DEFAULT the one-row-per-key state lives forever —
  * that is the as-of contract (a right event remains the valid enrichment
  * for every later left, indefinitely), so the store is O(keys-ever-seen).
  * On a stream with unbounded key cardinality that is itself unbounded;
  * pass `stateTtl` to opt into Flink-style state TTL. The TTL is a DATA
  * semantic, enforced in the eligibility check itself: a left enriches
  * only when `right.ts <= left.ts <= right.ts + ttl`, in batch and
  * streaming alike, independent of micro-batch boundaries. The state-ROW
  * removal (streaming only, requires `watermarkDelay`) happens via
  * event-time timeout once the watermark passes `right.ts + ttl` — that
  * is purely a store-size optimization; whenever it fires, the row it
  * drops was already ineligible for every on-time left.
  */
object AsofEnrich {
  private def us(t: Timestamp): Long =
    t.getTime / 1000 * 1000000L + t.getNanos / 1000

  def enrich(events: Dataset[CepEvent], leftType: String, rightType: String,
      watermarkDelay: Option[String] = None,
      stateTtl: Option[String] = None): Dataset[AsofMatch] = {
    implicit val outEnc = Encoders.product[AsofMatch]
    implicit val stateEnc = Encoders.product[LatestRight]
    implicit val keyEnc = Encoders.scalaLong

    val ttlMs = stateTtl.map(t => org.apache.spark.sql.catalyst.util
      .IntervalUtils.stringToInterval(
        org.apache.spark.unsafe.types.UTF8String.fromString(t)))
      .map { iv =>
        require(iv.months == 0,
          s"stateTtl needs a fixed duration, got '${stateTtl.get}'")
        iv.days * 86400000L + iv.microseconds / 1000L
      }
    val ttlEnabled = ttlMs.isDefined && events.isStreaming
    require(ttlMs.isEmpty || !events.isStreaming || watermarkDelay.isDefined,
      "streaming stateTtl requires watermarkDelay (row removal is " +
        "watermark-driven)")
    val src = if (watermarkDelay.isDefined && events.isStreaming)
      events.withWatermark("ts", watermarkDelay.get) else events
    val timeoutConf = if (ttlEnabled) GroupStateTimeout.EventTimeTimeout()
                      else GroupStateTimeout.NoTimeout()

    src.groupByKey(_.user_id)
      .flatMapGroupsWithState[LatestRight, AsofMatch](
        OutputMode.Append(), timeoutConf) {
        (user: Long, it: Iterator[CepEvent], state: GroupState[LatestRight]) =>
          if (state.hasTimedOut) {
            // the watermark passed latest.ts + ttl: the enrichment is
            // declared stale — drop the row so the store stays bounded
            state.remove()
            Iterator.empty
          } else {
          var latest: Option[LatestRight] = state.getOption
          val out = List.newBuilder[AsofMatch]
          // rights sort before lefts at equal ts (<= semantics), matching
          // the batch carry plan's (__ts, __side, id) ordering
          val batch = it.toArray.sortBy(e =>
            (us(e.ts), if (e.event_type == rightType) 0 else 1, e.event_id))
          batch.foreach { e =>
            if (e.event_type == rightType) {
              // monotonic: only a strictly newer (ts, id) replaces state,
              // so a late-arriving older right can't rewind the carry
              if (latest.forall(l => us(e.ts) > us(l.ts) ||
                  (us(e.ts) == us(l.ts) && e.event_id > l.id)))
                latest = Some(LatestRight(e.event_id, e.ts))
            } else if (e.event_type == leftType) {
              // the as-of invariant is rightTs <= leftTs: a LATE left
              // (older than the retained latest) must not be enriched
              // with that future right — emit unmatched instead (the
              // older right it would have matched is beyond one-row
              // state; documented lateness trade-off). With a TTL the
              // upper bound leftTs <= rightTs + ttl is enforced HERE, on
              // the data path — the event-time timeout only bounds the
              // store, so eligibility must not depend on when it fires.
              val eligible = latest.filter(l => us(l.ts) <= us(e.ts) &&
                ttlMs.forall(t => us(e.ts) - us(l.ts) <= t * 1000L))
              out += AsofMatch(e.event_id, user, e.ts,
                eligible.map(_.id), eligible.map(_.ts))
            }
          }
          latest.foreach { l =>
            state.update(l)
            if (ttlEnabled)
              // re-arm on every batch: a newer right extends the lease
              // (timeout must land strictly beyond the current watermark)
              state.setTimeoutTimestamp(math.max(
                us(l.ts) / 1000L + ttlMs.get,
                state.getCurrentWatermarkMs() + 1))
          }
          out.result().iterator
          }
      }
  }
}
