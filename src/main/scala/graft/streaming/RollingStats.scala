package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One scored event: the trailing-window z-score of `value` and the
  * threshold flag — the streaming row `q_zscore` emits in batch. */
case class ZScored(user_id: Long, ts: Timestamp, event_id: Long,
    z: Double, is_anomaly: Boolean)

/** Ring of the trailing window's values, oldest first (bounded by the
  * window length — O(1) state per key). */
case class RollingState(ring: List[Double])

/** Streaming twin of `q_zscore` (r8): the trailing-16 z-score anomaly
  * monitor as a CONTINUOUS query — the actual deployment shape of a
  * monitoring rule (batch recomputes history; the stream scores each
  * event as it arrives). Per user, a bounded ring of the last `win`
  * values; each event appends, then scores
  * `z = (x - mean) / stddev_samp` over the ring (current row inclusive)
  * once `minSupport` rows accumulated — exactly the batch key's
  * windowed formulation, down to the ROUND-BEFORE-THRESHOLD discipline
  * (`is_anomaly` compares the 3-dp-rounded score, so batch and stream
  * flag identically; StreamingTwinSpec pins full-replay equality).
  *
  * Contract: per-key event-time order within and across batches (the
  * fixture-replay contract every in-order detector here shares); the
  * ring is NOT retro-reordered for late rows. State: `win` doubles per
  * key, no timers — bounded for unbounded streams. */
object RollingStats {
  def zScores(events: Dataset[CepEvent], win: Int = 16,
      minSupport: Int = 8, threshold: Double = 2.0): Dataset[ZScored] = {
    require(win >= 2 && minSupport >= 2 && minSupport <= win,
      "need 2 <= minSupport <= win")
    implicit val outEnc = Encoders.product[ZScored]
    implicit val stEnc = Encoders.product[RollingState]
    implicit val keyEnc = Encoders.scalaLong
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[RollingState, ZScored](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (user: Long, it: Iterator[CepEvent], state: GroupState[RollingState]) =>
          var ring = state.getOption.map(_.ring).getOrElse(Nil)
          val out = List.newBuilder[ZScored]
          val batch = it.toArray.sortBy(e =>
            (e.ts.getTime, e.ts.getNanos, e.event_id))
          batch.foreach { e =>
            ring = (ring :+ e.value).takeRight(win)
            val n = ring.length
            if (n >= minSupport) {
              val mean = ring.sum / n
              val varS = ring.map(v => (v - mean) * (v - mean)).sum / (n - 1)
              val sd = math.sqrt(varS)
              val z = math.floor((e.value - mean) / sd * 1000 + 0.5) / 1000
              out += ZScored(user, e.ts, e.event_id, z,
                math.abs(z) > threshold)
            }
          }
          state.update(RollingState(ring))
          out.result().iterator
      }
  }
}
