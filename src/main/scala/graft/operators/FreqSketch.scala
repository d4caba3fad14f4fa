package graft.operators

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Heavy-hitter sketching (r8): the Misra–Gries / space-saving summary
  * as a typed [[Aggregator]] — the single-pass, bounded-memory path to
  * "which tokens exceed φN occurrences" at 100 TB, where the exact
  * two-agg answer (`q_heavy_hitters`) would carry the full vocabulary
  * through the shuffle.
  *
  * Each partition folds its items into at most k counters (a miss with a
  * full table decrements every counter — the classic MG step); partial
  * summaries MERGE by summing counters and re-capping to k (subtracting
  * the (k+1)-th largest count). The guarantee, under ANY partitioning
  * and merge order: every item with true frequency > N/(k+1) is present
  * in the summary, and each reported count lower-bounds the true count
  * by at most N/(k+1). Counter VALUES are merge-order-dependent — the
  * sketch is deliberately NOT an oracle key; FreqSketchSpec pins the
  * guarantee instead (superset-of-exact-heavy-hitters + error bound).
  *
  * Streaming form (r11): the same aggregator runs as a streaming
  * `groupBy(shard)` aggregation in update mode, sharding by TOKEN HASH —
  * summaries stay disjoint (an item's whole mass lives in one shard, so
  * shard bounds never stack) and per-shard state is bounded at k
  * counters regardless of stream length; the read-side union keeps the
  * global N/(k+1) guarantee. Pinned in FreqSketchSpec's streaming test.
  */
object FreqSketch {
  /** k-counter Misra–Gries aggregator over a string column. */
  class MisraGries(k: Int)
      extends Aggregator[String, Map[String, Long], Map[String, Long]] {
    require(k >= 1, "need at least one counter")

    def zero: Map[String, Long] = Map.empty

    def reduce(b: Map[String, Long], x: String): Map[String, Long] =
      b.get(x) match {
        case Some(c) => b.updated(x, c + 1)
        case None if b.size < k => b.updated(x, 1L)
        case None =>
          // decrement-all: every survivor absorbs one of x's occurrences
          b.iterator.map { case (w, c) => (w, c - 1) }
            .filter(_._2 > 0).toMap
      }

    def merge(b1: Map[String, Long], b2: Map[String, Long])
        : Map[String, Long] = {
      val sum = b2.foldLeft(b1) { case (acc, (w, c)) =>
        acc.updated(w, acc.getOrElse(w, 0L) + c)
      }
      if (sum.size <= k) sum
      else {
        // re-cap: subtract the (k+1)-th largest count from everything
        val cut = sum.valuesIterator.toArray.sorted(
          Ordering[Long].reverse)(k)
        sum.iterator.map { case (w, c) => (w, c - cut) }
          .filter(_._2 > 0).toMap
      }
    }

    def finish(b: Map[String, Long]): Map[String, Long] = b

    def bufferEncoder: Encoder[Map[String, Long]] =
      Encoders.kryo[Map[String, Long]]
    def outputEncoder: Encoder[Map[String, Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[
        Map[String, Long]]()
  }

  /** The aggregator as a Column-API UDAF: `df.agg(mgSketch(64)(col))`. */
  def mgSketch(k: Int): Column => Column = {
    val agg = udaf(new MisraGries(k))
    c => agg(c)
  }
}
