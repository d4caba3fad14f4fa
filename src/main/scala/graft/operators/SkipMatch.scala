package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** AFTER MATCH SKIP PAST LAST ROW sequence matching — the scale path for
  * [[graft.streaming.CepSql]]'s skip-past dialect mode (the SQL-text twin
  * is a recursive CTE; SkipMatchSpec pins the two equivalent).
  *
  * Semantics (greedy, non-overlapping, deterministic): per key, events are
  * processed in (ts, id) order. A match anchors at the first step-1 event
  * strictly after the previous match's last row ((ts, id) ordering breaks
  * ties); each later step matches the FIRST event of its class with ts
  * strictly greater than the previous step's ts, no later than the
  * anchor's ts + window. An anchor whose chain cannot complete consumes
  * nothing — matching resumes at the next candidate anchor.
  *
  * Scale shape: one shuffle (groupByKey on the match key) after a
  * type-pruned scan (only event types named by the pattern are read —
  * the IN filter pushes to the source), then a LINEAR per-key scan; no
  * join, no recursion, state O(events-in-window). The per-key event list
  * is materialized in executor memory — keys are users/sessions, so a
  * single key's relevant events fit by the same argument every
  * `Window.partitionBy(key)` in this library relies on.
  */
object SkipMatch {
  private def us(t: Timestamp): Long =
    t.getTime / 1000 * 1000000L + t.getNanos / 1000

  /** One pattern-relevant event: (ts in micros, id, original ts, class
    * bitmask — bit j set when the event is in step j's class). */
  private[graft] case class Ev(tsUs: Long, id: Long, ts: Timestamp,
      mask: Int)

  /** The shared greedy core (batch operator AND streaming detector):
    * scan `evs` (sorted by (tsUs, id)) for non-overlapping chain matches
    * starting strictly after (lastTs0, lastId0).
    *
    * `horizonUs` is the INCLUSIVE finalization horizon (the event-time
    * watermark in streaming; Long.MaxValue in batch): events with
    * `tsUs <= horizonUs` are final. Inclusive is safe against exact-
    * boundary late arrivals because Spark DROPS late rows at
    * `ts <= watermark`: the stateful late-row predicate is
    * `LessThanOrEqual(eventTime, watermark)` (verified against the
    * Spark 4.1.2 bytecode — `WatermarkSupport$.watermarkExpression`
    * builds LessThanOrEqual, and `FlatMapGroupsWithStateExec` filters
    * input with `watermarkPredicateForDataForLateEvents`, whose
    * watermark for batch N is batch N-1's eviction watermark = the
    * value `GroupState.getCurrentWatermarkMs` returned when batch N-1's
    * decisions were made). So no event with ts equal to the horizon can
    * ever arrive in a later batch — an equal-ts pick is immutable
    * (investigated for ADVICE r7; SkipDetectorSpec's exact-boundary
    * test pins Spark's drop behavior so a change there surfaces here).
    * A completed chain commits only when its anchor and every pick are
    * at or below the horizon; a failed anchor is discarded only once
    * its whole window is below the horizon (no future completion
    * possible). The first anchor that can do neither blocks the scan —
    * greedy matching is order-dependent — and is returned as
    * `pendingIdx` (-1 when none).
    *
    * Returns (matches — one Array[Ev] of picks per match, in order;
    * last consumed tsUs; last consumed id; pendingIdx). */
  private[graft] def greedyScan(evs: Array[Ev], n: Int, withinUs: Long,
      lastTs0: Long, lastId0: Long, horizonUs: Long)
      : (List[Array[Ev]], Long, Long, Int) = {
    val out = List.newBuilder[Array[Ev]]
    var lastTs = lastTs0
    var lastId = lastId0
    var pendingIdx = -1
    var ai = 0
    while (ai < evs.length && pendingIdx < 0) {
      val a = evs(ai)
      if ((a.mask & 1) != 0 &&
          (a.tsUs > lastTs || (a.tsUs == lastTs && a.id > lastId))) {
        val picks = new Array[Ev](n)
        picks(0) = a
        val limit =
          try Math.addExact(a.tsUs, withinUs)
          catch { case _: ArithmeticException => Long.MaxValue }
        var j = 1
        var pos = ai + 1
        var prevTs = a.tsUs
        var ok = true
        while (j < n && ok) {
          var found = -1
          var p = pos
          while (found < 0 && p < evs.length && evs(p).tsUs <= limit) {
            val e = evs(p)
            if ((e.mask & (1 << j)) != 0 && e.tsUs > prevTs) found = p
            p += 1
          }
          if (found < 0) ok = false
          else {
            picks(j) = evs(found)
            prevTs = evs(found).tsUs
            pos = found + 1
            j += 1
          }
        }
        if (ok && a.tsUs <= horizonUs && picks.forall(_.tsUs <= horizonUs)) {
          out += picks
          lastTs = picks(n - 1).tsUs
          lastId = picks(n - 1).id
        } else if (limit > horizonUs) {
          // neither committable nor provably failed: the window is still
          // open (a future event, all of which have ts strictly greater
          // than the horizon, can land inside it) or a pick sits above
          // the horizon — block here
          pendingIdx = ai
        }
        // else: window fully below the horizon and incomplete — the
        // anchor is provably failed and consumes nothing
      }
      ai += 1
    }
    (out.result(), lastTs, lastId, pendingIdx)
  }

  /** Output schema shared by the batch operator and the streaming
    * detector: (key, id_1…id_n, ts_1…ts_n). */
  private[graft] def outSchema(keyCol: String, n: Int): StructType =
    StructType(
      StructField(keyCol, LongType) +:
        ((1 to n).map(i => StructField(s"id_$i", LongType)) ++
          (1 to n).map(i => StructField(s"ts_$i", TimestampType))))

  private[graft] def toRow(key: Long, picks: Array[Ev]): Row = {
    val n = picks.length
    val vals = new Array[Any](1 + 2 * n)
    vals(0) = key
    var i = 0
    while (i < n) {
      vals(1 + i) = picks(i).id
      vals(1 + n + i) = picks(i).ts
      i += 1
    }
    Row.fromSeq(vals.toSeq)
  }

  /** `steps`: one Seq of event names per pattern step (size > 1 =
    * alternation). `conds` (r7, optional): per-step numeric condition
    * `(column, op, bound)` with op ∈ <, <=, >, >=, =, != — the step's
    * class becomes "type AND condition" (NULL column values fail the
    * condition, matching SQL three-valued logic collapsing to false in
    * a WHERE). Output: (keyCol, id_1…id_n, ts_1…ts_n) ordered by id_1,
    * one row per match. `keyCol` must be integral (the events-table
    * convention — user/session ids). */
  def matchChain(events: DataFrame, steps: Seq[Seq[String]], withinMs: Long,
      keyCol: String = "user_id", tsCol: String = "ts",
      typeCol: String = "event_type", idCol: String = "event_id",
      conds: Seq[Option[(String, String, Double)]] = Nil)
      : DataFrame = {
    require(steps.length >= 2, "a pattern needs at least 2 steps")
    require(conds.isEmpty || conds.length == steps.length,
      "conds must be empty or align 1:1 with steps")
    val n = steps.length
    val classes: Array[Set[String]] = steps.map(_.toSet).toArray
    val allTypes = classes.flatten.distinct.toSeq
    val withinUs = withinMs * 1000L
    val condArr: Array[Option[(String, String, Double)]] =
      if (conds.isEmpty) Array.fill(n)(None) else conds.toArray
    val condCols = condArr.flatten.map(_._1).distinct
    // cond column positions in the narrowed row: after (key, id, ts, type)
    val condIdx: Map[String, Int] =
      condCols.zipWithIndex.map { case (c, i) => c -> (4 + i) }.toMap

    implicit val keyEnc = org.apache.spark.sql.Encoders.scalaLong
    implicit val rowEnc = Encoders.row(outSchema(keyCol, n))
    val src = events
      .filter(col(typeCol).isin(allTypes: _*))
      .select((Seq(col(keyCol).cast("long"), col(idCol).cast("long"),
        col(tsCol).cast("timestamp"), col(typeCol).cast("string")) ++
        condCols.map(c => col(c).cast("double"))): _*)

    def cmp(op: String, v: Double, bound: Double): Boolean = op match {
      case "<"  => v < bound
      case "<=" => v <= bound
      case ">"  => v > bound
      case ">=" => v >= bound
      case "="  => v == bound
      case _    => v != bound
    }

    src.groupByKey((r: Row) => r.getLong(0)).flatMapGroups {
      (key: Long, it: Iterator[Row]) =>
        val evs = it.map { r =>
          val tpe = r.getString(3)
          var mask = 0
          var j = 0
          while (j < n) {
            val inClass = classes(j).contains(tpe) && (condArr(j) match {
              case None => true
              case Some((c, op, bound)) =>
                val i = condIdx(c)
                !r.isNullAt(i) && cmp(op, r.getDouble(i), bound)
            })
            if (inClass) mask |= 1 << j
            j += 1
          }
          Ev(us(r.getTimestamp(2)), r.getLong(1), r.getTimestamp(2), mask)
        }.toArray.sortBy(e => (e.tsUs, e.id))
        val (matches, _, _, _) = greedyScan(evs, n, withinUs,
          Long.MinValue, Long.MinValue, Long.MaxValue)
        matches.iterator.map(picks => toRow(key, picks))
    }.orderBy("id_1")
  }
}
