package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming operator surface (SURVEY §2.9) — the Spark-4 re-expression of
  * spark-cep's continuous SQL layer.
  *
  * The reference registers a DStream as a stream table and runs
  * `SELECT ... FROM s OVER (WINDOW 'w' SECONDS, SLIDE 's' SECONDS)` every
  * slide, keeping per-pane partial aggregates in Redis
  * [SURVEY §2.9/§4.1 R]. Structured Streaming subsumes each piece:
  * the window clause → `window()`/`session_window()` groupings below;
  * the incremental pane state → the state store (RocksDB provider at
  * scale, see [[StreamingConf]]); the periodic execution → micro-batch
  * IncrementalExecution; late data (which the reference's processing-time
  * windows could not express) → watermarks.
  *
  * Every builder takes/returns a DataFrame and works identically on batch
  * and streaming inputs — the batch/streaming equivalence is asserted in
  * ScalaTest (`StreamingTwinSpec`), which is the modern form of the
  * reference's per-batch assertion suites.
  */
object StreamOps {
  /** Event-time tumbling window aggregation (reference: WINDOW w == SLIDE w). */
  def tumblingCounts(events: DataFrame, window_ : String): DataFrame =
    events
      .groupBy(window(col("ts"), window_), col("event_type"))
      .agg(count(lit(1)).as("cnt"), round(sum("value"), 2).as("sum_value"))
      .select(col("window.start").as("ws"), col("event_type"), col("cnt"),
        col("sum_value"))

  /** Event-time sliding window aggregation (reference: WINDOW w, SLIDE s —
    * its flagship incremental aggregation; the state store maintains the
    * per-window running aggregates incrementally, same asymptotics as the
    * reference's Redis panes with no external service). */
  def slidingCounts(events: DataFrame, window_ : String, slide: String)
      : DataFrame =
    events
      .groupBy(window(col("ts"), window_, slide), col("event_type"))
      .agg(count(lit(1)).as("cnt"), round(sum("value"), 2).as("sum_value"))
      .select(col("window.start").as("ws"), col("event_type"), col("cnt"),
        col("sum_value"))

  /** Event-time OHLC bars (r8): open/high/low/close + count/volume per
    * (event_type, window). The order-sensitive open/close ride min_by /
    * max_by on the (ts, event_id) total order — unlike window functions
    * these are plain aggregates, so the SAME expression runs batch and
    * incremental (each micro-batch folds its rows into the stored
    * extremes; merge keeps the lexicographic min/max struct). The
    * streaming twin of q_resample_ohlc (StreamingTwinSpec pins parity;
    * only the non-associative volume sum needs the 2-dp round). */
  def ohlcBars(events: DataFrame, window_ : String): DataFrame =
    events
      .groupBy(window(col("ts"), window_), col("event_type"))
      .agg(
        min_by(col("value"), struct(col("ts"), col("event_id"))).as("open"),
        max(col("value")).as("high"), min(col("value")).as("low"),
        max_by(col("value"), struct(col("ts"), col("event_id")))
          .as("close"),
        count(lit(1)).as("cnt"),
        (floor(sum("value") * 100 + lit(0.5)) / 100).as("volume"))
      .select(col("window.start").as("bucket_ts"), col("event_type"),
        col("open"), col("high"), col("low"), col("close"), col("cnt"),
        col("volume"))

  /** Gap-based session windows per user (beyond the reference's surface —
    * standard CEP; SURVEY §2.9 C3). */
  def sessionCounts(events: DataFrame, gap: String): DataFrame =
    events
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("user_id"), col("session_window.start").as("s_start"),
        col("session_window.end").as("s_end"), col("cnt"))

  /** Session windows with a PER-EVENT gap expression (r6): the dynamic
    * form of [[sessionCounts]] — Structured Streaming merges the
    * variable-width [ts, ts+gap) windows in the state store exactly as
    * batch does (twin-tested against the oracle-gated
    * `q_session_dynamic`). */
  def sessionCountsDynamic(events: DataFrame,
      gapExpr: org.apache.spark.sql.Column): DataFrame =
    events
      .groupBy(session_window(col("ts"), gapExpr), col("user_id"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("user_id"), col("session_window.start").as("s_start"),
        col("session_window.end").as("s_end"), col("cnt"))

  /** Streaming dedup on key columns. On a stream with a watermark, prefer
    * [[dedupWithinWatermark]] so state is bounded. */
  def dedup(events: DataFrame, keys: Seq[String]): DataFrame =
    events.select(keys.map(col): _*).dropDuplicates(keys)

  /** Watermark-bounded streaming dedup — state for a key is dropped once
    * the watermark passes it (the 100 TB-safe variant). */
  def dedupWithinWatermark(events: DataFrame, delay: String,
      keys: Seq[String]): DataFrame =
    events.withWatermark("ts", delay).dropDuplicatesWithinWatermark(keys)

  /** Attach an event-time watermark (late-data bound). */
  def withLateness(events: DataFrame, delay: String): DataFrame =
    events.withWatermark("ts", delay)

  /** Attach named per-batch metrics to a stream (the engine-monitoring
    * surface; the reference exposed engine counters — Structured
    * Streaming's `observe` is the native form): every micro-batch's
    * progress carries `rows`, `max_ts`, and `null_keys` under `name` in
    * `StreamingQueryProgress.observedMetrics`, with zero effect on the
    * query's results (pinned in StreamingTwinSpec). Works on batch
    * frames too (read via QueryExecutionListener). */
  def withMetrics(df: DataFrame, name: String,
      tsCol: String = "ts", keyCol: String = "user_id"): DataFrame =
    df.observe(name, count(lit(1)).as("rows"),
      max(col(tsCol)).as("max_ts"),
      count(when(col(keyCol).isNull, 1)).as("null_keys"))

  /** Stream–stream interval join (SURVEY §2.3 J9): rows of `right` within
    * (leftTs, leftTs + interval] of a matching-key `left` row, both sides
    * unbounded streams. The watermarks + the time-range condition bound
    * the join state on both sides (StreamingSymmetricHashJoinExec evicts
    * rows once the watermark passes leftTs + interval) — the property the
    * reference obtained by windowing both streams before joining.
    * Column names must be disjoint except the key columns. */
  def streamStreamIntervalJoin(left: DataFrame, right: DataFrame,
      key: Seq[String], leftTs: String, rightTs: String, interval: String,
      lateness: String, joinType: String = "inner"): DataFrame = {
    val l = left.withWatermark(leftTs, lateness)
    val r = right.withWatermark(rightTs, lateness)
    val cond = key.map(k => l(k) === r(k)).reduce(_ && _) &&
      r(rightTs) > l(leftTs) &&
      r(rightTs) <= l(leftTs) + expr(s"INTERVAL $interval")
    // outer types are legal here BECAUSE both sides carry watermarks and
    // the condition bounds event time both ways: the engine emits the
    // null-padded row once the watermark proves no match can still
    // arrive (twin-tested against the batch outer join in StreamJoinSpec)
    l.join(r, cond, joinType)
  }
}
