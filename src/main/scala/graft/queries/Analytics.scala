package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Event-stream analytics built from the CEP primitives (SURVEY §2.9's
  * application layer): conversion funnels, cohort retention, event-path
  * mining, and value histograms. These are the queries a user of the
  * reference's continuous-SQL engine runs on top of its windows/joins —
  * declared here as batch keys with DuckDB oracles; the building blocks
  * (time windows, lag/lead, interval joins) have streaming twins in
  * graft.streaming.
  *
  * Scale notes (100 TB): every query below shuffles on `user_id` (or a
  * histogram bin) exactly once, then stays co-partitioned — funnel's three
  * stage-joins reuse the same hash partitioning, and the path trigrams are
  * computed inside one per-user window pass. Nothing collects to the
  * driver; outputs are small aggregates (stage counts, cohort matrix,
  * top-10 paths, fixed-width bins).
  */
object Analytics {
  private def T(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.table(s, dir, n)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Conversion funnel signup → click → purchase, strictly ordered in
    // event time per user. Each stage is min-ts of the qualifying event
    // after the previous stage's timestamp; stage rows count survivors.
    "q_funnel" -> ((s, dir) => {
      val e = T(s, dir, "events")
      val su = e.filter(col("event_type") === "signup")
        .groupBy("user_id").agg(min("ts").as("t1"))
      val cl = e.filter(col("event_type") === "click")
        .join(su, "user_id").filter(col("ts") > col("t1"))
        .groupBy("user_id").agg(min("ts").as("t2"))
      val pu = e.filter(col("event_type") === "purchase")
        .join(cl, "user_id").filter(col("ts") > col("t2"))
        .groupBy("user_id").agg(min("ts").as("t3"))
      su.agg(count(lit(1)).as("users")).withColumn("stage", lit("1_signup"))
        .unionByName(cl.agg(count(lit(1)).as("users"))
          .withColumn("stage", lit("2_click")))
        .unionByName(pu.agg(count(lit(1)).as("users"))
          .withColumn("stage", lit("3_purchase")))
        .select("stage", "users")
        .orderBy("stage")
    }),

    // Weekly cohort retention: cohort = user's first-seen week, offset =
    // weeks since first seen; cell = distinct active users. All-integer
    // date arithmetic (floor(day-diff / 7) — FLOOR division, matching
    // DuckDB `//` even for pre-epoch timestamps) — no engine-specific week
    // truncation rules in play.
    "q_cohort" -> ((s, dir) => {
      val ed = T(s, dir, "events")
        .select(col("user_id"), to_date(col("ts")).as("d"))
      val first = ed.groupBy("user_id").agg(min("d").as("fd"))
      ed.join(first, "user_id")
        .withColumn("cohort_week",
          expr("floor(datediff(fd, date '2024-01-01') / 7)").cast("long"))
        .withColumn("week_offset",
          expr("floor(datediff(d, fd) / 7)").cast("long"))
        .groupBy("cohort_week", "week_offset")
        .agg(countDistinct("user_id").as("users"))
        .orderBy("cohort_week", "week_offset")
    }),

    // Path mining: top-10 event-type trigrams over each user's event-time
    // ordered stream (ts, event_id total order — deterministic under
    // timestamp ties). One window pass, one count shuffle, TakeOrdered.
    "q_event_path" -> ((s, dir) => {
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      T(s, dir, "events")
        .select(col("user_id"), col("ts"), col("event_id"),
          col("event_type"))
        .withColumn("e2", lead("event_type", 1).over(w))
        .withColumn("e3", lead("event_type", 2).over(w))
        .filter(col("e3").isNotNull)
        .select(concat_ws(">", col("event_type"), col("e2"), col("e3"))
          .as("path"))
        .groupBy("path").agg(count(lit(1)).as("cnt"))
        .orderBy(desc("cnt"), asc("path"))
        .limit(10)
    }),

    // Fixed-width histogram of order value: bin floor keeps the key
    // integral (skew-free single shuffle; bins are a few dozen rows out
    // regardless of input scale).
    // Gaps-and-islands, the gap side: per-user silences of >= 1 hour in
    // the event stream (the CEP "absence over a threshold" shape as a
    // batch key). One window pass over the per-user sort; the gap width
    // is exact integer microsecond arithmetic (no float minutes).
    "q_sequence_gap" -> ((s, dir) => {
      val w = Window.partitionBy("user_id")
        .orderBy(asc("ts"), asc("event_id"))
      T(s, dir, "events")
        .withColumn("nxt", lead(col("ts"), 1).over(w))
        .filter(col("nxt").isNotNull)
        .withColumn("gap_min",
          expr("(unix_micros(nxt) - unix_micros(ts)) div 60000000"))
        .filter(col("gap_min") >= 60)
        .select(col("user_id"), col("ts").as("gap_start"),
          col("nxt").as("gap_end"), col("gap_min"))
        .orderBy("user_id", "gap_start", "gap_end")
    }),

    "q_histogram" -> ((s, dir) => {
      T(s, dir, "orders")
        .withColumn("bin",
          (floor(col("o_totalprice") / 25000) * 25000).cast("long"))
        .groupBy("bin")
        .agg(count(lit(1)).as("cnt"),
          round(sum("o_totalprice"), 2).as("sum_price"))
        .orderBy("bin")
    }),

    // Time-series resample to OHLC bars (r8): 15-minute buckets per
    // event_type — open/close via first/last_value over the (ts,
    // event_id) total order, high/low/count/volume from the same
    // grouped pass. The bucket key is exact integer microsecond
    // division (no engine timestamp-truncation rules); open/close/high/
    // low are raw untouched doubles (bit-identical across engines), and
    // only the non-associative volume sum is fround-ed. One window pass
    // + one hash agg, keyed on (event_type, bucket) — bounded output
    // (types × buckets), skew-free at any input scale.
    "q_resample_ohlc" -> ((s, dir) => {
      val w = Window.partitionBy("event_type", "bucket")
        .orderBy(asc("ts"), asc("event_id"))
      val full = w.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing)
      T(s, dir, "events")
        .withColumn("bucket", expr("unix_micros(ts) div 900000000"))
        .withColumn("open", first("value").over(w))
        .withColumn("close", last("value").over(full))
        .groupBy("event_type", "bucket")
        .agg(max("open").as("open"), max("value").as("high"),
          min("value").as("low"), max("close").as("close"),
          count(lit(1)).as("cnt"), fround(sum("value"), 2).as("volume"))
        .withColumn("bucket_ts",
          expr("timestamp_micros(bucket * 900000000)"))
        .select("event_type", "bucket_ts", "open", "high", "low",
          "close", "cnt", "volume")
        .orderBy("event_type", "bucket_ts")
    }),

    // Bounded-lookback EWMA (r8): exponentially weighted moving average
    // of each user's event values over the trailing 16 rows, alpha=1/4.
    // The recurrence is non-associative (not a plain window SUM), so the
    // textbook prefix trick sum(x_i*(1-a)^-i)*(1-a)^t overflows double
    // at deep histories; the scale-safe form is the truncated kernel —
    // 16 explicit lag terms, all computed in ONE WindowExec pass. The
    // weights (3/4)^k are EXACT binary doubles (3^k < 2^53), the term
    // sum is written as the identical left-to-right fold in both
    // engines, so the quotient is bit-deterministic before the final
    // 4-dp fround. At 100 TB: one shuffle on user_id, O(1) state per
    // row, no driver traffic.
    "q_ewma" -> ((s, dir) => {
      val w = Window.partitionBy("user_id")
        .orderBy(asc("ts"), asc("event_id"))
      val lags = (0 to 15).map(k => lag(col("value"), k).over(w))
      val wts = (0 to 15).map(k => math.pow(0.75, k))
      val num = lags.zip(wts).map { case (l, wt) =>
        coalesce(l * lit(wt), lit(0.0)) }.reduce(_ + _)
      val den = lags.zip(wts).map { case (l, wt) =>
        when(l.isNotNull, lit(wt)).otherwise(lit(0.0)) }.reduce(_ + _)
      T(s, dir, "events")
        .select(col("user_id"), col("ts"), col("event_id"), col("value"))
        .withColumn("ewma", fround(num / den, 4))
        .select("user_id", "ts", "event_id", "ewma")
        .orderBy("user_id", "ts", "event_id")
    }),

    // Burst detection (r8): HOURS where an event type runs HOT — the
    // hourly count exceeds 3× the type's ACTIVE-hour average
    // (type_total / hours-with-activity; a span-wide average over a
    // sparse stream would flag every active bucket). The predicate is
    // exact integer arithmetic (cnt · active_hr > 3 · type_total — no
    // float rate compared), so the burst set is cross-engine
    // deterministic; the reported ratio rounds after the fact. Two
    // hash aggs + a 1-row-per-type broadcast join.
    "q_burst_detect" -> ((s, dir) => {
      val e = T(s, dir, "events")
        .withColumn("hr", expr("unix_micros(ts) div 3600000000"))
      val perHr = e.groupBy("event_type", "hr")
        .agg(count(lit(1)).as("cnt"))
      val totals = perHr.groupBy("event_type")
        .agg(sum("cnt").as("type_total"),
          count(lit(1)).as("active_hr"))
      perHr.join(broadcast(totals), "event_type")
        .filter(col("cnt") * col("active_hr") >
          lit(3L) * col("type_total"))
        .select(col("event_type"),
          expr("timestamp_micros(hr * 3600000000)").as("hour_ts"),
          col("cnt"),
          fround(col("cnt").cast("double") * col("active_hr") /
            col("type_total"), 4).as("rate_ratio"))
        .orderBy("event_type", "hour_ts")
    }),

    // LOCF gap fill (r8): the interpolation half q_time_spine's
    // zero-fill lacks — per event_type, every hour on the spine carries
    // the hourly mean value when observed, else the LAST observation
    // carried forward (the standard sensor/price imputation). The mean
    // rounds BEFORE the carry so both engines propagate identical
    // doubles. One spine explode (bounded), one agg, one window pass.
    "q_gap_fill" -> ((s, dir) => {
      val e = T(s, dir, "events")
      val bounds = e.agg(date_trunc("hour", min("ts")).as("lo"),
        date_trunc("hour", max("ts")).as("hi"))
      val spine = bounds
        .select(explode(expr("sequence(lo, hi, interval 1 hour)")).as("h"))
        .crossJoin(e.select("event_type").distinct())
      val hourly = e.groupBy(date_trunc("hour", col("ts")).as("h"),
          col("event_type"))
        .agg(fround(avg("value"), 4).as("obs"))
      val w = Window.partitionBy("event_type").orderBy("h")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      spine.join(hourly, Seq("h", "event_type"), "left")
        .withColumn("filled", last("obs", ignoreNulls = true).over(w))
        .withColumn("is_observed", col("obs").isNotNull)
        .select("event_type", "h", "filled", "is_observed")
        .orderBy("event_type", "h")
    }),

    // Time-weighted average (r8): each event's value holds until the
    // user's next event (capped at the day boundary), so the daily
    // average weights by HOLDING TIME, not event count — the TWAP every
    // tick-data engine ships. Weights are exact integer microseconds;
    // only the final quotient rounds. One lead pass + one agg.
    "q_twap" -> ((s, dir) => {
      val w = Window.partitionBy("user_id", "day")
        .orderBy(asc("ts"), asc("event_id"))
      T(s, dir, "events")
        .withColumn("day", to_date(col("ts")))
        .withColumn("seg_end",
          coalesce(lead("ts", 1).over(w),
            expr("timestamp_micros(unix_micros(CAST(day + 1 AS " +
              "TIMESTAMP)))")))
        .withColumn("dur",
          expr("unix_micros(seg_end) - unix_micros(ts)"))
        .groupBy("user_id", "day")
        .agg(count(lit(1)).as("n_events"),
          fround(sum(col("value") * col("dur")) /
            sum(col("dur")), 4).as("twap"))
        .orderBy("user_id", "day")
    }),

    // A/B lift (r8): the experimentation readout — users split into
    // arms by md5 parity (the q_split_hash discipline: deterministic,
    // uniform, reproducible), conversion = "user purchased", lift and
    // the pooled two-proportion z statistic. Every number derives from
    // exact integer counts (rates are exact IEEE divisions; z's
    // numerator/denominator are rounded only at the end), so the 4-dp
    // fround is cross-engine-stable. Two hash aggs over users — at
    // 100 TB the heavy side is the per-user conversion flag, one
    // map-side-combined pass.
    "q_ab_lift" -> ((s, dir) => {
      val users = T(s, dir, "events")
        .groupBy("user_id")
        .agg(max(when(col("event_type") === "purchase", 1L)
          .otherwise(0L)).as("converted"))
        .withColumn("arm",
          when(instr(lit("0123456789abcdef"),
            substring(md5(col("user_id").cast("string")), 1, 1)) % 2
            === 1, "A").otherwise("B"))
      val arms = users.groupBy("arm")
        .agg(count(lit(1)).as("n"), sum("converted").as("conv"))
      val wide = arms.groupBy()
        .agg(
          max(when(col("arm") === "A", col("n"))).as("n_a"),
          max(when(col("arm") === "A", col("conv"))).as("conv_a"),
          max(when(col("arm") === "B", col("n"))).as("n_b"),
          max(when(col("arm") === "B", col("conv"))).as("conv_b"))
      val (ra, rb) = (col("conv_a").cast("double") / col("n_a"),
        col("conv_b").cast("double") / col("n_b"))
      val pPool = (col("conv_a") + col("conv_b")).cast("double") /
        (col("n_a") + col("n_b"))
      val se = sqrt(pPool * (lit(1.0) - pPool) *
        (lit(1.0) / col("n_a") + lit(1.0) / col("n_b")))
      wide.select(col("n_a"), col("conv_a"), col("n_b"), col("conv_b"),
        fround(ra, 4).as("rate_a"), fround(rb, 4).as("rate_b"),
        fround(ra - rb, 4).as("lift"),
        // degenerate experiment (all or none convert) → se = 0 and the
        // z statistic is undefined: NULL, in both engines (ANSI Spark
        // would raise on the division; DuckDB would emit inf)
        when(se > 0, fround((ra - rb) / se, 4)).as("z"))
    }),

    // RFM segmentation (r8, distributed r9): the classic user-value
    // matrix — recency (last activity), frequency (event count),
    // monetary (purchase value) quartiled into a 3-digit segment.
    // Quartiles are EXACT ntile(4) over FULLY deterministic orders (the
    // monetary sort key is rounded FIRST so cross-engine ulp differences
    // in the double sum cannot flip the order; user_id breaks all ties)
    // — but computed by Ranking.withGlobalNtile, NOT an unpartitioned
    // window: each of the three passes is one range exchange over the
    // per-user frame + a map-side rank from (partition offset, local
    // row index), so no task ever sees more than one range partition.
    // Three range shuffles of one-row-per-user is the floor for three
    // independent orderings, and each holds at billions of users.
    "q_rfm" -> ((s, dir) => {
      // r15 (guide §1.1 measured): repartitionByRange SAMPLES its input
      // to pick range bounds, then shuffles it — an unmaterialized base
      // meant the events aggregation ran TWICE per execution (the probe
      // showed two ~equal heavy map stages, 8.2 s + 5.6 s task-summed).
      // Caching the per-user frame makes the sampler and the exchange
      // read one materialized pass of events.
      val base = graft.Caching.cache(T(s, dir, "events")
        .groupBy("user_id")
        .agg(max("ts").as("last_ts"), count(lit(1)).as("freq"),
          fround(coalesce(sum(when(col("event_type") === "purchase",
            col("value"))), lit(0.0)), 2).as("mon")))
      import graft.operators.Ranking.withGlobalNtile
      val r = withGlobalNtile(base, 4, "r_score",
        desc("last_ts"), asc("user_id"))
      val f = withGlobalNtile(r, 4, "f_score",
        desc("freq"), asc("user_id"))
      withGlobalNtile(f, 4, "m_score", desc("mon"), asc("user_id"))
        .withColumn("segment",
          col("r_score") * 100 + col("f_score") * 10 + col("m_score"))
        .select("user_id", "r_score", "f_score", "m_score", "segment")
        .orderBy("user_id")
    }),

    // Week-over-week growth (r8): weekly event counts per type with the
    // previous week's count and the growth ratio — the top-line trend
    // panel every analytics engine serves. Integer-exact week bucketing
    // (floor(day-diff / 7) from a fixed epoch — floor matches DuckDB `//` on negatives, no engine week-truncation
    // rules), counts are exact ints, and the ratio is exact IEEE
    // division of ints. One agg + one bounded window over type×weeks.
    "q_growth_wow" -> ((s, dir) => {
      val w = Window.partitionBy("event_type").orderBy("week")
      T(s, dir, "events")
        .withColumn("week",
          expr("floor(datediff(CAST(ts AS DATE), date '2024-01-01') / 7)")
            .cast("long"))
        .groupBy("event_type", "week")
        .agg(count(lit(1)).as("cnt"))
        .withColumn("prev_cnt", lag("cnt", 1).over(w))
        .withColumn("wow",
          col("cnt").cast("double") / col("prev_cnt").cast("double"))
        .select("event_type", "week", "cnt", "prev_cnt", "wow")
        .orderBy("event_type", "week")
    }),

    // Stage-gap funnel (r8): q_funnel measures each stage from the
    // PREVIOUS stage with an unbounded gap; real funnels bound each
    // hop (signup → click within 24 h → purchase within 24 h OF THE
    // CLICK). Same per-stage min-ts shape — the bound just rides the
    // join predicate, so the plan still shuffles once per stage on
    // user_id and reuses that partitioning.
    "q_funnel_gap" -> ((s, dir) => {
      val e = T(s, dir, "events")
      val su = e.filter(col("event_type") === "signup")
        .groupBy("user_id").agg(min("ts").as("t1"))
      val cl = e.filter(col("event_type") === "click")
        .join(su, "user_id")
        .filter(col("ts") > col("t1") &&
          col("ts") <= col("t1") + expr("INTERVAL 24 HOURS"))
        .groupBy("user_id").agg(min("ts").as("t2"))
      val pu = e.filter(col("event_type") === "purchase")
        .join(cl, "user_id")
        .filter(col("ts") > col("t2") &&
          col("ts") <= col("t2") + expr("INTERVAL 24 HOURS"))
        .groupBy("user_id").agg(min("ts").as("t3"))
      su.agg(count(lit(1)).as("users")).withColumn("stage", lit("1_signup"))
        .unionByName(cl.agg(count(lit(1)).as("users"))
          .withColumn("stage", lit("2_click_24h")))
        .unionByName(pu.agg(count(lit(1)).as("users"))
          .withColumn("stage", lit("3_purchase_24h")))
        .select("stage", "users")
        .orderBy("stage")
    }),

    // Trailing exact median (r8): per user, the interpolated median of
    // the last 15 event values — the robust centre a monitoring rule
    // compares against (pairs with q_zscore below, which uses the
    // moment-based centre). Exact `percentile` over a bounded ROWS
    // frame: O(frame) per row, one shuffle on user_id, no driver
    // traffic; both engines interpolate the same two middle elements of
    // the same 15 doubles, so the 4-dp fround is stable.
    "q_rolling_median" -> ((s, dir) => {
      val w = Window.partitionBy("user_id")
        .orderBy(asc("ts"), asc("event_id")).rowsBetween(-14, 0)
      T(s, dir, "events")
        .select(col("user_id"), col("ts"), col("event_id"), col("value"))
        .withColumn("med", fround(percentile(col("value"), lit(0.5)).over(w), 4))
        .select("user_id", "ts", "event_id", "med")
        .orderBy("user_id", "ts", "event_id")
    }),

    // Trailing z-score anomaly flag (r8): per user, z = (x - mean) /
    // stddev over the previous 16 rows (current inclusive); |z| > 2 on
    // the ROUNDED score flags the row. Rounding BEFORE the threshold
    // keeps the flag cross-engine deterministic (the two engines'
    // variance accumulations differ in the last ulp; the rounded score
    // is compared, never the raw one). Same single-window shape as
    // q_ewma — O(1) state per row at any scale.
    "q_zscore" -> ((s, dir) => {
      val w = Window.partitionBy("user_id")
        .orderBy(asc("ts"), asc("event_id")).rowsBetween(-15, 0)
      T(s, dir, "events")
        .select(col("user_id"), col("ts"), col("event_id"), col("value"))
        // all window columns in ONE pass BEFORE the warm-up filter —
        // filtering first would re-frame the window over survivors
        .withColumn("n_win", count(lit(1)).over(w))
        .withColumn("mu", avg("value").over(w))
        .withColumn("sd", stddev_samp("value").over(w))
        .filter(col("n_win") >= 8) // warm-up: variance needs support
        .withColumn("z", fround((col("value") - col("mu")) / col("sd"), 3))
        .withColumn("is_anomaly", abs(col("z")) > lit(2.0))
        .select("user_id", "ts", "event_id", "z", "is_anomaly")
        .orderBy("user_id", "ts", "event_id")
    }),

    // First-order Markov transition matrix over event types (r8): the
    // sequence-mining summary behind q_event_path — P(next | current)
    // from each user's event-time-ordered stream. The probability is a
    // ratio of exact integers (bit-identical IEEE division in both
    // engines — no rounding needed). One lead pass, one count shuffle,
    // one bounded window over the 5×5 output.
    // Inter-arrival gap percentiles (r9): per type, the median/p90 gap
    // between a user's consecutive events of that type — the ops
    // readout behind rate alerting and session-gap tuning. Gaps are
    // exact integer micros (one partitioned lag pass); the exact
    // interpolated percentile of integers is the q_percentile
    // discipline, rounded 4 dp.
    "q_interarrival" -> ((s, dir) => {
      val w = Window.partitionBy("user_id", "event_type")
        .orderBy(asc("ts"), asc("event_id"))
      T(s, dir, "events")
        .withColumn("gap_us",
          unix_micros(col("ts")) - lag(unix_micros(col("ts")), 1).over(w))
        .filter(col("gap_us").isNotNull)
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_gaps"),
          fround(expr("percentile(gap_us, 0.5)"), 4).as("p50_us"),
          fround(expr("percentile(gap_us, 0.9)"), 4).as("p90_us"))
        .orderBy("event_type")
    }),

    // Seasonal-naive forecast backtest (r9): forecast(type, week) =
    // actual(type, week-1), scored with per-type MAPE over the weeks
    // both sides exist — the baseline every forecasting stack must
    // beat, and the shape (one agg + one lag window + one agg) is the
    // whole backtest loop. Counts are exact ints; the error ratio and
    // its mean round once at the end.
    "q_forecast_naive" -> ((s, dir) => {
      val w = Window.partitionBy("event_type").orderBy("week")
      T(s, dir, "events")
        .withColumn("week",
          expr("floor(datediff(CAST(ts AS DATE), date '2024-01-01') / 7)")
            .cast("long"))
        .groupBy("event_type", "week")
        .agg(count(lit(1)).as("cnt"))
        .withColumn("fc", lag("cnt", 1).over(w))
        .filter(col("fc").isNotNull)
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_weeks"),
          fround(avg(abs(col("cnt") - col("fc")) /
            col("cnt").cast("double")), 4).as("mape"))
        .orderBy("event_type")
    }),

    // Table profiler (r9): per-column null count / distinct count /
    // min / max over the events table — the data-quality readout every
    // engine ships (ANALYZE/profile). One map-combined pass; the
    // per-column rows unpivot via stack so the report is schema-stable,
    // with TYPED min/max columns (numeric vs string) instead of
    // rendering doubles to text — double formatting is engine-specific,
    // typed values hash-compare exactly.
    //
    // Scale path (r10, pinned): THREE exact countDistincts in one agg
    // plan an Expand (×3 row multiply before the shuffle) — exactness
    // is what makes this key oracle-checkable, but a 100 TB profiler
    // swaps each for approx_count_distinct (HLL±5%, one pass, NO
    // Expand) — the q_approx_distinct discipline. AnalyticsSpec's
    // "q_profile approx twin" test pins the swap: the approx readout
    // stays within HLL error of this exact key on every column.
    // r14 (optimization round): the single 13-function agg planned
    // SORT aggregates end-to-end — min/max(event_type) put a STRING in
    // the aggregation buffer, which HashAggregateExec cannot hold, so
    // the ×4 Expand of the whole table paid a full Sort on (type,
    // value, user, gid) before aggregating (measured 1.46 s exec;
    // plans/r14/q_profile_before.txt). Split instead: the string
    // column's profile folds over a per-type HASH group-by (|types|
    // rows — the string min/max then runs over 5 rows), and the
    // numeric agg keeps only fixed-width buffers so its ×3 Expand is
    // pure HashAggregate. Values are provably identical: n_rows =
    // Σ group counts, nn_type = Σ counts of the null group, nd_type =
    // count of non-null group keys, min/max over keys = min/max over
    // rows. One extra (trivial) scan; zero Sorts before the output
    // orderBy.
    "q_profile" -> ((s, dir) => {
      val e = T(s, dir, "events")
      val typ = e.groupBy("event_type").agg(count(lit(1)).as("c"))
        .agg(
          sum("c").as("n_rows"),
          sum(when(col("event_type").isNull, col("c")).otherwise(0L))
            .as("nn_type"),
          count("event_type").as("nd_type"),
          min("event_type").as("mn_type"), max("event_type").as("mx_type"))
      e.agg(
          sum(col("user_id").isNull.cast("long")).as("nn_user"),
          countDistinct(col("user_id")).as("nd_user"),
          min("user_id").as("mn_user"), max("user_id").as("mx_user"),
          sum(col("value").isNull.cast("long")).as("nn_val"),
          countDistinct(col("value")).as("nd_val"),
          fround(min("value"), 4).as("mn_val"),
          fround(max("value"), 4).as("mx_val"))
        .crossJoin(typ)
        .selectExpr("stack(3, " +
          "'event_type', n_rows, nn_type, nd_type, " +
          "CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE), mn_type, mx_type, " +
          "'user_id', n_rows, nn_user, nd_user, " +
          "CAST(mn_user AS DOUBLE), CAST(mx_user AS DOUBLE), " +
          "CAST(NULL AS STRING), CAST(NULL AS STRING), " +
          "'value', n_rows, nn_val, nd_val, mn_val, mx_val, " +
          "CAST(NULL AS STRING), CAST(NULL AS STRING)" +
          ") AS (col_name, n_rows, n_null, n_distinct, " +
          "min_num, max_num, min_str, max_str)")
        .orderBy("col_name")
    }),

    // Last-touch attribution report (r9; r10 rewrote the plan): every
    // purchase attributes to the user's LATEST click/view strictly
    // before it within a 7-day lookback, else 'unattributed' — the
    // marketing-channel readout. r9 shaped this as rank-1 over a left
    // band join (user-equi + 7-day residual) — exactly the hot-key
    // quadratic shape HotKeyProbe measured at 174.7 s for 100k×100k:
    // a bot user's purchases×touches exploded BEFORE the rank-1 filter
    // pruned. r10 rides the zero-pair carry discipline instead
    // (operators.TemporalJoins.asofJoinBackwardCarry, strict): one
    // shuffle + one sort per user carries the latest strictly-earlier
    // touch (type + ts riding the payload), and the 7-day lookback
    // becomes a POST-carry filter — sound because the latest
    // strictly-earlier touch is in-window iff ANY in-window touch
    // exists (it is the max of them). HotKeyProbe's attribution row
    // pins bounded hot-key work; PlanShapeSpec pins zero joins.
    // Revenue rounds at 2 dp only at the end (exact 2-dp inputs).
    "q_attribution" -> ((s, dir) => {
      val e = T(s, dir, "events")
      val pur = e.filter(col("event_type") === "purchase")
        .select(col("event_id").as("p_id"), col("user_id"),
          col("ts").as("p_ts"), col("value").as("p_val"))
      val tou = e.filter(col("event_type").isin("click", "view"))
        .select(col("event_id").as("t_id"), col("user_id"),
          col("ts").as("t_ts"), col("event_type").as("touch_raw"))
      graft.operators.TemporalJoins.asofJoinBackwardCarry(
          pur, tou, Seq("user_id"), "p_ts", "t_ts", "t_id",
          strict = true)
        .groupBy(coalesce(
            when(col("t_ts") >= col("p_ts") - expr("INTERVAL 7 DAYS"),
              col("touch_raw")),
            lit("unattributed")).as("touch"))
        .agg(count(lit(1)).as("n_purchases"),
          fround(sum("p_val"), 2).as("revenue"))
        .orderBy("touch")
    }),

    // FIRST-touch attribution (r10): the mirror report — every purchase
    // attributes to the user's EARLIEST click/view inside the 7-day
    // lookback. Same zero-pair discipline, mirrored: the FORWARD carry
    // anchored at the lookback's lower bound (p_ts − 7 days, inclusive
    // — forward-carry is >=) yields the earliest touch at/after it, and
    // "strictly before the purchase" becomes the post-carry filter —
    // sound because the earliest at/after-lb touch is in [lb, p_ts)
    // iff ANY in-window touch exists (it is the min of them). Ties on
    // t_ts break to MIN t_id (the forward-carry contract), matching
    // the oracle's ASC rank-1. One shuffle + one sort per user, no
    // join — the q_attribution plan shape exactly.
    "q_attribution_first" -> ((s, dir) => {
      val e = T(s, dir, "events")
      val pur = e.filter(col("event_type") === "purchase")
        .select(col("event_id").as("p_id"), col("user_id"),
          col("ts").as("p_ts"), col("value").as("p_val"))
        .withColumn("lb_ts", col("p_ts") - expr("INTERVAL 7 DAYS"))
      val tou = e.filter(col("event_type").isin("click", "view"))
        .select(col("event_id").as("t_id"), col("user_id"),
          col("ts").as("t_ts"), col("event_type").as("touch_raw"))
      graft.operators.TemporalJoins.asofJoinForwardCarry(
          pur, tou, Seq("user_id"), "lb_ts", "t_ts", "t_id")
        .groupBy(coalesce(
            when(col("t_ts") < col("p_ts"), col("touch_raw")),
            lit("unattributed")).as("touch"))
        .agg(count(lit(1)).as("n_purchases"),
          fround(sum("p_val"), 2).as("revenue"))
        .orderBy("touch")
    }),

    // Funnel time-to-convert (r10): for users completing the 3-stage
    // signup → click → purchase funnel (the q_funnel discipline —
    // stage k's ts = first stage-k event strictly after stage k-1's),
    // the distribution of total conversion time in integer
    // MICROSECONDS: count, median, p90, mean. Exact-integer inputs
    // into the shared percentile/round discipline (interpolated
    // percentile of ints, 4-dp round at the end), so it hash-compares
    // across engines. Plan: three min-aggs chained by user-equi joins
    // (each at user cardinality) + one global agg — no windows.
    // 100 TB NOTE (r11, verdict #3): the final exact `percentile`
    // aggregates EVERY converted user's ttc into ONE unpartitioned
    // buffer — at 10⁹ users that driver-side array is the bottleneck.
    // The scale path is the approx_percentile swap with a declared
    // rank-error bound, already spec-pinned for this discipline
    // (StatsSpec "approx_percentile stays within the declared rank
    // error"; same trade q_profile documents for its countDistincts).
    // The exact form stays because exactness is what the oracle
    // hash-checks at fixture.
    "q_funnel_ttc" -> ((s, dir) => {
      val e = T(s, dir, "events")
      val su = e.filter(col("event_type") === "signup")
        .groupBy("user_id").agg(min("ts").as("t1"))
      val cl = e.filter(col("event_type") === "click")
        .join(su, "user_id").filter(col("ts") > col("t1"))
        .groupBy("user_id").agg(min("ts").as("t2"), min("t1").as("t1b"))
      val pu = e.filter(col("event_type") === "purchase")
        .join(cl, "user_id").filter(col("ts") > col("t2"))
        .groupBy("user_id")
        .agg((unix_micros(min("ts")) - unix_micros(min("t1b")))
          .as("ttc_us"))
      pu.agg(count(lit(1)).as("n_converted"),
          fround(expr("percentile(ttc_us, 0.5)"), 4).as("p50_us"),
          fround(expr("percentile(ttc_us, 0.9)"), 4).as("p90_us"),
          fround(avg("ttc_us"), 4).as("mean_us"))
    }),

    // Lag-k autocorrelation of the daily event-count series (r10):
    // the seasonality probe every traffic dashboard runs ("does
    // yesterday/last-week predict today"). ACF(k) = Pearson r over the
    // (c_d, c_{d+k}) pairs for k ∈ {1, 7}. The five sufficient
    // statistics (n, Σx, Σy, Σxy, Σx², Σy²) are exact integers below
    // 2^53, so the one double expression at the end is bit-identical
    // across engines (4 dp). Plan: one day-level agg (map-combined),
    // a 2-row broadcast lag frame, and one equi join on the shifted
    // day — the pair frame is calendar-bounded (days × 2), so every
    // join is at day cardinality no matter how many events feed it.
    // STREAMING (r11, verdict #4): no per-event twin — ACF's pair
    // (c_d, c_{d+k}) is only final once BOTH days close, and a late
    // event into day d perturbs every sufficient statistic the pair
    // feeds; the streaming form is periodic recompute over the
    // maintained daily counts (day cardinality — trivially cheap),
    // not an O(1) state machine. The daily counts themselves stream
    // exactly (tumbling 1-day count, the q_window_tumbling twin).
    "q_autocorr" -> ((s, dir) => {
      val d = T(s, dir, "events")
        .groupBy(to_date(col("ts")).as("day")).agg(count(lit(1)).as("c"))
      val lags = s.range(1, 2).select(lit(1).as("lag"))
        .unionByName(s.range(1, 2).select(lit(7).as("lag")))
      val a = d.select(col("day").as("a_day"), col("c").as("x"))
      val b = d.select(col("day").as("b_day"), col("c").as("y"))
      a.crossJoin(broadcast(lags))
        .join(b, col("b_day") === date_add(col("a_day"), col("lag")))
        .groupBy("lag")
        .agg(count(lit(1)).as("n_pairs"),
          sum("x").as("sx"), sum("y").as("sy"),
          sum(col("x") * col("y")).as("sxy"),
          sum(col("x") * col("x")).as("sxx"),
          sum(col("y") * col("y")).as("syy"))
        .select(col("lag"), col("n_pairs"),
          // sqrt per factor (NOT sqrt of the product): each variance
          // term stays an exact integer < 2^53, while their product
          // would overflow long — and the factored form is the same
          // IEEE expression the oracle runs, so the doubles match.
          fround((col("n_pairs") * col("sxy") - col("sx") * col("sy")) /
            (sqrt((col("n_pairs") * col("sxx") - col("sx") * col("sx"))
              .cast("double")) *
             sqrt((col("n_pairs") * col("syy") - col("sy") * col("sy"))
              .cast("double"))), 4).as("acf"))
        .orderBy("lag")
    }),

    // Gini concentration of activity across users (r10): the
    // inequality readout every usage dashboard ships ("what share of
    // events do the top users generate"). G = 2·Σ(rank·cnt)/(n·Σcnt)
    // − (n+1)/n with rank = 1-based position in the STRICT
    // (cnt, user_id) ascending order — all terms exact integers below
    // 2^53, one double expression at the end (4 dp). The rank comes
    // from operators.Ranking.withGlobalRank — range exchange + map-side
    // rank, ZERO windows (the q_rfm discipline), so the plan survives
    // any user count; the final fold is one map-combined aggregate.
    // STREAMING (r11, verdict #4): no incremental twin — the Gini rank
    // term is a function of every user's GLOBAL rank, and one new
    // event can re-rank an unbounded number of users (rank·cnt changes
    // for all users the bumped count passes), so there is no O(1)
    // per-key update; the streaming form is periodic recompute over
    // the maintained per-user counts (the classic dashboard cadence),
    // which is exactly this batch plan.
    "q_gini" -> ((s, dir) => {
      val cnts = T(s, dir, "events")
        .groupBy("user_id").agg(count(lit(1)).as("cnt"))
      graft.operators.Ranking
        .withGlobalRank(cnts, "rk", asc("cnt"), asc("user_id"))
        .agg(count(lit(1)).as("n_users"), sum("cnt").as("n_events"),
          sum(col("rk") * col("cnt")).as("sic"))
        .select(col("n_users"), col("n_events"),
          fround(lit(2.0) * col("sic") /
              (col("n_users") * col("n_events")) -
              (col("n_users") + lit(1L)).cast("double") /
              col("n_users"), 4).as("gini"))
    }),

    // Cumulative adoption curve (r10): per day, first-time users and
    // the running distinct-user total — "users ever seen by day d",
    // the growth chart every product dashboard leads with. Windowed
    // COUNT(DISTINCT) is unsupported/expensive in any engine; the
    // standard rewrite counts each user once at their FIRST day and
    // prefix-sums. The prefix sum here is a broadcast triangular join
    // over the DAY spine — calendar-bounded (≤366 rows/year, a true
    // constant at any data scale), so no unpartitioned window and no
    // full-data second pass; the per-user first-day agg is the only
    // data-scale shuffle.
    "q_cum_adoption" -> ((s, dir) => {
      val firsts = T(s, dir, "events")
        .groupBy("user_id").agg(min(to_date(col("ts"))).as("d"))
        .groupBy("d").agg(count(lit(1)).as("new_users"))
      val spine = firsts.select(col("d").as("d2"),
        col("new_users").as("nu2"))
      firsts.join(broadcast(spine), col("d2") <= col("d"))
        .groupBy("d", "new_users")
        .agg(sum("nu2").as("cum_users"))
        .select("d", "new_users", "cum_users")
        .orderBy("d")
    }),

    // Market-basket lift (r9): per (user, day) basket of DISTINCT event
    // types, pair co-occurrence vs independence — lift =
    // n_ab·n_baskets / (n_a·n_b), all exact integers (< 2^53), only
    // the final ratio rounds. Pair join is basket-equi with a.type <
    // b.type (≤ C(5,2) pairs per basket — bounded by the type
    // vocabulary, never quadratic in rows); the marginals and the
    // basket total broadcast (5 + 1 rows).
    "q_basket_lift" -> ((s, dir) => {
      // r14 (optimization round, guide §5): `items` feeds FOUR branches
      // (basket total, marginals, both self-join sides) — uncached, the
      // events distinct ran four times per execution
      val items = graft.Caching.cache(T(s, dir, "events")
        .withColumn("day", to_date(col("ts")))
        .select("user_id", "day", "event_type").distinct())
      val nb = items.select("user_id", "day").distinct()
        .agg(count(lit(1)).as("n_baskets"))
      val marg = items.groupBy(col("event_type").as("t"))
        .agg(count(lit(1)).as("n_t"))
      val a = items.select(col("user_id"), col("day"),
        col("event_type").as("ta"))
      val b = items.select(col("user_id").as("u2"), col("day").as("d2"),
        col("event_type").as("tb"))
      a.join(b, col("user_id") === col("u2") && col("day") === col("d2")
          && col("ta") < col("tb"))
        .groupBy("ta", "tb").agg(count(lit(1)).as("n_ab"))
        .join(broadcast(marg.withColumnRenamed("t", "ta")
          .withColumnRenamed("n_t", "n_a")), "ta")
        .join(broadcast(marg.withColumnRenamed("t", "tb")
          .withColumnRenamed("n_t", "n_b")), "tb")
        .crossJoin(broadcast(nb))
        .select(col("ta"), col("tb"), col("n_ab"),
          fround(col("n_ab") * col("n_baskets") /
            (col("n_a") * col("n_b")), 4).as("lift"))
        .orderBy("ta", "tb")
    }),

    // Weekly churn panel (r9): per week, active users vs retained into
    // the NEXT week vs churned — the top-line retention readout.
    // Integer-exact week buckets (floor(day-diff / 7), matching DuckDB `//`), one distinct
    // (user, week) frame feeding an equi self-join (retained) whose
    // complement is churn; the rate is an exact integer ratio rounded
    // at the end. The final week churns everyone by construction
    // (no week+1 data) — deterministic in both engines.
    "q_churn" -> ((s, dir) => {
      // r14: three consumers (next-week probe, retained semi-join side,
      // active agg) — cache the one distinct pass (guide §5)
      val wk = graft.Caching.cache(T(s, dir, "events")
        .withColumn("week",
          expr("floor(datediff(CAST(ts AS DATE), date '2024-01-01') / 7)")
            .cast("long"))
        .select("user_id", "week").distinct())
      val nxt = wk.select(col("user_id").as("u2"),
        (col("week") - 1).as("wk0"))
      val ret = wk.join(nxt,
          col("user_id") === col("u2") && col("week") === col("wk0"),
          "left_semi")
        .groupBy("week").agg(count(lit(1)).as("retained"))
      wk.groupBy("week").agg(count(lit(1)).as("active"))
        .join(ret, Seq("week"), "left")
        .withColumn("retained", coalesce(col("retained"), lit(0L)))
        .withColumn("churned", col("active") - col("retained"))
        .withColumn("churn_rate",
          fround(col("churned") / col("active"), 4))
        .select("week", "active", "retained", "churned", "churn_rate")
        .orderBy("week")
    }),

    // SCD type-2 intervals (r9): treat each user's event stream as a
    // change log — every event's value is valid from its ts until the
    // user's NEXT event (NULL valid_to + is_current on the latest).
    // The warehouse dimension-history build: one partitioned lead()
    // pass, no self-join. Integer event ids break ts ties so the
    // interval chain is a strict total order in both engines.
    "q_scd2" -> ((s, dir) => {
      val w = Window.partitionBy("user_id")
        .orderBy(asc("ts"), asc("event_id"))
      T(s, dir, "events")
        .withColumn("valid_to", lead("ts", 1).over(w))
        .withColumn("is_current", col("valid_to").isNull)
        .select(col("user_id"), col("event_id"),
          col("ts").as("valid_from"), col("valid_to"),
          col("event_type"), col("value"), col("is_current"))
        .orderBy("user_id", "valid_from", "event_id")
    }),

    // CDC changelog apply (r11): compact an ordered changelog to final
    // table state — the upsert/delete merge every lakehouse table
    // format (Delta/Hudi/Iceberg CDC, Kafka log compaction) performs.
    // The event stream is read as a changelog keyed on user_id:
    // 'signup' inserts, 'error' deletes, everything else upserts; the
    // LATEST entry per key — ordered by (ts, event_id), event_id
    // breaking ts ties — decides existence and carries the payload.
    // Plan: ONE hash aggregation (max_by on the (ts, event_id) struct
    // + count + min — all partial+final, map-side combined), no window,
    // no join. 100 TB: log compaction's exact shape — per-key state is
    // one row regardless of log depth, and the combine happens in the
    // map stage so the shuffle carries keys, not log entries.
    "q_cdc_apply" -> ((s, dir) => {
      val log = T(s, dir, "events").withColumn("op",
        when(col("event_type") === "signup", lit("I"))
          .when(col("event_type") === "error", lit("D"))
          .otherwise(lit("U")))
      log.groupBy("user_id")
        .agg(
          max_by(struct(col("op"), col("event_type"), col("value"),
            col("ts")), struct(col("ts"), col("event_id"))).as("last"),
          count(lit(1)).as("n_versions"),
          min("ts").as("first_ts"))
        .where(col("last.op") =!= "D")
        .select(col("user_id"), col("last.event_type").as("last_type"),
          col("last.value").as("last_value"),
          col("last.ts").as("last_ts"), col("n_versions"),
          col("first_ts"))
        .orderBy("user_id")
    }),

    // Per-event sessionization (r9): assign every event its session
    // ORDINAL (1-based per user) under a 30-minute inactivity gap —
    // the event-grain twin of q_window_session's session-grain agg.
    // Gaps-and-islands: a session starts where the gap from the
    // previous event exceeds the threshold; the running sum of starts
    // IS the session id. Two window passes over one partitioning, no
    // join — and the session id is deterministic (integer arithmetic
    // on exact micros).
    "q_sessionize" -> ((s, dir) => {
      val w = Window.partitionBy("user_id")
        .orderBy(asc("ts"), asc("event_id"))
      val wRun = w.rowsBetween(Window.unboundedPreceding,
        Window.currentRow)
      T(s, dir, "events")
        .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(w))
        .withColumn("is_start",
          (col("prev_us").isNull ||
            unix_micros(col("ts")) - col("prev_us") >
              lit(30L * 60 * 1000000)).cast("long"))
        .withColumn("session_id", sum("is_start").over(wRun))
        .select("user_id", "event_id", "ts", "session_id")
        .orderBy("user_id", "ts", "event_id")
    }),

    // Seasonality matrix (r9): per-type activity index over the
    // 7×24-slot week — cell count vs the uniform share (idx > 1 = the
    // slot runs hot). Integer-exact bucketing (day-diff-mod-7 from a
    // fixed Monday epoch + hour extraction — no engine week rules), the
    // only float is the final indexed ratio, rounded 4 dp. One
    // map-combined agg + a 5-row broadcast total join: the shape every
    // traffic-shaping / crawl-scheduling readout uses at any scale.
    "q_seasonality" -> ((s, dir) => {
      val cell = T(s, dir, "events")
        .withColumn("dow",
          expr("pmod(datediff(CAST(ts AS DATE), date '2024-01-01'), 7)")
            .cast("long"))
        .withColumn("hr", hour(col("ts")).cast("long"))
        .groupBy("event_type", "dow", "hr")
        .agg(count(lit(1)).as("cnt"))
      val tot = cell.groupBy("event_type")
        .agg(sum("cnt").as("type_total"))
      cell.join(broadcast(tot), "event_type")
        .withColumn("idx",
          fround(col("cnt") * lit(168.0) / col("type_total"), 4))
        .select("event_type", "dow", "hr", "cnt", "idx")
        .orderBy("event_type", "dow", "hr")
    }),

    // Population Stability Index (r12): the drift metric risk/ML teams
    // gate deployments on — PSI = Σ_b (p_b − q_b)·ln(p_b/q_b) over 10
    // fixed-width value buckets, first half of the month vs second,
    // per event type (<0.1 stable, >0.25 drifted). Complements
    // q_kl_drift (token distributions) and q_centroid_drift
    // (embeddings) with the numeric-feature panel. Add-1 smoothing on
    // the FULL 10-bucket spine (the DSIR discipline) keeps empty
    // buckets finite and both engines' ln arguments are exact-integer
    // ratios — deterministic doubles, 4-dp round at the end. One
    // map-combined count agg touches the corpus; the spine join and
    // PSI fold run on types×10 rows.
    // STREAMING stance (r13, verdict #7): the (type, bucket, side)
    // counts are a keyed count agg — incrementally maintainable as a
    // plain streaming aggregation (integer adds commute; late data
    // folds in exactly); the smoothed p/q + PSI fold re-derives per
    // trigger from the types×10 bucket frame — constant-size, the
    // q_seasonal_anom readout stance. The stance is EXECUTED since r14
    // (verdict #5): TimeSeriesOps.psiMarks maintains the cells as
    // per-type state and re-derives the panel row per trigger —
    // replay ≡ this key (StreamingTwinSpec) and checkpoint recovery
    // across the side boundary pinned (RecoverySpec).
    "q_psi" -> ((s, dir) => {
      val e = T(s, dir, "events")
      val cnt = e.groupBy(col("event_type"),
          least(lit(9L), floor(col("value") / 33.0).cast("long")).as("b"))
        .agg(sum((col("ts") < lit("2024-01-16 00:00:00")).cast("long"))
          .as("c0"),
          sum((col("ts") >= lit("2024-01-16 00:00:00")).cast("long"))
          .as("c1"))
      val spine = e.select("event_type").distinct()
        .crossJoin(s.range(0, 10).select(col("id").as("b")))
      val cells = spine.join(cnt, Seq("event_type", "b"), "left")
        .select(col("event_type"), col("b"),
          coalesce(col("c0"), lit(0L)).as("c0"),
          coalesce(col("c1"), lit(0L)).as("c1"))
      val tot = cells.groupBy("event_type")
        .agg(sum("c0").as("t0"), sum("c1").as("t1"))
      cells.join(broadcast(tot), "event_type")
        .select(col("event_type"), col("c0"), col("c1"),
          ((col("c0") + 1).cast("double") / (col("t0") + 10)).as("p"),
          ((col("c1") + 1).cast("double") / (col("t1") + 10)).as("q"))
        .groupBy("event_type")
        .agg(sum("c0").as("n_first"), sum("c1").as("n_second"),
          fround(sum((col("p") - col("q")) * log(col("p") / col("q"))),
            4).as("psi"))
        .orderBy("event_type")
    }),

    // Conditional sequence entropy (r12): H(next | current = e1) over
    // the q_markov_trans transition counts — how predictable the next
    // event is from the current one, the readout that says whether a
    // sequence model has anything to learn (0 = deterministic chains,
    // ln|types| = uniform noise). Uses the q_entropy_filter identity
    // H = ln(n) − Σ c·ln(c)/n so every ln argument is an exact integer
    // (cross-engine bit-identical inputs), rounded 4 dp. One lead pass
    // (user-partitioned window) + two map-combined aggs; the output is
    // |types| rows.
    "q_seq_entropy" -> ((s, dir) => {
      val w = Window.partitionBy("user_id")
        .orderBy(asc("ts"), asc("event_id"))
      T(s, dir, "events")
        .withColumn("e2", lead("event_type", 1).over(w))
        .filter(col("e2").isNotNull)
        .groupBy(col("event_type").as("e1"), col("e2"))
        .agg(count(lit(1)).as("c"))
        .groupBy("e1")
        .agg(sum("c").as("n"),
          count(lit(1)).as("n_next"),
          sum(col("c").cast("double") * log(col("c").cast("double")))
            .as("slog"))
        .select(col("e1"), col("n"), col("n_next"),
          fround(log(col("n").cast("double")) - col("slog") / col("n"), 4)
            .as("h_cond"))
        .orderBy("e1")
    }),

    "q_markov_trans" -> ((s, dir) => {
      val w = Window.partitionBy("user_id")
        .orderBy(asc("ts"), asc("event_id"))
      val wsum = Window.partitionBy("e1")
      T(s, dir, "events")
        .withColumn("e2", lead("event_type", 1).over(w))
        .filter(col("e2").isNotNull)
        .groupBy(col("event_type").as("e1"), col("e2"))
        .agg(count(lit(1)).as("cnt"))
        .withColumn("prob",
          col("cnt").cast("double") / sum("cnt").over(wsum))
        .select("e1", "e2", "cnt", "prob")
        .orderBy("e1", "e2")
    }),

    // Path trigrams (r11): the top 3-step event paths a user walks with
    // no step gap over 30 minutes — q_markov_trans lifted one order (the
    // clickstream "common journeys" readout funnels are built from).
    // Two leads in ONE user-partitioned window pass (both gaps tested
    // in exact integer micros); the count is a plain hash agg and the
    // top-20 cut is TakeOrdered on the total (cnt DESC, t1, t2, t3)
    // order. Scale: one hash exchange on user_id (the window), one on
    // the trigram — no state beyond 2 lookahead rows per user.
    "q_path_trigrams" -> ((s, dir) => {
      val w = Window.partitionBy("user_id")
        .orderBy(asc("ts"), asc("event_id"))
      val gapUs = 30L * 60 * 1000000
      T(s, dir, "events")
        // one SELECT carrying all four leads: separate withColumn calls
        // leave Projects between the Window nodes and CollapseWindow
        // can't fuse them — one projection = one WindowExec pass
        .select(col("user_id"), col("ts"), col("event_id"),
          col("event_type"),
          lead("event_type", 1).over(w).as("t2"),
          lead(unix_micros(col("ts")), 1).over(w).as("us2"),
          lead("event_type", 2).over(w).as("t3"),
          lead(unix_micros(col("ts")), 2).over(w).as("us3"))
        .filter(col("t3").isNotNull &&
          col("us2") - unix_micros(col("ts")) <= gapUs &&
          col("us3") - col("us2") <= gapUs)
        .groupBy(col("event_type").as("t1"), col("t2"), col("t3"))
        .agg(count(lit(1)).as("cnt"))
        .orderBy(desc("cnt"), asc("t1"), asc("t2"), asc("t3"))
        .limit(20)
    }),

    // Two-sided CUSUM change-point detection (r12; Page 1954, the
    // classic SPC drift detector): per user, s⁺_t = max(0, s⁺_{t-1} +
    // (x_t − μ − k)) catches upward level shifts, s⁻_t symmetric for
    // drops, slack k = 25 (≈ 0.5σ of the value scale) around the
    // user's own mean, alarm when either side crosses h = 250 (≈ 5σ).
    // The recursion LOOKS inherently
    // sequential but folds into windows through the prefix-sum
    // identity s_t = P_t − min(0, min_{i≤t} P_i) (P = running sum of
    // the drift terms): two WindowExec passes over ONE user_id
    // exchange (running sum, then running min of it), no iteration,
    // no state beyond the frame. Every accumulated quantity is an
    // exact BIGINT in 1e-4 units — the drift term rounds ONCE at 4 dp
    // and scales to integer, so the cumulative sums are
    // order-independent and cross-engine exact; the only doubles that
    // cross the boundary are final long/1e4 divisions (bit-identical
    // from identical longs). 100 TB: every exchange hashes on user_id
    // (the mean agg, the mean join — broadcast at fixture stats,
    // shuffled-hash at scale — and ONE window exchange: the two
    // WindowExec passes collapse onto a single sort, PlanShapeSpec-
    // pinned); O(1) per-row work. The streaming twin
    // (TimeSeriesOps.cusumMarks) carries (P, min P) per user —
    // constant state.
    "q_cusum" -> ((s, dir) => {
      val e = T(s, dir, "events")
        .select("user_id", "ts", "event_id", "value")
      val mu = e.groupBy("user_id")
        .agg(fround(avg("value"), 4).as("mu"))
      val w = Window.partitionBy("user_id")
        .orderBy(asc("ts"), asc("event_id"))
      val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      e.join(mu, "user_id")
        // one SELECT per window layer (the q_path_trigrams discipline:
        // CollapseWindow fuses same-spec windows only when no Project
        // intervenes)
        .select(col("user_id"), col("ts"), col("event_id"),
          floor((col("value") - col("mu") - lit(25.0)) * 1e4 + lit(0.5))
            .cast("long").as("d_hi"),
          floor((col("mu") - lit(25.0) - col("value")) * 1e4 + lit(0.5))
            .cast("long").as("d_lo"))
        .select(col("user_id"), col("ts"), col("event_id"),
          sum("d_hi").over(run).as("p_hi"),
          sum("d_lo").over(run).as("p_lo"))
        .select(col("user_id"), col("event_id"),
          (col("p_hi") - least(lit(0L), min("p_hi").over(run))).as("s_hi"),
          (col("p_lo") - least(lit(0L), min("p_lo").over(run))).as("s_lo"))
        .select(col("user_id"), col("event_id"),
          (col("s_hi").cast("double") / 1e4).as("cusum_hi"),
          (col("s_lo").cast("double") / 1e4).as("cusum_lo"),
          (col("s_hi") > lit(2500000L) || col("s_lo") > lit(2500000L))
            .as("is_alarm"))
        .orderBy("user_id", "event_id")
    }),

    // Kaplan–Meier time-to-convert survival (r12; Kaplan & Meier
    // 1958): S(t) = Π_{event times t' ≤ t} (1 − d_t'/n_t') over days
    // from a user's first signup to their first subsequent purchase —
    // users who never convert inside the corpus are right-CENSORED at
    // the horizon (they leave the risk set after their observed
    // follow-up but never count as an event) — the product-limit
    // estimator behind every "X% converted by day t" curve, the
    // censoring-correct version of q_funnel_ttc's observed-gap stats.
    // Plan: one corpus pass per arm (signup min, purchase-after min,
    // both user-keyed aggs sharing the shuffle), then a duration
    // histogram whose row count is SPAN-bounded (≤ corpus days, ~31
    // rows), so the risk-set suffix sum and the survival prefix
    // product both run as broadcast triangle joins on that tiny frame
    // (the q_cum_adoption pattern — NO window, so nothing
    // single-task; the prefix product is exp(Σ ln) over ≤31 terms,
    // rounded 4 dp). A terminal event time (d = n: the whole
    // remaining risk set converts) is handled EXPLICITLY — Spark's
    // ln(0) is NULL while DuckDB's throws, so both sides carry a
    // terminal flag and pin survival to exactly 0.0 from that t on.
    // Streaming stance: both per-user firsts stream as keyed min
    // aggs; the curve is a per-trigger recompute over the
    // span-bounded histogram (censoring is horizon-relative, so rows
    // near the moving end flip — batch is authoritative, the CDC
    // stance).
    "q_survival" -> ((s, dir) => {
      val e = T(s, dir, "events")
      val su = graft.Caching.cache(
        e.filter(col("event_type") === "signup")
          .groupBy("user_id").agg(min("ts").as("sts")))
      val pu = e.filter(col("event_type") === "purchase")
        .join(su, "user_id").filter(col("ts") >= col("sts"))
        .groupBy("user_id").agg(min("ts").as("pts"))
      val end = e.agg(max(col("ts").cast("date")).as("endd"))
      val lt = su.join(pu, Seq("user_id"), "left")
        .crossJoin(broadcast(end))
        .select(
          when(col("pts").isNotNull,
            expr("datediff(CAST(pts AS DATE), CAST(sts AS DATE))"))
            .otherwise(expr("datediff(endd, CAST(sts AS DATE))"))
            .cast("long").as("t"),
          col("pts").isNotNull.cast("long").as("dead"))
      val hist = graft.Caching.cache(
        lt.groupBy("t").agg(count(lit(1)).as("n_users"),
          sum("dead").as("n_deaths")))
      val risk = hist.as("a")
        .join(broadcast(hist.as("b")), col("b.t") >= col("a.t"))
        .groupBy(col("a.t").as("t"))
        .agg(sum(col("b.n_users")).as("n_at_risk"))
      val h2 = graft.Caching.cache(
        hist.join(broadcast(risk), "t")
          .select(col("t"), col("n_at_risk"), col("n_deaths")))
      val dh = h2.filter(col("n_deaths") > 0)
        .select(col("t").as("bt"),
          when(col("n_deaths") === col("n_at_risk"),
            lit(null).cast("double"))
            .otherwise(log(lit(1.0) - col("n_deaths").cast("double")
              / col("n_at_risk"))).as("lnr"),
          (col("n_deaths") === col("n_at_risk")).cast("long").as("term"))
      h2.filter(col("n_deaths") > 0).as("a")
        .join(broadcast(dh), col("bt") <= col("t"))
        .groupBy(col("t"), col("n_at_risk"), col("n_deaths"))
        .agg(max("term").as("term"), sum("lnr").as("slnr"))
        .select(col("t"), col("n_at_risk"), col("n_deaths"),
          when(col("term") === 1L, lit(0.0))
            .otherwise(fround(exp(col("slnr")), 4)).as("survival"))
        .orderBy("t")
    }),

    // Seasonally-adjusted volume anomaly (r12): the alerting readout on
    // top of q_seasonality's profile. Hourly event counts per (type,
    // date, hour) — over a FULL spine (distinct dates × types × 24), so
    // a drop to ZERO volume is visible, not just observed cells —
    // compare against the slot expectation for that (dow, hour):
    // expected = slot total / number of dates carrying that dow,
    // derived from the data's own date spine (the only calendar
    // constant is q_seasonality's fixed Monday epoch). A cell fires
    // when the indexed ratio, rounded BEFORE the cut, is ≥ 2 (spike)
    // or ≤ 0.5 (drop); slots with expectation < 2/hour are skipped
    // (noise guard). Counts are exact integers end-to-end; the one
    // float is cnt·n_dates/slot_total — exact-int numerator, one
    // deterministic division, 4-dp round. 100 TB: the corpus is
    // touched ONCE by the (type,date,hr) count agg; everything after
    // is calendar-bounded (types × dates × 24 rows) and broadcast.
    // Streaming stance: the (type, date, hour) counts stream as a keyed
    // count agg; the profile/ratio readout is a per-trigger recompute
    // over the calendar-bounded cells (the q_pagerank stance — the
    // expectation is a global property of the profile).
    "q_seasonal_anom" -> ((s, dir) => {
      val e = T(s, dir, "events")
      val actual = e.groupBy(col("event_type"),
          col("ts").cast("date").as("d"),
          hour(col("ts")).cast("long").as("hr"))
        .agg(count(lit(1)).as("cnt"))
      val dates = e.select(col("ts").cast("date").as("d")).distinct()
        .withColumn("dow",
          expr("pmod(datediff(d, date '2024-01-01'), 7)").cast("long"))
      val types = e.select("event_type").distinct()
      val spine = types.crossJoin(dates)
        .crossJoin(s.range(0, 24).select(col("id").as("hr")))
      val cells = spine.join(actual, Seq("event_type", "d", "hr"), "left")
        .withColumn("cnt", coalesce(col("cnt"), lit(0L)))
      val nd = dates.groupBy("dow").agg(count(lit(1)).as("n_dates"))
      val slot = cells.groupBy("event_type", "dow", "hr")
        .agg(sum("cnt").as("slot_total"))
      cells.join(broadcast(slot), Seq("event_type", "dow", "hr"))
        .join(broadcast(nd), "dow")
        .filter(col("slot_total") >= lit(2L) * col("n_dates"))
        .withColumn("ratio",
          fround(col("cnt").cast("double") * col("n_dates")
            / col("slot_total"), 4))
        .filter(col("ratio") >= 2.0 || col("ratio") <= 0.5)
        .select("event_type", "d", "hr", "cnt", "ratio")
        .orderBy("event_type", "d", "hr")
    }),

    // Burstiness / Fano factor per event type (r13; Fano 1947,
    // public): var/mean of HOURLY counts over the full dates×24 spine
    // (zero hours count — burstiness is precisely about the empty
    // cells). Fano ≈ 1 is Poisson traffic; >> 1 is bursty (campaign
    // spikes, bot storms), << 1 is paced/throttled — the dispersion
    // diagnostic capacity planning and anomaly thresholds read before
    // trusting a rate model. The identity (n·Σx² − (Σx)²)/(n·Σx)
    // keeps numerator AND denominator exact integers (never var_pop —
    // engines' central-moment recursions differ), one division,
    // fround 4. One corpus-sized count agg; the spine join and the
    // fold run on |types|·|dates|·24 rows.
    // STREAMING stance: the hourly cell counts are a keyed count agg
    // (incrementally maintainable); the Fano fold re-derives per
    // trigger from the calendar-bounded cell frame — the q_psi
    // readout stance.
    "q_burstiness" -> ((s, dir) => {
      val e = T(s, dir, "events")
      val cell = e.groupBy(col("event_type"),
          col("ts").cast("date").as("d"),
          hour(col("ts")).cast("long").as("hr"))
        .agg(count(lit(1)).as("cnt"))
      val spine = e.select("event_type").distinct()
        .crossJoin(e.select(col("ts").cast("date").as("d")).distinct())
        .crossJoin(s.range(0, 24).select(col("id").as("hr")))
      spine.join(cell, Seq("event_type", "d", "hr"), "left")
        .select(col("event_type"), coalesce(col("cnt"), lit(0L)).as("c"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_cells"), sum("c").as("n_events"),
          sum(col("c") * col("c")).as("ss"))
        .select(col("event_type"), col("n_cells"), col("n_events"),
          fround((col("n_cells") * col("ss") -
              col("n_events") * col("n_events")).cast("double") /
            (col("n_cells") * col("n_events")), 4).as("fano"))
        .orderBy("event_type")
    }),

    // Theil–Sen robust trend (r13; Theil 1950 / Sen 1968, public):
    // median of all pairwise slopes over the DAILY volume series —
    // the robust "is traffic growing" estimator a single outage day
    // cannot bend (OLS q_growth_wow can). Scale: the corpus-sized
    // work is ONE daily count agg; the pairwise frame is
    // |days|·(|days|−1)/2 rows over the CALENDAR-bounded daily table
    // (a month = 435 pairs, a decade = 6.7M — broadcast-joinable
    // forever), never the event volume. Slopes are exact-integer
    // ratios (IEEE-identical cross-engine); the exact interpolated
    // median rounds at 4 dp.
    // STREAMING stance: the daily counts are a keyed count agg; the
    // pairwise median re-derives per trigger from the calendar-bounded
    // daily frame (one new day perturbs |days|−1 slopes — no
    // incremental median worth its state).
    "q_theilsen" -> ((s, dir) => {
      val daily = T(s, dir, "events")
        .groupBy(col("ts").cast("date").as("d"))
        .agg(count(lit(1)).as("c"))
        .select(datediff(col("d"), lit("2024-01-01").cast("date"))
          .cast("long").as("x"), col("c"))
      daily.as("i").join(broadcast(daily.as("j")),
          col("j.x") > col("i.x"))
        .select(((col("j.c") - col("i.c")).cast("double") /
          (col("j.x") - col("i.x"))).as("slope"))
        .agg(count(lit(1)).as("n_pairs"),
          fround(expr("percentile(slope, 0.5)"), 4).as("slope_med"))
    }),

    // Benford first-digit panel (r14; Benford 1938/Newcomb 1881,
    // public): the leading-significant-digit distribution of the value
    // column against log10(1 + 1/d) — the classic fabricated-data /
    // synthetic-drift screen an ingest pipeline runs before trusting a
    // new source's numeric columns. Determinism: the digit comes from
    // the INTEGER cents string (floor(value·100) — value·100 and its
    // floor are IEEE-identical cross-engine; a log10-based significand
    // extraction would ride libm boundaries at exact powers of ten),
    // expected = ln(1+1/d)/ln(10) on exact small-integer ratios.
    // Plan: map-side digit extraction, one 9-cell agg — the corpus is
    // touched once, the fold is digit-bounded at any scale.
    "q_benford" -> ((s, dir) => {
      val d = T(s, dir, "events")
        .select(floor(col("value") * 100).cast("long").as("cv"))
        .filter(col("cv") >= 1L)
        .select(substring(col("cv").cast("string"), 1, 1).cast("long")
          .as("digit"))
        .groupBy("digit").agg(count(lit(1)).as("n"))
      val tot = d.agg(sum("n").as("nn"))
      d.crossJoin(broadcast(tot))
        .select(col("digit"), col("n"),
          fround(col("n").cast("double") / col("nn"), 4).as("freq"),
          fround(log(lit(1.0) + lit(1.0) / col("digit")) / log(lit(10.0)),
            4).as("benford"))
        .orderBy("digit")
    }),

    // Kendall tau-b (r14; Kendall 1938, public) between daily event
    // volume and daily active users — the rank-concordance trend
    // check that, unlike Pearson/Spearman on values, is exact on the
    // PAIR level: every pair verdict here is an INTEGER sign test
    // (both series are counts), so nc/nd/ties are cross-engine
    // bit-identical and only the final ratio rounds. Complements
    // q_spearman (doc-level ranks) and q_theilsen (slope) on the
    // calendar-bounded daily frame: |days|²/2 pairs via broadcast
    // self-join — a decade is 6.7 M pairs, broadcast-joinable forever
    // (the q_theilsen bound argument verbatim).
    "q_kendall_tau" -> ((s, dir) => {
      val daily = T(s, dir, "events")
        .groupBy(col("ts").cast("date").as("d"))
        .agg(count(lit(1)).as("x"),
          countDistinct(col("user_id")).as("y"))
      val p = daily.as("i").join(broadcast(daily.as("j")),
          col("j.d") > col("i.d"))
        .select((col("j.x") - col("i.x")).as("dx"),
          (col("j.y") - col("i.y")).as("dy"))
      p.agg(count(lit(1)).as("n_pairs"),
          sum(when(col("dx") * col("dy") > 0, 1L).otherwise(0L)).as("nc"),
          sum(when(col("dx") * col("dy") < 0, 1L).otherwise(0L)).as("nd"),
          sum(when(col("dx") === 0, 1L).otherwise(0L)).as("tx"),
          sum(when(col("dy") === 0, 1L).otherwise(0L)).as("ty"))
        .select(col("n_pairs"), col("nc"), col("nd"),
          fround((col("nc") - col("nd")).cast("double") /
            sqrt(((col("n_pairs") - col("tx")) *
              (col("n_pairs") - col("ty"))).cast("double")), 4)
            .as("tau_b"))
    }))

  val oracles: Map[String, String] = Map(
    "q_burstiness" ->
      """WITH cell AS (
           SELECT event_type, CAST(ts AS DATE) AS d, hour(ts) AS hr,
             count(*) AS cnt
           FROM events GROUP BY 1, 2, 3),
         types AS (SELECT DISTINCT event_type FROM events),
         dates AS (SELECT DISTINCT CAST(ts AS DATE) AS d FROM events),
         spine AS (
           SELECT event_type, d, h.hr
           FROM types, dates, (SELECT unnest(range(24)) AS hr) h),
         f AS (
           SELECT s.event_type, coalesce(c.cnt, 0) AS c
           FROM spine s LEFT JOIN cell c USING (event_type, d, hr))
         SELECT event_type, count(*) AS n_cells,
           CAST(sum(c) AS BIGINT) AS n_events,
           floor((count(*) * sum(c * c) - sum(c) * sum(c))
             / CAST(count(*) * sum(c) AS DOUBLE) * 1e4 + 0.5) / 1e4
             AS fano
         FROM f GROUP BY 1 ORDER BY 1""",
    "q_theilsen" ->
      """WITH daily AS (
           SELECT datediff('day', DATE '2024-01-01', CAST(ts AS DATE))
             AS x, count(*) AS c
           FROM events GROUP BY 1),
         p AS (
           SELECT (j.c - i.c) / CAST(j.x - i.x AS DOUBLE) AS slope
           FROM daily i JOIN daily j ON j.x > i.x)
         SELECT count(*) AS n_pairs,
           floor(quantile_cont(slope, 0.5) * 1e4 + 0.5) / 1e4
             AS slope_med
         FROM p""",
    "q_benford" ->
      """WITH cents AS (
           SELECT CAST(floor(value * 100) AS BIGINT) AS cv FROM events
           WHERE floor(value * 100) >= 1),
         d AS (
           SELECT CAST(substr(CAST(cv AS VARCHAR), 1, 1) AS BIGINT)
             AS digit, count(*) AS n
           FROM cents GROUP BY 1),
         tot AS (SELECT sum(n) AS nn FROM d)
         SELECT digit, n,
           floor(CAST(n AS DOUBLE) / nn * 1e4 + 0.5) / 1e4 AS freq,
           floor(ln(1 + 1.0 / digit) / ln(10) * 1e4 + 0.5) / 1e4
             AS benford
         FROM d, tot ORDER BY digit""",
    "q_kendall_tau" ->
      """WITH daily AS (
           SELECT CAST(ts AS DATE) AS d, count(*) AS x,
             count(DISTINCT user_id) AS y
           FROM events GROUP BY 1),
         p AS (
           SELECT (j.x - i.x) AS dx, (j.y - i.y) AS dy
           FROM daily i JOIN daily j ON j.d > i.d)
         SELECT count(*) AS n_pairs,
           CAST(sum(CASE WHEN dx * dy > 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS nc,
           CAST(sum(CASE WHEN dx * dy < 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS nd,
           floor((sum(CASE WHEN dx * dy > 0 THEN 1 ELSE 0 END)
                - sum(CASE WHEN dx * dy < 0 THEN 1 ELSE 0 END))
             / sqrt(CAST(
                 (count(*) - sum(CASE WHEN dx = 0 THEN 1 ELSE 0 END))
               * (count(*) - sum(CASE WHEN dy = 0 THEN 1 ELSE 0 END))
               AS DOUBLE)) * 1e4 + 0.5) / 1e4 AS tau_b
         FROM p""",
    "q_funnel" ->
      """WITH su AS (
           SELECT user_id, min(ts) AS t1 FROM events
           WHERE event_type = 'signup' GROUP BY 1),
         cl AS (
           SELECT e.user_id, min(e.ts) AS t2
           FROM events e JOIN su ON e.user_id = su.user_id
           WHERE e.event_type = 'click' AND e.ts > su.t1 GROUP BY 1),
         pu AS (
           SELECT e.user_id, min(e.ts) AS t3
           FROM events e JOIN cl ON e.user_id = cl.user_id
           WHERE e.event_type = 'purchase' AND e.ts > cl.t2 GROUP BY 1)
         SELECT stage, users FROM (
           SELECT '1_signup' AS stage, count(*) AS users FROM su
           UNION ALL SELECT '2_click', count(*) FROM cl
           UNION ALL SELECT '3_purchase', count(*) FROM pu) t
         ORDER BY stage""",
    "q_cohort" ->
      """WITH ed AS (
           SELECT user_id, CAST(ts AS DATE) AS d FROM events),
         f AS (SELECT user_id, min(d) AS fd FROM ed GROUP BY 1)
         SELECT CAST(date_diff('day', DATE '2024-01-01', fd) // 7 AS BIGINT)
             AS cohort_week,
           CAST(date_diff('day', fd, d) // 7 AS BIGINT) AS week_offset,
           count(DISTINCT ed.user_id) AS users
         FROM ed JOIN f USING (user_id)
         GROUP BY 1, 2 ORDER BY 1, 2""",
    "q_event_path" ->
      """WITH s AS (
           SELECT event_type AS e1,
             lead(event_type, 1) OVER w AS e2,
             lead(event_type, 2) OVER w AS e3
           FROM events
           WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
         SELECT e1 || '>' || e2 || '>' || e3 AS path, count(*) AS cnt
         FROM s WHERE e3 IS NOT NULL
         GROUP BY 1 ORDER BY cnt DESC, path LIMIT 10""",
    "q_sequence_gap" ->
      """WITH g AS (
           SELECT user_id, ts, event_id,
             lead(ts) OVER (PARTITION BY user_id
                            ORDER BY ts, event_id) AS nxt
           FROM events)
         SELECT user_id, ts AS gap_start, nxt AS gap_end,
           (epoch_us(nxt) - epoch_us(ts)) // 60000000 AS gap_min
         FROM g
         WHERE nxt IS NOT NULL
           AND (epoch_us(nxt) - epoch_us(ts)) // 60000000 >= 60
         ORDER BY user_id, gap_start, gap_end""",
    "q_histogram" ->
      """SELECT CAST(floor(o_totalprice / 25000) * 25000 AS BIGINT) AS bin,
           count(*) AS cnt, round(sum(o_totalprice), 2) AS sum_price
         FROM orders GROUP BY 1 ORDER BY 1""",
    "q_resample_ohlc" ->
      """WITH x AS (
           SELECT event_type, epoch_us(ts) // 900000000 AS bucket,
             ts, event_id, value,
             first_value(value) OVER w AS open,
             last_value(value) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING
               AND UNBOUNDED FOLLOWING) AS close
           FROM events
           WINDOW w AS (PARTITION BY event_type,
             epoch_us(ts) // 900000000 ORDER BY ts, event_id))
         SELECT event_type, make_timestamp(bucket * 900000000) AS bucket_ts,
           max(open) AS open, max(value) AS high, min(value) AS low,
           max(close) AS close, count(*) AS cnt,
           floor(sum(value) * 100 + 0.5) / 100 AS volume
         FROM x GROUP BY 1, 2 ORDER BY 1, 2""",
    "q_ewma" ->
      s"""WITH x AS (
           SELECT user_id, ts, event_id,
             ${(0 to 15).map(k => s"lag(value, $k) OVER w AS l$k")
               .mkString(", ")}
           FROM events
           WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
         SELECT user_id, ts, event_id,
           floor((${(0 to 15).map(k =>
             s"coalesce(l$k * ${math.pow(0.75, k)}, 0.0)")
               .mkString(" + ")}) /
           (${(0 to 15).map(k =>
             s"(CASE WHEN l$k IS NOT NULL THEN ${math.pow(0.75, k)} " +
               "ELSE 0.0 END)").mkString(" + ")})
           * 10000 + 0.5) / 10000 AS ewma
         FROM x ORDER BY user_id, ts, event_id""",
    "q_burst_detect" ->
      """WITH m AS (
           SELECT event_type, epoch_us(ts) // 3600000000 AS hr
           FROM events),
         pm AS (SELECT event_type, hr, count(*) AS cnt
                FROM m GROUP BY 1, 2),
         t AS (SELECT event_type, CAST(sum(cnt) AS BIGINT) AS type_total,
                 count(*) AS active_hr
               FROM pm GROUP BY 1)
         SELECT pm.event_type,
           make_timestamp(pm.hr * 3600000000) AS hour_ts, pm.cnt,
           floor(CAST(pm.cnt AS DOUBLE) * t.active_hr / t.type_total
             * 1e4 + 0.5) / 1e4 AS rate_ratio
         FROM pm JOIN t ON pm.event_type = t.event_type
         WHERE pm.cnt * t.active_hr > 3 * t.type_total
         ORDER BY pm.event_type, hour_ts""",
    "q_gap_fill" ->
      """WITH b AS (SELECT date_trunc('hour', min(ts)) AS lo,
                           date_trunc('hour', max(ts)) AS hi FROM events),
         sp AS (SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR))
                  AS h FROM b),
         ty AS (SELECT DISTINCT event_type FROM events),
         hourly AS (
           SELECT date_trunc('hour', ts) AS h, event_type,
             floor(avg(value) * 1e4 + 0.5) / 1e4 AS obs
           FROM events GROUP BY 1, 2),
         j AS (
           SELECT ty.event_type, sp.h, hourly.obs
           FROM sp CROSS JOIN ty
           LEFT JOIN hourly
             ON hourly.h = sp.h AND hourly.event_type = ty.event_type)
         SELECT event_type, h,
           last_value(obs IGNORE NULLS) OVER (PARTITION BY event_type
             ORDER BY h ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS filled,
           obs IS NOT NULL AS is_observed
         FROM j ORDER BY event_type, h""",
    "q_twap" ->
      """WITH x AS (
           SELECT user_id, CAST(ts AS DATE) AS day, ts, value,
             coalesce(lead(ts) OVER (PARTITION BY user_id, CAST(ts AS DATE)
               ORDER BY ts, event_id),
               CAST(CAST(ts AS DATE) + 1 AS TIMESTAMP)) AS seg_end
           FROM events)
         SELECT user_id, day, count(*) AS n_events,
           floor(sum(value * (epoch_us(seg_end) - epoch_us(ts)))
             / sum(epoch_us(seg_end) - epoch_us(ts)) * 1e4 + 0.5) / 1e4
             AS twap
         FROM x GROUP BY 1, 2 ORDER BY 1, 2""",
    "q_ab_lift" ->
      """WITH u AS (
           SELECT user_id,
             max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
               AS converted,
             CASE WHEN strpos('0123456789abcdef',
               substr(md5(CAST(user_id AS VARCHAR)), 1, 1)) % 2 = 1
               THEN 'A' ELSE 'B' END AS arm
           FROM events GROUP BY user_id),
         arms AS (
           SELECT arm, count(*) AS n,
             CAST(sum(converted) AS BIGINT) AS conv
           FROM u GROUP BY arm),
         wide AS (
           SELECT
             max(CASE WHEN arm = 'A' THEN n END) AS n_a,
             max(CASE WHEN arm = 'A' THEN conv END) AS conv_a,
             max(CASE WHEN arm = 'B' THEN n END) AS n_b,
             max(CASE WHEN arm = 'B' THEN conv END) AS conv_b
           FROM arms)
         SELECT n_a, conv_a, n_b, conv_b,
           floor(CAST(conv_a AS DOUBLE) / n_a * 1e4 + 0.5) / 1e4 AS rate_a,
           floor(CAST(conv_b AS DOUBLE) / n_b * 1e4 + 0.5) / 1e4 AS rate_b,
           floor((CAST(conv_a AS DOUBLE) / n_a
                  - CAST(conv_b AS DOUBLE) / n_b) * 1e4 + 0.5) / 1e4
             AS lift,
           CASE WHEN conv_a + conv_b > 0 AND conv_a + conv_b < n_a + n_b
             THEN floor((CAST(conv_a AS DOUBLE) / n_a
                  - CAST(conv_b AS DOUBLE) / n_b)
             / sqrt(CAST(conv_a + conv_b AS DOUBLE) / (n_a + n_b)
                 * (1.0 - CAST(conv_a + conv_b AS DOUBLE) / (n_a + n_b))
                 * (1.0 / n_a + 1.0 / n_b)) * 1e4 + 0.5) / 1e4 END AS z
         FROM wide""",
    "q_rfm" ->
      """WITH base AS (
           SELECT user_id, max(ts) AS last_ts, count(*) AS freq,
             floor(coalesce(sum(CASE WHEN event_type = 'purchase'
               THEN value END), 0.0) * 100 + 0.5) / 100 AS mon
           FROM events GROUP BY 1),
         sc AS (
           SELECT user_id,
             ntile(4) OVER (ORDER BY last_ts DESC, user_id) AS r_score,
             ntile(4) OVER (ORDER BY freq DESC, user_id) AS f_score,
             ntile(4) OVER (ORDER BY mon DESC, user_id) AS m_score
           FROM base)
         SELECT user_id, r_score, f_score, m_score,
           r_score * 100 + f_score * 10 + m_score AS segment
         FROM sc ORDER BY user_id""",
    "q_growth_wow" ->
      """WITH wk AS (
           SELECT event_type,
             CAST(date_diff('day', DATE '2024-01-01', CAST(ts AS DATE))
               // 7 AS BIGINT) AS week,
             count(*) AS cnt
           FROM events GROUP BY 1, 2)
         SELECT event_type, week, cnt,
           lag(cnt) OVER (PARTITION BY event_type ORDER BY week)
             AS prev_cnt,
           CAST(cnt AS DOUBLE) /
             lag(cnt) OVER (PARTITION BY event_type ORDER BY week) AS wow
         FROM wk ORDER BY event_type, week""",
    "q_funnel_gap" ->
      """WITH su AS (
           SELECT user_id, min(ts) AS t1 FROM events
           WHERE event_type = 'signup' GROUP BY 1),
         cl AS (
           SELECT e.user_id, min(e.ts) AS t2
           FROM events e JOIN su ON e.user_id = su.user_id
           WHERE e.event_type = 'click' AND e.ts > su.t1
             AND e.ts <= su.t1 + INTERVAL 24 HOURS GROUP BY 1),
         pu AS (
           SELECT e.user_id, min(e.ts) AS t3
           FROM events e JOIN cl ON e.user_id = cl.user_id
           WHERE e.event_type = 'purchase' AND e.ts > cl.t2
             AND e.ts <= cl.t2 + INTERVAL 24 HOURS GROUP BY 1)
         SELECT stage, users FROM (
           SELECT '1_signup' AS stage, count(*) AS users FROM su
           UNION ALL SELECT '2_click_24h', count(*) FROM cl
           UNION ALL SELECT '3_purchase_24h', count(*) FROM pu) t
         ORDER BY stage""",
    "q_rolling_median" ->
      """SELECT user_id, ts, event_id,
           floor(quantile_cont(value, 0.5) OVER (PARTITION BY user_id
             ORDER BY ts, event_id
             ROWS BETWEEN 14 PRECEDING AND CURRENT ROW) * 1e4 + 0.5) / 1e4
             AS med
         FROM events ORDER BY user_id, ts, event_id""",
    "q_zscore" ->
      """WITH x AS (
           SELECT user_id, ts, event_id, value,
             count(*) OVER w AS n_win,
             avg(value) OVER w AS mu,
             stddev_samp(value) OVER w AS sd
           FROM events
           WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN 15 PRECEDING AND CURRENT ROW)),
         z AS (
           SELECT user_id, ts, event_id,
             floor((value - mu) / sd * 1e3 + 0.5) / 1e3 AS z
           FROM x WHERE n_win >= 8)
         SELECT user_id, ts, event_id, z, abs(z) > 2.0 AS is_anomaly
         FROM z ORDER BY user_id, ts, event_id""",
    "q_interarrival" ->
      """WITH g AS (
           SELECT event_type,
             epoch_us(ts) - lag(epoch_us(ts)) OVER (
               PARTITION BY user_id, event_type
               ORDER BY ts, event_id) AS gap_us
           FROM events)
         SELECT event_type, count(*) AS n_gaps,
           floor(quantile_cont(gap_us, 0.5) * 10000 + 0.5) / 10000
             AS p50_us,
           floor(quantile_cont(gap_us, 0.9) * 10000 + 0.5) / 10000
             AS p90_us
         FROM g WHERE gap_us IS NOT NULL
         GROUP BY 1 ORDER BY 1""",
    "q_forecast_naive" ->
      """WITH wk AS (
           SELECT event_type,
             CAST(date_diff('day', DATE '2024-01-01', CAST(ts AS DATE))
               // 7 AS BIGINT) AS week,
             count(*) AS cnt
           FROM events GROUP BY 1, 2),
         f AS (
           SELECT event_type, cnt,
             lag(cnt) OVER (PARTITION BY event_type ORDER BY week) AS fc
           FROM wk)
         SELECT event_type, count(*) AS n_weeks,
           floor(avg(abs(cnt - fc) / CAST(cnt AS DOUBLE)) * 10000 + 0.5)
             / 10000 AS mape
         FROM f WHERE fc IS NOT NULL
         GROUP BY 1 ORDER BY 1""",
    "q_profile" ->
      """WITH a AS (
           SELECT count(*) AS n_rows,
             sum(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END) AS nn_user,
             count(DISTINCT user_id) AS nd_user,
             min(user_id) AS mn_user, max(user_id) AS mx_user,
             sum(CASE WHEN event_type IS NULL THEN 1 ELSE 0 END)
               AS nn_type,
             count(DISTINCT event_type) AS nd_type,
             min(event_type) AS mn_type, max(event_type) AS mx_type,
             sum(CASE WHEN value IS NULL THEN 1 ELSE 0 END) AS nn_val,
             count(DISTINCT value) AS nd_val,
             floor(min(value) * 10000 + 0.5) / 10000 AS mn_val,
             floor(max(value) * 10000 + 0.5) / 10000 AS mx_val
           FROM events)
         SELECT 'event_type' AS col_name, n_rows,
           CAST(nn_type AS BIGINT) AS n_null, nd_type AS n_distinct,
           CAST(NULL AS DOUBLE) AS min_num, CAST(NULL AS DOUBLE)
             AS max_num, mn_type AS min_str, mx_type AS max_str
         FROM a
         UNION ALL
         SELECT 'user_id', n_rows, CAST(nn_user AS BIGINT), nd_user,
           CAST(mn_user AS DOUBLE), CAST(mx_user AS DOUBLE),
           NULL, NULL FROM a
         UNION ALL
         SELECT 'value', n_rows, CAST(nn_val AS BIGINT), nd_val,
           mn_val, mx_val, NULL, NULL FROM a
         ORDER BY col_name""",
    "q_attribution" ->
      """WITH m AS (
           SELECT p.event_id AS p_id, p.value AS p_val, t.touch,
             row_number() OVER (PARTITION BY p.event_id
                                ORDER BY t.t_ts DESC, t.t_id DESC) AS rn
           FROM (SELECT event_id, user_id, ts, value FROM events
                 WHERE event_type = 'purchase') p
           LEFT JOIN (SELECT event_id AS t_id, user_id AS t_uid,
                        ts AS t_ts, event_type AS touch FROM events
                      WHERE event_type IN ('click', 'view')) t
             ON p.user_id = t.t_uid AND t.t_ts < p.ts
            AND t.t_ts >= p.ts - INTERVAL 7 DAY)
         SELECT coalesce(touch, 'unattributed') AS touch,
           count(*) AS n_purchases,
           floor(sum(p_val) * 100 + 0.5) / 100 AS revenue
         FROM m WHERE rn = 1
         GROUP BY 1 ORDER BY 1""",
    "q_attribution_first" ->
      """WITH m AS (
           SELECT p.event_id AS p_id, p.value AS p_val, t.touch,
             row_number() OVER (PARTITION BY p.event_id
                                ORDER BY t.t_ts ASC, t.t_id ASC) AS rn
           FROM (SELECT event_id, user_id, ts, value FROM events
                 WHERE event_type = 'purchase') p
           LEFT JOIN (SELECT event_id AS t_id, user_id AS t_uid,
                        ts AS t_ts, event_type AS touch FROM events
                      WHERE event_type IN ('click', 'view')) t
             ON p.user_id = t.t_uid AND t.t_ts < p.ts
            AND t.t_ts >= p.ts - INTERVAL 7 DAY)
         SELECT coalesce(touch, 'unattributed') AS touch,
           count(*) AS n_purchases,
           floor(sum(p_val) * 100 + 0.5) / 100 AS revenue
         FROM m WHERE rn = 1
         GROUP BY 1 ORDER BY 1""",
    "q_funnel_ttc" ->
      """WITH su AS (
           SELECT user_id, min(ts) AS t1 FROM events
           WHERE event_type = 'signup' GROUP BY 1),
         cl AS (
           SELECT e.user_id, min(e.ts) AS t2, min(su.t1) AS t1b
           FROM events e JOIN su ON e.user_id = su.user_id
           WHERE e.event_type = 'click' AND e.ts > su.t1 GROUP BY 1),
         pu AS (
           SELECT e.user_id,
             epoch_us(min(e.ts)) - epoch_us(min(cl.t1b)) AS ttc_us
           FROM events e JOIN cl ON e.user_id = cl.user_id
           WHERE e.event_type = 'purchase' AND e.ts > cl.t2 GROUP BY 1)
         SELECT count(*) AS n_converted,
           floor(quantile_cont(ttc_us, 0.5) * 10000 + 0.5) / 10000
             AS p50_us,
           floor(quantile_cont(ttc_us, 0.9) * 10000 + 0.5) / 10000
             AS p90_us,
           floor(avg(ttc_us) * 10000 + 0.5) / 10000 AS mean_us
         FROM pu""",
    "q_autocorr" ->
      """WITH d AS (
           SELECT CAST(ts AS DATE) AS day, count(*) AS c FROM events
           GROUP BY 1),
         l AS (SELECT CAST(1 AS INTEGER) AS lag
               UNION ALL SELECT CAST(7 AS INTEGER)),
         p AS (
           SELECT l.lag, a.c AS x, b.c AS y
           FROM l, d a, d b WHERE b.day = a.day + l.lag)
         SELECT lag, count(*) AS n_pairs,
           floor(CAST(count(*) * sum(x*y) - sum(x) * sum(y) AS DOUBLE)
                 / (sqrt(CAST(count(*) * sum(x*x) - sum(x) * sum(x)
                          AS DOUBLE))
                    * sqrt(CAST(count(*) * sum(y*y) - sum(y) * sum(y)
                          AS DOUBLE)))
                 * 10000 + 0.5) / 10000 AS acf
         FROM p GROUP BY 1 ORDER BY 1""",
    "q_gini" ->
      """WITH c AS (
           SELECT user_id, count(*) AS cnt FROM events GROUP BY 1),
         r AS (
           SELECT cnt, row_number() OVER (ORDER BY cnt, user_id) AS rk
           FROM c)
         SELECT count(*) AS n_users,
           CAST(sum(cnt) AS BIGINT) AS n_events,
           floor((2.0 * CAST(sum(rk * cnt) AS DOUBLE)
                    / (count(*) * CAST(sum(cnt) AS DOUBLE))
                  - CAST(count(*) + 1 AS DOUBLE) / count(*))
                 * 10000 + 0.5) / 10000 AS gini
         FROM r""",
    "q_cum_adoption" ->
      """WITH f AS (
           SELECT user_id, min(CAST(ts AS DATE)) AS d FROM events
           GROUP BY 1),
         daily AS (
           SELECT d, count(*) AS new_users FROM f GROUP BY 1)
         SELECT d, new_users,
           CAST(sum(new_users) OVER (ORDER BY d
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS BIGINT) AS cum_users
         FROM daily ORDER BY d""",
    "q_basket_lift" ->
      """WITH items AS (
           SELECT DISTINCT user_id, CAST(ts AS DATE) AS day, event_type
           FROM events),
         nb AS (SELECT count(*) AS n_baskets FROM
                  (SELECT DISTINCT user_id, day FROM items) t),
         marg AS (SELECT event_type AS t, count(*) AS n_t
                  FROM items GROUP BY 1),
         p AS (
           SELECT a.event_type AS ta, b.event_type AS tb,
             count(*) AS n_ab
           FROM items a JOIN items b
             ON a.user_id = b.user_id AND a.day = b.day
            AND a.event_type < b.event_type
           GROUP BY 1, 2)
         SELECT p.ta, p.tb, p.n_ab,
           floor(CAST(p.n_ab AS DOUBLE) * nb.n_baskets
                 / (ma.n_t * mb.n_t) * 10000 + 0.5) / 10000 AS lift
         FROM p JOIN marg ma ON ma.t = p.ta
         JOIN marg mb ON mb.t = p.tb, nb
         ORDER BY p.ta, p.tb""",
    "q_churn" ->
      """WITH wk AS (
           SELECT DISTINCT user_id,
             CAST(date_diff('day', DATE '2024-01-01', CAST(ts AS DATE))
               // 7 AS BIGINT) AS week
           FROM events),
         act AS (SELECT week, count(*) AS active FROM wk GROUP BY 1),
         ret AS (
           SELECT a.week, count(*) AS retained
           FROM wk a JOIN wk b
             ON a.user_id = b.user_id AND b.week = a.week + 1
           GROUP BY 1)
         SELECT act.week, act.active,
           coalesce(ret.retained, 0) AS retained,
           act.active - coalesce(ret.retained, 0) AS churned,
           floor((act.active - coalesce(ret.retained, 0))
                 / CAST(act.active AS DOUBLE) * 10000 + 0.5) / 10000
             AS churn_rate
         FROM act LEFT JOIN ret ON act.week = ret.week
         ORDER BY act.week""",
    "q_scd2" ->
      """SELECT user_id, event_id, ts AS valid_from,
           lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
             AS valid_to,
           event_type, value,
           lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
             IS NULL AS is_current
         FROM events
         ORDER BY user_id, valid_from, event_id""",
    "q_cdc_apply" ->
      """WITH lg AS (
           SELECT user_id, event_id, ts, value, event_type,
             CASE event_type WHEN 'signup' THEN 'I'
                             WHEN 'error' THEN 'D'
                             ELSE 'U' END AS op
           FROM events),
         r AS (
           SELECT *,
             row_number() OVER (PARTITION BY user_id
               ORDER BY ts DESC, event_id DESC) AS rn,
             count(*) OVER (PARTITION BY user_id) AS n_versions,
             min(ts) OVER (PARTITION BY user_id) AS first_ts
           FROM lg)
         SELECT user_id, event_type AS last_type, value AS last_value,
           ts AS last_ts, CAST(n_versions AS BIGINT) AS n_versions,
           first_ts
         FROM r WHERE rn = 1 AND op <> 'D'
         ORDER BY user_id""",
    "q_sessionize" ->
      """WITH g AS (
           SELECT user_id, event_id, ts,
             CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
                    OR epoch_us(ts) - lag(epoch_us(ts)) OVER w
                       > 30 * 60 * 1000000 THEN 1 ELSE 0 END AS is_start
           FROM events
           WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
         SELECT user_id, event_id, ts,
           CAST(sum(is_start) OVER (PARTITION BY user_id
             ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS BIGINT) AS session_id
         FROM g ORDER BY user_id, ts, event_id""",
    "q_seasonality" ->
      """WITH c AS (
           SELECT event_type,
             CAST((date_diff('day', DATE '2024-01-01', CAST(ts AS DATE))
               % 7 + 7) % 7 AS BIGINT) AS dow,
             CAST(hour(ts) AS BIGINT) AS hr,
             count(*) AS cnt
           FROM events GROUP BY 1, 2, 3),
         t AS (SELECT event_type, sum(cnt) AS type_total
               FROM c GROUP BY 1)
         SELECT c.event_type, c.dow, c.hr, c.cnt,
           floor(c.cnt * 168.0 / t.type_total * 10000 + 0.5) / 10000
             AS idx
         FROM c JOIN t USING (event_type)
         ORDER BY 1, 2, 3""",
    "q_markov_trans" ->
      """WITH p AS (
           SELECT event_type AS e1,
             lead(event_type, 1) OVER (PARTITION BY user_id
               ORDER BY ts, event_id) AS e2
           FROM events),
         c AS (
           SELECT e1, e2, count(*) AS cnt FROM p
           WHERE e2 IS NOT NULL GROUP BY 1, 2)
         SELECT e1, e2, cnt,
           CAST(cnt AS DOUBLE) / sum(cnt) OVER (PARTITION BY e1) AS prob
         FROM c ORDER BY e1, e2""",
    "q_path_trigrams" ->
      """WITH p AS (
           SELECT user_id, ts, event_id, event_type AS t1,
             lead(event_type, 1) OVER (PARTITION BY user_id
               ORDER BY ts, event_id) AS t2,
             lead(ts, 1) OVER (PARTITION BY user_id
               ORDER BY ts, event_id) AS ts2,
             lead(event_type, 2) OVER (PARTITION BY user_id
               ORDER BY ts, event_id) AS t3,
             lead(ts, 2) OVER (PARTITION BY user_id
               ORDER BY ts, event_id) AS ts3
           FROM events)
         SELECT t1, t2, t3, count(*) AS cnt
         FROM p
         WHERE t3 IS NOT NULL
           AND ts2 <= ts + INTERVAL 30 MINUTES
           AND ts3 <= ts2 + INTERVAL 30 MINUTES
         GROUP BY 1, 2, 3
         ORDER BY cnt DESC, t1, t2, t3 LIMIT 20""",
    "q_cusum" ->
      """WITH mu AS (
           SELECT user_id, floor(avg(value) * 1e4 + 0.5) / 1e4 AS mu
           FROM events GROUP BY 1),
         d AS (
           SELECT e.user_id, e.ts, e.event_id,
             CAST(floor((e.value - m.mu - 25.0) * 1e4 + 0.5) AS BIGINT)
               AS d_hi,
             CAST(floor((m.mu - 25.0 - e.value) * 1e4 + 0.5) AS BIGINT)
               AS d_lo
           FROM events e JOIN mu m USING (user_id)),
         p AS (
           SELECT user_id, ts, event_id,
             sum(d_hi) OVER w AS p_hi, sum(d_lo) OVER w AS p_lo
           FROM d
           WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS BETWEEN UNBOUNDED PRECEDING
                        AND CURRENT ROW)),
         s AS (
           SELECT user_id, event_id,
             p_hi - least(0, min(p_hi) OVER w) AS s_hi,
             p_lo - least(0, min(p_lo) OVER w) AS s_lo
           FROM p
           WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS BETWEEN UNBOUNDED PRECEDING
                        AND CURRENT ROW))
         SELECT user_id, event_id,
           CAST(s_hi AS DOUBLE) / 1e4 AS cusum_hi,
           CAST(s_lo AS DOUBLE) / 1e4 AS cusum_lo,
           (s_hi > 2500000 OR s_lo > 2500000) AS is_alarm
         FROM s ORDER BY user_id, event_id""",
    "q_psi" ->
      """WITH cnt AS (
           SELECT event_type,
             least(9, CAST(floor(value / 33.0) AS BIGINT)) AS b,
             CAST(sum(CASE WHEN ts < TIMESTAMP '2024-01-16 00:00:00'
               THEN 1 ELSE 0 END) AS BIGINT) AS c0,
             CAST(sum(CASE WHEN ts >= TIMESTAMP '2024-01-16 00:00:00'
               THEN 1 ELSE 0 END) AS BIGINT) AS c1
           FROM events GROUP BY 1, 2),
         spine AS (
           SELECT t.event_type, CAST(bb.b AS BIGINT) AS b
           FROM (SELECT DISTINCT event_type FROM events) t,
                (SELECT unnest(range(10)) AS b) bb),
         cells AS (
           SELECT s.event_type, s.b,
             coalesce(c.c0, 0) AS c0, coalesce(c.c1, 0) AS c1
           FROM spine s LEFT JOIN cnt c
             ON c.event_type = s.event_type AND c.b = s.b),
         tot AS (
           SELECT event_type, CAST(sum(c0) AS BIGINT) AS t0,
             CAST(sum(c1) AS BIGINT) AS t1
           FROM cells GROUP BY 1),
         pq AS (
           SELECT c.event_type, c.c0, c.c1,
             CAST(c.c0 + 1 AS DOUBLE) / (t.t0 + 10) AS p,
             CAST(c.c1 + 1 AS DOUBLE) / (t.t1 + 10) AS q
           FROM cells c JOIN tot t USING (event_type))
         SELECT event_type, CAST(sum(c0) AS BIGINT) AS n_first,
           CAST(sum(c1) AS BIGINT) AS n_second,
           floor(sum((p - q) * ln(p / q)) * 1e4 + 0.5) / 1e4 AS psi
         FROM pq GROUP BY event_type ORDER BY event_type""",
    "q_seq_entropy" ->
      """WITH t AS (
           SELECT event_type AS e1,
             lead(event_type) OVER (PARTITION BY user_id
               ORDER BY ts, event_id) AS e2
           FROM events),
         c AS (
           SELECT e1, e2, count(*) AS c FROM t
           WHERE e2 IS NOT NULL GROUP BY 1, 2)
         SELECT e1, CAST(sum(c) AS BIGINT) AS n, count(*) AS n_next,
           floor((ln(CAST(sum(c) AS DOUBLE))
                  - sum(CAST(c AS DOUBLE) * ln(CAST(c AS DOUBLE)))
                    / sum(c)) * 1e4 + 0.5) / 1e4 AS h_cond
         FROM c GROUP BY e1 ORDER BY e1""",
    "q_survival" ->
      """WITH su AS (
           SELECT user_id, min(ts) AS sts FROM events
           WHERE event_type = 'signup' GROUP BY 1),
         pu AS (
           SELECT e.user_id, min(e.ts) AS pts
           FROM events e JOIN su USING (user_id)
           WHERE e.event_type = 'purchase' AND e.ts >= su.sts
           GROUP BY 1),
         e AS (SELECT max(CAST(ts AS DATE)) AS endd FROM events),
         lt AS (
           SELECT
             CAST(CASE WHEN pu.pts IS NOT NULL
               THEN CAST(pu.pts AS DATE) - CAST(su.sts AS DATE)
               ELSE e.endd - CAST(su.sts AS DATE) END AS BIGINT) AS t,
             CASE WHEN pu.pts IS NOT NULL THEN 1 ELSE 0 END AS dead
           FROM su LEFT JOIN pu USING (user_id), e),
         hist AS (
           SELECT t, count(*) AS n_users,
             CAST(sum(dead) AS BIGINT) AS n_deaths
           FROM lt GROUP BY 1),
         risk AS (
           SELECT a.t, CAST(sum(b.n_users) AS BIGINT) AS n_at_risk
           FROM hist a JOIN hist b ON b.t >= a.t GROUP BY a.t),
         h2 AS (
           SELECT hist.t, risk.n_at_risk, hist.n_deaths
           FROM hist JOIN risk USING (t)),
         dh AS (
           SELECT t AS bt,
             CASE WHEN n_deaths = n_at_risk THEN NULL
               ELSE ln(1.0 - CAST(n_deaths AS DOUBLE) / n_at_risk)
             END AS lnr,
             CASE WHEN n_deaths = n_at_risk THEN 1 ELSE 0 END AS term
           FROM h2 WHERE n_deaths > 0)
         SELECT a.t, a.n_at_risk, a.n_deaths,
           CASE WHEN max(dh.term) = 1 THEN 0.0
             ELSE floor(exp(sum(dh.lnr)) * 1e4 + 0.5) / 1e4
           END AS survival
         FROM h2 a JOIN dh ON dh.bt <= a.t
         WHERE a.n_deaths > 0
         GROUP BY a.t, a.n_at_risk, a.n_deaths
         ORDER BY a.t""",
    "q_seasonal_anom" ->
      """WITH dates AS (
           SELECT d,
             CAST(((d - DATE '2024-01-01') % 7 + 7) % 7 AS BIGINT) AS dow
           FROM (SELECT DISTINCT CAST(ts AS DATE) AS d FROM events)),
         types AS (SELECT DISTINCT event_type FROM events),
         hrs AS (SELECT CAST(unnest(range(24)) AS BIGINT) AS hr),
         actual AS (
           SELECT event_type, CAST(ts AS DATE) AS d,
             CAST(hour(ts) AS BIGINT) AS hr, count(*) AS cnt
           FROM events GROUP BY 1, 2, 3),
         cells AS (
           SELECT sp.event_type, sp.d, sp.hr, sp.dow,
             coalesce(a.cnt, 0) AS cnt
           FROM (SELECT t.event_type, dd.d, h.hr, dd.dow
                 FROM types t, dates dd, hrs h) sp
           LEFT JOIN actual a
             ON a.event_type = sp.event_type AND a.d = sp.d
            AND a.hr = sp.hr),
         nd AS (SELECT dow, count(*) AS n_dates FROM dates GROUP BY 1),
         slot AS (
           SELECT event_type, dow, hr, sum(cnt) AS slot_total
           FROM cells GROUP BY 1, 2, 3)
         SELECT c.event_type, c.d, c.hr, c.cnt,
           floor(CAST(c.cnt AS DOUBLE) * nd.n_dates / s.slot_total
                 * 1e4 + 0.5) / 1e4 AS ratio
         FROM cells c
         JOIN slot s ON s.event_type = c.event_type
           AND s.dow = c.dow AND s.hr = c.hr
         JOIN nd ON nd.dow = c.dow
         WHERE s.slot_total >= 2 * nd.n_dates
           AND (floor(CAST(c.cnt AS DOUBLE) * nd.n_dates / s.slot_total
                 * 1e4 + 0.5) / 1e4 >= 2.0
             OR floor(CAST(c.cnt AS DOUBLE) * nd.n_dates / s.slot_total
                 * 1e4 + 0.5) / 1e4 <= 0.5)
         ORDER BY c.event_type, c.d, c.hr""")
}
