package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Statistical aggregate surface (SURVEY §2.4 extension, round 3):
  * moments (stddev/variance), bivariate statistics (corr/covar), exact
  * median, linear-regression aggregates (regr_*), boolean aggregates
  * (bool_and/bool_or) and argmax (max_by), plus NULLS FIRST/LAST ordering
  * with OFFSET pagination (§2.6 O2).
  *
  * All of these are single-pass hash aggregates in Spark (partial on the
  * map side, final after one shuffle on the group key) — the same shape as
  * `q_agg_groupby`, so they inherit its 100 TB scaling story. Doubles that
  * cross the engine boundary are rounded with [[fround]] at a precision
  * coarse enough that Spark's and DuckDB's different summation orders
  * (~1e-12 relative drift) can't straddle a rounding boundary.
  */
object Stats {
  private def T(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.table(s, dir, n)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Moments + bivariate stats + exact median per group. median() is
    // Catalyst's exact percentile(0.5) — both engines interpolate the
    // middle pair, and l_quantity's integral doubles interpolate exactly.
    "q_stats_agg" -> ((s, dir) => {
      T(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
          count(lit(1)).as("cnt"),
          fround(stddev_samp(col("l_quantity")), 4).as("sd_qty"),
          fround(var_pop(col("l_discount")), 6).as("var_disc"),
          fround(corr(col("l_quantity"), col("l_extendedprice")), 6)
            .as("corr_qp"),
          fround(covar_samp(col("l_quantity"), col("l_tax")), 6)
            .as("covar_qt"),
          median(col("l_quantity")).as("med_qty"))
        .orderBy("l_returnflag")
    }),

    // Linear-regression aggregates: y = l_extendedprice over
    // x = l_quantity per line status. One pass; regr_* share the same
    // sufficient statistics (n, Σx, Σy, Σxx, Σxy) Catalyst computes once.
    "q_regr_agg" -> ((s, dir) => {
      val y = col("l_extendedprice"); val x = col("l_quantity")
      T(s, dir, "lineitem")
        .groupBy("l_linestatus")
        .agg(
          regr_count(y, x).as("n"),
          fround(regr_avgx(y, x), 4).as("avgx"),
          fround(regr_avgy(y, x), 2).as("avgy"),
          fround(regr_slope(y, x), 4).as("slope"),
          fround(regr_intercept(y, x), 2).as("icept"),
          fround(regr_r2(y, x), 6).as("r2"))
        .orderBy("l_linestatus")
    }),

    // Boolean aggregates + argmax. max_by is deterministic here because
    // max(l_extendedprice) is unique within every l_returnflag group at
    // sf0.001/0.01/0.1 (verified; a tie would make it engine-defined).
    "q_bool_agg" -> ((s, dir) => {
      T(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
          bool_and(col("l_discount") <= 0.1).as("all_low_disc"),
          bool_or(col("l_quantity") > 49).as("any_big_qty"),
          bool_and(col("l_tax") > 0.07).as("all_hi_tax"),
          max_by(col("l_orderkey"), col("l_extendedprice"))
            .as("top_price_order"))
        .orderBy("l_returnflag")
    }),

    // Multi-key sort with explicit NULLS FIRST + OFFSET pagination.
    // Synthesizes NULLs (the tables are fully populated) via nullif on a
    // status predicate; both engines get the same explicit null ordering
    // (their defaults differ: Spark NULLS FIRST on ASC, DuckDB NULLS LAST).
    "q_order_nulls" -> ((s, dir) => {
      T(s, dir, "orders")
        .select(col("o_orderkey"),
          when(col("o_orderstatus") === "O", lit(null).cast("double"))
            .otherwise(col("o_totalprice")).as("tp"))
        .orderBy(desc_nulls_first("tp"), asc("o_orderkey"))
        .offset(100).limit(50)
    }),

    // O1b — top-k PER GROUP (the per-key companion of the global q_topk):
    // each customer's 3 priciest orders. One shuffle on the group key,
    // rank inside the partition, filter — at 100 TB this is the plan you
    // want ONLY because k is tiny relative to group size; WindowExec's
    // rank-limit pushdown (WindowGroupLimit, Spark 3.5+) keeps at most k
    // rows per key per map partition BEFORE the shuffle, so the exchange
    // carries ~k·|keys| rows, not the full table. Deterministic tie-break
    // on o_orderkey.
    "q_topk_group" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("o_custkey")
        .orderBy(desc("o_totalprice"), asc("o_orderkey"))
      T(s, dir, "orders")
        .select("o_custkey", "o_orderkey", "o_totalprice")
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 3)
        .orderBy("o_custkey", "rk")
    }),

    // Equi-DEPTH histogram (r9): 10 buckets of equal row count over the
    // price distribution — the quantile-sketch readout DBAs and mixing
    // pipelines both want (equi-WIDTH is q_histogram). Buckets come
    // from Ranking.withGlobalNtile, so the plan is a range exchange +
    // map-side tile arithmetic — NO single-task window (the same r9
    // machinery q_rfm runs on, here exercised over 600 k rows at bench
    // scale). The output aggregates per bucket, which makes it
    // tie-order-independent: rows tying on the full sort key share a
    // price, so lo/hi/cnt are identical however the tie resolves.
    "q_hist_eqdepth" -> ((s, dir) => {
      val base = T(s, dir, "lineitem")
        .select("l_orderkey", "l_linenumber", "l_extendedprice")
      graft.operators.Ranking
        .withGlobalNtile(base, 10, "bucket", asc("l_extendedprice"),
          asc("l_orderkey"), asc("l_linenumber"))
        .groupBy(col("bucket").cast("long").as("bucket"))
        .agg(count(lit(1)).as("cnt"),
          min("l_extendedprice").as("lo"),
          max("l_extendedprice").as("hi"))
        .orderBy("bucket")
    }),

    // Robust per-user anomaly flags via MAD (r9): median absolute
    // deviation — the outlier screen that survives the heavy tails
    // z-scores choke on. Two exact-percentile aggregations (median of
    // values, then median of deviations — inherently two passes) + two
    // equi joins, ALL keyed on user_id so the three shuffles share one
    // partitioning at scale. The fround discipline makes every boundary
    // decision cross-engine exact: med and mad round at 4 dp before any
    // downstream use, the deviation rounds before the score, the score
    // rounds before the > 3 cut, and a zero MAD (a majority-constant
    // user) degenerates to "any deviation is an outlier" with a NULL
    // score — both engines agree on the CASE.
    "q_mad_outlier" -> ((s, dir) => {
      val e = T(s, dir, "events")
        .select("user_id", "event_id", "value")
      val med = e.groupBy("user_id")
        .agg(fround(expr("percentile(value, 0.5)"), 4).as("med"))
      val dev = e.join(med, "user_id")
        .withColumn("dev", fround(abs(col("value") - col("med")), 4))
      val mad = dev.groupBy("user_id")
        .agg(fround(expr("percentile(dev, 0.5)"), 4).as("mad"))
      dev.join(mad, "user_id")
        .withColumn("score",
          when(col("mad") === 0.0, lit(null).cast("double"))
            .otherwise(fround(col("dev") / (lit(1.4826) * col("mad")), 4)))
        .withColumn("is_outlier",
          when(col("mad") === 0.0, col("dev") > 0.0)
            .otherwise(col("score") > 3.0))
        .select("user_id", "event_id", "value", "med", "mad", "score",
          "is_outlier")
        .orderBy("user_id", "event_id")
    }),

    // Winsorized group means (r11): clip l_extendedprice at the exact
    // per-group [p01, p99] and report raw vs winsorized mean + clip
    // counts — the robust-mean readout that keeps a fat-tailed metric
    // comparable across groups. The q_mad_outlier fround discipline:
    // both bounds round at 4 dp BEFORE any clip decision (prices carry
    // 2 decimals, so the boundary comparison is cross-engine exact).
    // Plan: one exact-percentile agg per group (5 rows) BROADCAST back
    // into a single map-side clip + one final agg — two shuffles total,
    // both on the group key. 100 TB note: exact percentile buffers the
    // group — the approx_percentile swap is the spec-pinned scale path
    // (StatsSpec rank-error bound), identical plan otherwise.
    "q_winsorize" -> ((s, dir) => {
      val l = T(s, dir, "lineitem")
        .select(col("l_returnflag").as("rf"), col("l_extendedprice").as("p"))
      val bounds = l.groupBy("rf")
        .agg(fround(expr("percentile(p, 0.01)"), 4).as("p01"),
          fround(expr("percentile(p, 0.99)"), 4).as("p99"))
      l.join(broadcast(bounds), "rf")
        .withColumn("pw", least(greatest(col("p"), col("p01")), col("p99")))
        .groupBy("rf")
        .agg(count(lit(1)).as("n"),
          sum((col("p") < col("p01")).cast("long")).as("clip_lo"),
          sum((col("p") > col("p99")).cast("long")).as("clip_hi"),
          fround(avg("p"), 4).as("raw_mean"),
          fround(avg("pw"), 4).as("wins_mean"),
          max("p01").as("p01"), max("p99").as("p99"))
        .orderBy("rf")
    })
  )

  val oracles: Map[String, String] = Map(
    "q_hist_eqdepth" ->
      """WITH b AS (
           SELECT l_extendedprice,
             ntile(10) OVER (ORDER BY l_extendedprice, l_orderkey,
                             l_linenumber) AS bucket
           FROM lineitem)
         SELECT CAST(bucket AS BIGINT) AS bucket, count(*) AS cnt,
           min(l_extendedprice) AS lo, max(l_extendedprice) AS hi
         FROM b GROUP BY 1 ORDER BY 1""",
    "q_winsorize" ->
      """WITH b AS (
           SELECT l_returnflag AS rf,
             floor(quantile_cont(l_extendedprice, 0.01) * 1e4 + 0.5) / 1e4
               AS p01,
             floor(quantile_cont(l_extendedprice, 0.99) * 1e4 + 0.5) / 1e4
               AS p99
           FROM lineitem GROUP BY 1)
         SELECT l.l_returnflag AS rf, count(*) AS n,
           CAST(sum(CASE WHEN l.l_extendedprice < b.p01 THEN 1 ELSE 0 END)
             AS BIGINT) AS clip_lo,
           CAST(sum(CASE WHEN l.l_extendedprice > b.p99 THEN 1 ELSE 0 END)
             AS BIGINT) AS clip_hi,
           floor(avg(l.l_extendedprice) * 1e4 + 0.5) / 1e4 AS raw_mean,
           floor(avg(least(greatest(l.l_extendedprice, b.p01), b.p99))
             * 1e4 + 0.5) / 1e4 AS wins_mean,
           max(b.p01) AS p01, max(b.p99) AS p99
         FROM lineitem l JOIN b ON l.l_returnflag = b.rf
         GROUP BY 1 ORDER BY 1""",
    "q_mad_outlier" ->
      """WITH med AS (
           SELECT user_id,
             floor(quantile_cont(value, 0.5) * 10000 + 0.5) / 10000
               AS med
           FROM events GROUP BY 1),
         d AS (
           SELECT e.user_id, e.event_id, e.value, m.med,
             floor(abs(e.value - m.med) * 10000 + 0.5) / 10000 AS dev
           FROM events e JOIN med m USING (user_id)),
         mad AS (
           SELECT user_id,
             floor(quantile_cont(dev, 0.5) * 10000 + 0.5) / 10000 AS mad
           FROM d GROUP BY 1)
         SELECT d.user_id, d.event_id, d.value, d.med, mad.mad,
           CASE WHEN mad.mad = 0 THEN NULL
                ELSE floor(d.dev / (1.4826 * mad.mad) * 10000 + 0.5)
                     / 10000 END AS score,
           CASE WHEN mad.mad = 0 THEN d.dev > 0
                ELSE floor(d.dev / (1.4826 * mad.mad) * 10000 + 0.5)
                     / 10000 > 3 END AS is_outlier
         FROM d JOIN mad USING (user_id)
         ORDER BY d.user_id, d.event_id""",
    "q_topk_group" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, rk FROM (
           SELECT o_custkey, o_orderkey, o_totalprice,
             row_number() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey) AS rk
           FROM orders)
         WHERE rk <= 3 ORDER BY o_custkey, rk""",
    "q_stats_agg" ->
      """SELECT l_returnflag, count(*) AS cnt,
                floor(stddev_samp(l_quantity)*1e4 + 0.5)/1e4 AS sd_qty,
                floor(var_pop(l_discount)*1e6 + 0.5)/1e6 AS var_disc,
                floor(corr(l_quantity, l_extendedprice)*1e6 + 0.5)/1e6
                  AS corr_qp,
                floor(covar_samp(l_quantity, l_tax)*1e6 + 0.5)/1e6
                  AS covar_qt,
                median(l_quantity) AS med_qty
         FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",
    "q_regr_agg" ->
      """SELECT l_linestatus,
                regr_count(l_extendedprice, l_quantity) AS n,
                floor(regr_avgx(l_extendedprice, l_quantity)*1e4 + 0.5)/1e4
                  AS avgx,
                floor(regr_avgy(l_extendedprice, l_quantity)*1e2 + 0.5)/1e2
                  AS avgy,
                floor(regr_slope(l_extendedprice, l_quantity)*1e4 + 0.5)/1e4
                  AS slope,
                floor(regr_intercept(l_extendedprice, l_quantity)*1e2
                  + 0.5)/1e2 AS icept,
                floor(regr_r2(l_extendedprice, l_quantity)*1e6 + 0.5)/1e6
                  AS r2
         FROM lineitem GROUP BY l_linestatus ORDER BY l_linestatus""",
    "q_bool_agg" ->
      """SELECT l_returnflag,
                bool_and(l_discount <= 0.1) AS all_low_disc,
                bool_or(l_quantity > 49) AS any_big_qty,
                bool_and(l_tax > 0.07) AS all_hi_tax,
                max_by(l_orderkey, l_extendedprice) AS top_price_order
         FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",
    "q_order_nulls" ->
      """SELECT o_orderkey,
                CASE WHEN o_orderstatus = 'O' THEN NULL
                     ELSE o_totalprice END AS tp
         FROM orders
         ORDER BY tp DESC NULLS FIRST, o_orderkey
         LIMIT 50 OFFSET 100"""
  )
}
