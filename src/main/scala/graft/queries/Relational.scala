package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** T2 full relational surface (SURVEY §2.2–§2.8).
  *
  * The reference delegates all of this to Catalyst 1.5 [SURVEY §2 R]; we
  * declare each op with the DataFrame API and let Catalyst 4 plan it.
  * Scale notes are attached per query: broadcast hints where a side is
  * dimension-sized, aggregation before join where cardinality allows, and
  * no driver-side materialization anywhere.
  */
object Relational {
  private def T(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.table(s, dir, n)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // P3 — CASE WHEN.
    "q_case_expr" -> ((s, dir) => {
      T(s, dir, "lineitem")
        .withColumn("bucket",
          when(col("l_quantity") < 10, "small")
            .when(col("l_quantity") < 30, "mid")
            .otherwise("big"))
        .groupBy("bucket")
        .agg(count(lit(1)).as("cnt"),
          round(sum("l_extendedprice"), 2).as("sum_price"))
        .orderBy("bucket")
    }),

    // J2 — star join: fact lineitem against three dimension tables.
    // Explicit broadcast() ONLY on the true dims (nation=25, region=5
    // rows at EVERY scale factor) — the fact side never shuffles for
    // those joins; only the final groupBy shuffles 25 rows. Customer is
    // NOT a true dim: it scales with SF (~15 B rows at 100 TB), so its
    // leg carries no hint — Catalyst/AQE auto-broadcasts it at bench
    // scale (sf0.1 customer ≈ 2 MB < autoBroadcastJoinThreshold) and
    // falls back to a shuffle join once its stats outgrow the threshold,
    // which is exactly the scale-dependent choice a forced hint would
    // get wrong at one end or the other (r8; the r7 comment claimed the
    // broadcast held at 100 TB — it does not).
    // r15 (VERDICT r14 #5): built as ONE SQL statement over the memoized
    // temp views instead of a chain of eager Dataset .join()s — each
    // Dataset op re-analyzed the whole growing tree (~0.3 s of pure
    // driver analysis per build for the big joins), while spark.sql
    // analyzes the full tree exactly once. The hints express the same
    // strategy the typed builder forced; semantics, column names and the
    // physical plan are unchanged (plans/r15, oracle green).
    "q_join_broadcast" -> ((s, dir) => {
      Tables.load(s, dir)
      // the fact⋈fact leg hints shuffle-hash: both sides still shuffle
      // once on the order key (the scale-correct shape — orders is NOT
      // broadcastable at 100 TB), but the hash build on the smaller
      // orders side skips sort-merge's two full sorts. Customer carries
      // NO hint: AQE auto-broadcasts it at bench scale and falls back to
      // a shuffle join once its stats outgrow the threshold.
      s.sql("""
        SELECT /*+ SHUFFLE_HASH(o), BROADCAST(n), BROADCAST(r) */
          r_name, n_name, count(1) AS cnt,
          round(sum(l_extendedprice * (1.0D - l_discount)), 2) AS revenue
        FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        JOIN region r ON n.n_regionkey = r.r_regionkey
        GROUP BY r_name, n_name
        ORDER BY r_name, n_name""")
    }),

    // J2b — the BASELINE.md join_3way shape verbatim (orders⋈customer⋈
    // nation + group agg) so BENCH is apples-to-apples with the measured
    // baseline; q_join_broadcast is the heavier 5-way star.
    "q_join_3way" -> ((s, dir) => {
      val o = T(s, dir, "orders")
      val c = T(s, dir, "customer")
      val n = T(s, dir, "nation")
      o.join(c, o("o_custkey") === c("c_custkey"))
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .groupBy("n_name")
        .agg(count(lit(1)).as("cnt"),
          round(sum("o_totalprice"), 2).as("sum_price"))
        .orderBy("n_name")
    }),

    // J2c — TPC-H Q5 shape (r8): the canonical 6-table local-supplier
    // revenue query — customer ⋈ orders ⋈ lineitem ⋈ supplier with the
    // c_nationkey = s_nationkey residual (a true fact-side equi
    // constraint, not a dim lookup), nation/region as broadcast dims.
    // At 100 TB: region/nation broadcast at any SF (25/5 rows); the
    // fact chain shuffles once per join key (custkey, orderkey,
    // suppkey) and the date filter pushes into the orders scan. The
    // 5-row output makes the agg shuffle trivial.
    // r15 (VERDICT r14 #5): same one-SQL-analysis rewrite as
    // q_join_broadcast above — the 6-table Dataset chain paid the
    // quadratic re-analysis worst of all. fround(x, 2) is inlined as its
    // defining expression floor(x * 100 + 0.5) / 100 (all DOUBLE
    // literals, bit-identical arithmetic).
    "q_join_6way" -> ((s, dir) => {
      Tables.load(s, dir)
      s.sql("""
        SELECT /*+ BROADCAST(n), BROADCAST(r) */
          n_name, count(1) AS cnt,
          floor(sum(l_extendedprice * (1.0D - l_discount)) * 100.0D + 0.5D)
            / 100.0D AS revenue
        FROM customer cu
        JOIN (SELECT * FROM orders
              WHERE o_orderdate >= '1996-01-01'
                AND o_orderdate < '1997-01-01') o
          ON cu.c_custkey = o.o_custkey
        JOIN lineitem l ON o.o_orderkey = l.l_orderkey
        JOIN supplier su ON l.l_suppkey = su.s_suppkey
          AND cu.c_nationkey = su.s_nationkey
        JOIN nation n ON su.s_nationkey = n.n_nationkey
        JOIN (SELECT * FROM region WHERE r_name = 'ASIA') r
          ON n.n_regionkey = r.r_regionkey
        GROUP BY n_name
        ORDER BY n_name""")
    }),

    // J3 — left outer with a join-side predicate (keeps unmatched rows).
    "q_join_outer" -> ((s, dir) => {
      val c = T(s, dir, "customer")
      val o = T(s, dir, "orders")
      c.join(o,
          c("c_custkey") === o("o_custkey") &&
          o("o_orderdate") >= lit("2001-01-01"), "left")
        .groupBy("c_custkey")
        .agg(count(col("o_orderkey")).as("cnt_orders"))
        .orderBy("c_custkey")
    }),

    // J4 — left semi (EXISTS).
    "q_join_semi" -> ((s, dir) => {
      val c = T(s, dir, "customer")
      val o = T(s, dir, "orders")
      c.join(o,
          c("c_custkey") === o("o_custkey") &&
          o("o_totalprice") > 400000.0, "left_semi")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    }),

    // J5 — left anti (NOT EXISTS): customers with no 2001+ order.
    "q_join_anti" -> ((s, dir) => {
      val c = T(s, dir, "customer")
      val o = T(s, dir, "orders")
      c.join(o,
          c("c_custkey") === o("o_custkey") &&
          o("o_orderdate") >= lit("2001-01-01"), "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    }),

    // J6 — equi key + non-equi residual predicate.
    "q_join_theta" -> ((s, dir) => {
      val l = T(s, dir, "lineitem")
      val o = T(s, dir, "orders")
      // equi key + residual range predicate. shuffle_hash: both sides are
      // fact tables (nothing broadcastable at scale) and the residual is
      // evaluated per matched pair either way — hashing the smaller orders
      // side skips the two sort passes SMJ would spend on 600k+150k rows
      // (same reasoning as q_join_broadcast's fact⋈fact leg).
      l.join(o.hint("shuffle_hash"),
          l("l_orderkey") === o("o_orderkey") &&
          l("l_shipdate") > o("o_orderdate") + expr("INTERVAL 60 DAYS"))
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("cnt"),
          round(sum("l_extendedprice"), 2).as("sum_price"))
        .orderBy("o_orderpriority")
    }),

    // A2 — global aggregate, no keys.
    "q_agg_global" -> ((s, dir) => {
      T(s, dir, "lineitem")
        .agg(count(lit(1)).as("cnt"),
          round(sum("l_quantity"), 2).as("sum_qty"),
          round(min("l_extendedprice"), 2).as("min_price"),
          round(max("l_extendedprice"), 2).as("max_price"),
          fround(avg("l_quantity"), 4).as("avg_qty"))
    }),

    // A3 — multi-distinct aggregation (Catalyst Expand-based rewrite).
    "q_agg_distinct" -> ((s, dir) => {
      T(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(countDistinct(col("l_partkey")).as("nd_part"),
          countDistinct(col("l_suppkey")).as("nd_supp"),
          count(lit(1)).as("cnt"))
        .orderBy("l_returnflag")
    }),

    // A4 — HAVING.
    "q_agg_having" -> ((s, dir) => {
      T(s, dir, "lineitem")
        .groupBy("l_partkey")
        .agg(count(lit(1)).as("cnt"),
          round(sum("l_quantity"), 2).as("sum_qty"))
        .filter(col("cnt") >= 40)
        .orderBy("l_partkey")
    }),

    // A5 — ROLLUP (coalesce the grouping nulls: data cols are non-null,
    // so 'ALL' unambiguously marks the subtotal rows in both engines).
    "q_agg_rollup" -> ((s, dir) => {
      T(s, dir, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("cnt"), round(sum("l_quantity"), 2).as("sum_qty"))
        .select(coalesce(col("l_returnflag"), lit("ALL")).as("rf"),
          coalesce(col("l_linestatus"), lit("ALL")).as("ls"),
          col("cnt"), col("sum_qty"))
        .orderBy("rf", "ls")
    }),

    // A5 — CUBE.
    "q_agg_cube" -> ((s, dir) => {
      T(s, dir, "orders")
        .cube("o_orderstatus", "o_orderpriority")
        .agg(count(lit(1)).as("cnt"),
          round(sum("o_totalprice"), 2).as("sum_price"))
        .select(coalesce(col("o_orderstatus"), lit("ALL")).as("st"),
          coalesce(col("o_orderpriority"), lit("ALL")).as("pri"),
          col("cnt"), col("sum_price"))
        .orderBy("st", "pri")
    }),

    // A6b — the BASELINE.md approx_distinct shape verbatim (one global
    // HLL) for apples-to-apples BENCH; rows-only like all sketches.
    "q_approx_global" -> ((s, dir) => {
      T(s, dir, "events")
        .agg(approx_count_distinct(col("user_id")).as("nd_users"))
    }),

    // A6 — HLL sketch; deterministic per engine but engine-specific →
    // oracle omitted (rows-only check), exactness bounds in ScalaTest.
    "q_approx_distinct" -> ((s, dir) => {
      T(s, dir, "events")
        .groupBy("event_type")
        .agg(approx_count_distinct(col("user_id")).as("nd_users"),
          count(lit(1)).as("cnt"))
        .orderBy("event_type")
    }),

    // W1 — ranking functions with a unique tie-breaker in the ORDER BY.
    // ntile is computed ARITHMETICALLY from row_number + a full-frame
    // count over the same window spec: the builtin ntile() is a
    // SizeBasedWindowFunction that forces a second pass over each
    // buffered partition (measured +25–60% on this key), while the
    // unbounded-frame count is evaluated once per partition and both
    // frames share the single WindowExec sort. Semantics are identical:
    // first (c mod 4) buckets get ceil(c/4) rows, the rest floor(c/4).
    "q_window_rank" -> ((s, dir) => {
      val w = Window.partitionBy("o_custkey")
        .orderBy(desc("o_totalprice"), asc("o_orderkey"))
      val wFull = w.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing)
      T(s, dir, "orders")
        .withColumn("rn", row_number().over(w).cast("long"))
        .withColumn("rnk", rank().over(w).cast("long"))
        .withColumn("pc", count(lit(1)).over(wFull))
        .withColumn("nt", arithNtile(col("rn"), col("pc"), 4))
        .filter(col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rn", "rnk", "nt")
        .orderBy("o_custkey", "rn")
    }),

    // W4 — RANGE frame over a numeric ORDER BY (peer-inclusive, so the
    // result is tie-order-independent by construction).
    "q_window_range" -> ((s, dir) => {
      T(s, dir, "orders")
        .withColumn("rsum", round(expr(
          """sum(o_totalprice) OVER (PARTITION BY o_custkey
             ORDER BY o_totalprice
             RANGE BETWEEN 50000 PRECEDING AND CURRENT ROW)"""), 2))
        .select("o_custkey", "o_orderkey", "rsum")
        .orderBy("o_custkey", "o_orderkey")
    }),

    // U2b — INTERSECT ALL / EXCEPT ALL (multiset semantics).
    "q_setops_all" -> ((s, dir) => {
      val o = T(s, dir, "orders")
      val x = o.filter(col("o_orderstatus") === "F")
        .select(col("o_orderpriority").as("pri"))
      val y = o.filter(col("o_totalprice") > 100000.0)
        .select(col("o_orderpriority").as("pri"))
      val i = x.intersectAll(y).groupBy("pri")
        .agg(count(lit(1)).as("cnt")).withColumn("op", lit("intersect_all"))
      val e = x.exceptAll(y).groupBy("pri")
        .agg(count(lit(1)).as("cnt")).withColumn("op", lit("except_all"))
      i.union(e).select("op", "pri", "cnt").orderBy("op", "pri")
    }),

    // Exact percentiles (linear interpolation in both engines).
    "q_percentile" -> ((s, dir) => {
      T(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(fround(expr("percentile(l_quantity, 0.5)"), 4).as("p50"),
          fround(expr("percentile(l_quantity, 0.9)"), 4).as("p90"),
          count(lit(1)).as("cnt"))
        .orderBy("l_returnflag")
    }),

    // Pivot: per-user event-type count matrix (explicit value list keeps
    // the output schema deterministic; DuckDB oracle via FILTER aggs).
    "q_pivot" -> ((s, dir) => {
      val types = Seq("click", "error", "purchase", "signup", "view")
      val p = T(s, dir, "events")
        .groupBy("user_id")
        .pivot("event_type", types)
        .agg(count(lit(1)))
      types.foldLeft(p)((df, t) =>
          df.withColumn(t, coalesce(col(t), lit(0L))))
        .orderBy("user_id")
    }),

    // W2 — running total over rowsBetween(unboundedPreceding, currentRow).
    "q_window_running" -> ((s, dir) => {
      val w = Window.partitionBy("o_custkey")
        .orderBy(asc("o_orderdate"), asc("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      T(s, dir, "orders")
        .withColumn("run_sum", round(sum("o_totalprice").over(w), 2))
        .select("o_custkey", "o_orderkey", "run_sum")
        .orderBy("o_custkey", "o_orderkey")
    }),

    // W3 — lag/lead: per-user inter-event gap in microseconds (CEP delta).
    "q_window_lag" -> ((s, dir) => {
      val w = Window.partitionBy("user_id").orderBy(asc("ts"), asc("event_id"))
      T(s, dir, "events")
        .withColumn("gap_us",
          unix_micros(col("ts")) - lag(unix_micros(col("ts")), 1).over(w))
        .withColumn("next_type", lead(col("event_type"), 1).over(w))
        .select("event_id", "user_id", "gap_us", "next_type")
        .orderBy("event_id")
    }),

    // U1 — UNION ALL then aggregate.
    "q_union" -> ((s, dir) => {
      val c = T(s, dir, "customer").select(col("c_nationkey").as("k"))
      val p = T(s, dir, "supplier").select(col("s_nationkey").as("k"))
      c.union(p).groupBy("k").agg(count(lit(1)).as("cnt")).orderBy("k")
    }),

    // U2 — INTERSECT and EXCEPT, tagged and unioned into one result.
    "q_intersect_except" -> ((s, dir) => {
      val c = T(s, dir, "customer").select(col("c_nationkey").as("k"))
      val p = T(s, dir, "supplier").select(col("s_nationkey").as("k"))
      val i = c.intersect(p).withColumn("op", lit("intersect"))
      val e = c.except(p).withColumn("op", lit("except"))
      i.union(e).select("op", "k").orderBy("op", "k")
    }),

    // F1 — string functions.
    "q_str_funcs" -> ((s, dir) => {
      T(s, dir, "part")
        .select(col("p_partkey"),
          upper(col("p_name")).as("up"),
          substring(col("p_name"), 1, 4).as("sub"),
          length(col("p_name")).cast("long").as("len"),
          regexp_replace(col("p_name"), lit(" "), lit("_")).as("rep"),
          concat(col("p_brand"), lit(":"), col("p_type")).as("cat"),
          regexp_extract(col("p_name"), "^([a-z]+)", 1).as("fw"))
        .orderBy("p_partkey")
    }),

    // F2 — date/time functions.
    "q_date_funcs" -> ((s, dir) => {
      T(s, dir, "orders")
        .groupBy(year(col("o_orderdate")).cast("long").as("y"),
          month(col("o_orderdate")).cast("long").as("m"))
        .agg(count(lit(1)).as("cnt"),
          min(col("o_orderdate")).as("min_d"),
          min(date_trunc("month", col("o_orderdate"))).as("first_day"),
          min(col("o_orderdate") + expr("INTERVAL 30 DAYS")).as("plus30"))
        .withColumn("dow_min", dayofweek(col("min_d")).cast("long"))
        .orderBy("y", "m")
    }),

    // F3 — math functions.
    "q_math_funcs" -> ((s, dir) => {
      T(s, dir, "part")
        .select(col("p_partkey"),
          round(sqrt(col("p_retailprice")), 4).as("sq"),
          round(log(col("p_retailprice") + 1), 4).as("lg"),
          (col("p_size").cast("long") * col("p_size")).as("sz2"),
          abs(-col("p_size")).cast("long").as("ab"),
          (col("p_partkey") % 7).as("md"),
          floor(col("p_retailprice")).cast("long").as("fl"),
          ceil(col("p_retailprice")).cast("long").as("ce"))
        .orderBy("p_partkey")
    }),

    // F4 — JSON scalar extraction from events.props.
    "q_json_extract" -> ((s, dir) => {
      T(s, dir, "events")
        .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
        .groupBy("k")
        .agg(count(lit(1)).as("cnt"), round(sum("value"), 2).as("sum_value"))
        .orderBy("k")
    }),

    // F5 — array functions + higher-order transform/aggregate over the
    // 64-dim embedding vector (all inside whole-stage codegen).
    "q_array_funcs" -> ((s, dir) => {
      T(s, dir, "embeddings")
        .select(col("vec_id"),
          size(col("embedding")).cast("long").as("dim"),
          round(col("embedding").getItem(0).cast("double"), 4).as("first"),
          round(sqrt(aggregate(
            transform(col("embedding"), x => x.cast("double") * x.cast("double")),
            lit(0.0), (acc, v) => acc + v)), 4).as("l2norm"),
          round(array_max(col("embedding")).cast("double"), 4).as("maxe"))
        .orderBy("vec_id")
    })
  )

  val oracles: Map[String, String] = Map(
    "q_case_expr" ->
      """SELECT CASE WHEN l_quantity < 10 THEN 'small'
                     WHEN l_quantity < 30 THEN 'mid' ELSE 'big' END AS bucket,
         count(*) AS cnt, round(sum(l_extendedprice), 2) AS sum_price
         FROM lineitem GROUP BY 1 ORDER BY bucket""",
    "q_join_broadcast" ->
      """SELECT r_name, n_name, count(*) AS cnt,
         round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue
         FROM lineitem
         JOIN orders ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey
         JOIN nation ON c_nationkey = n_nationkey
         JOIN region ON n_regionkey = r_regionkey
         GROUP BY r_name, n_name ORDER BY r_name, n_name""",
    "q_join_6way" ->
      """SELECT n_name, count(*) AS cnt,
           floor(sum(l_extendedprice * (1.0 - l_discount)) * 100 + 0.5)
             / 100 AS revenue
         FROM customer
         JOIN orders ON c_custkey = o_custkey
         JOIN lineitem ON o_orderkey = l_orderkey
         JOIN supplier ON l_suppkey = s_suppkey
           AND c_nationkey = s_nationkey
         JOIN nation ON s_nationkey = n_nationkey
         JOIN region ON n_regionkey = r_regionkey
         WHERE r_name = 'ASIA'
           AND o_orderdate >= DATE '1996-01-01'
           AND o_orderdate < DATE '1997-01-01'
         GROUP BY n_name ORDER BY n_name""",
    "q_join_3way" ->
      """SELECT n_name, count(*) AS cnt, round(sum(o_totalprice), 2) AS sum_price
         FROM orders
         JOIN customer ON o_custkey = c_custkey
         JOIN nation ON c_nationkey = n_nationkey
         GROUP BY n_name ORDER BY n_name""",
    "q_join_outer" ->
      """SELECT c_custkey, count(o_orderkey) AS cnt_orders
         FROM customer LEFT JOIN orders
           ON c_custkey = o_custkey AND o_orderdate >= TIMESTAMP '2001-01-01'
         GROUP BY c_custkey ORDER BY c_custkey""",
    "q_join_semi" ->
      """SELECT c_custkey, c_name FROM customer
         WHERE EXISTS (SELECT 1 FROM orders
                       WHERE o_custkey = c_custkey AND o_totalprice > 400000.0)
         ORDER BY c_custkey""",
    "q_join_anti" ->
      """SELECT c_custkey, c_name FROM customer
         WHERE NOT EXISTS (SELECT 1 FROM orders
                           WHERE o_custkey = c_custkey
                             AND o_orderdate >= TIMESTAMP '2001-01-01')
         ORDER BY c_custkey""",
    "q_join_theta" ->
      """SELECT o_orderpriority, count(*) AS cnt,
         round(sum(l_extendedprice), 2) AS sum_price
         FROM lineitem JOIN orders
           ON l_orderkey = o_orderkey
          AND l_shipdate > o_orderdate + INTERVAL 60 DAY
         GROUP BY o_orderpriority ORDER BY o_orderpriority""",
    "q_agg_global" ->
      """SELECT count(*) AS cnt, round(sum(l_quantity), 2) AS sum_qty,
         round(min(l_extendedprice), 2) AS min_price,
         round(max(l_extendedprice), 2) AS max_price,
         floor(avg(l_quantity) * 10000 + 0.5) / 10000 AS avg_qty
         FROM lineitem""",
    "q_agg_distinct" ->
      """SELECT l_returnflag, count(DISTINCT l_partkey) AS nd_part,
         count(DISTINCT l_suppkey) AS nd_supp, count(*) AS cnt
         FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",
    "q_agg_having" ->
      """SELECT l_partkey, count(*) AS cnt, round(sum(l_quantity), 2) AS sum_qty
         FROM lineitem GROUP BY l_partkey HAVING count(*) >= 40
         ORDER BY l_partkey""",
    "q_agg_rollup" ->
      """SELECT coalesce(l_returnflag, 'ALL') AS rf,
         coalesce(l_linestatus, 'ALL') AS ls,
         count(*) AS cnt, round(sum(l_quantity), 2) AS sum_qty
         FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
         ORDER BY rf, ls""",
    "q_agg_cube" ->
      """SELECT coalesce(o_orderstatus, 'ALL') AS st,
         coalesce(o_orderpriority, 'ALL') AS pri,
         count(*) AS cnt, round(sum(o_totalprice), 2) AS sum_price
         FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
         ORDER BY st, pri""",
    "q_window_rank" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, rn, rnk, nt FROM (
           SELECT o_custkey, o_orderkey, o_totalprice,
             row_number() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey) AS rn,
             rank() OVER (PARTITION BY o_custkey
                          ORDER BY o_totalprice DESC, o_orderkey) AS rnk,
             ntile(4) OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey) AS nt
           FROM orders) t
         WHERE rn <= 3 ORDER BY o_custkey, rn""",
    "q_window_range" ->
      """SELECT o_custkey, o_orderkey,
         round(sum(o_totalprice) OVER (PARTITION BY o_custkey
           ORDER BY o_totalprice
           RANGE BETWEEN 50000 PRECEDING AND CURRENT ROW), 2) AS rsum
         FROM orders ORDER BY o_custkey, o_orderkey""",
    "q_setops_all" ->
      """SELECT 'intersect_all' AS op, pri, count(*) AS cnt FROM (
           SELECT o_orderpriority AS pri FROM orders WHERE o_orderstatus = 'F'
           INTERSECT ALL
           SELECT o_orderpriority FROM orders WHERE o_totalprice > 100000.0) a
         GROUP BY pri
         UNION ALL
         SELECT 'except_all' AS op, pri, count(*) AS cnt FROM (
           SELECT o_orderpriority AS pri FROM orders WHERE o_orderstatus = 'F'
           EXCEPT ALL
           SELECT o_orderpriority FROM orders WHERE o_totalprice > 100000.0) b
         GROUP BY pri
         ORDER BY op, pri""",
    "q_percentile" ->
      """SELECT l_returnflag,
         floor(quantile_cont(l_quantity, 0.5) * 10000 + 0.5) / 10000 AS p50,
         floor(quantile_cont(l_quantity, 0.9) * 10000 + 0.5) / 10000 AS p90,
         count(*) AS cnt
         FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",
    "q_pivot" ->
      """SELECT user_id,
         count(*) FILTER (event_type = 'click') AS click,
         count(*) FILTER (event_type = 'error') AS error,
         count(*) FILTER (event_type = 'purchase') AS purchase,
         count(*) FILTER (event_type = 'signup') AS signup,
         count(*) FILTER (event_type = 'view') AS view
         FROM events GROUP BY user_id ORDER BY user_id""",
    "q_window_running" ->
      """SELECT o_custkey, o_orderkey,
         round(sum(o_totalprice) OVER (
           PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS run_sum
         FROM orders ORDER BY o_custkey, o_orderkey""",
    "q_window_lag" ->
      """SELECT event_id, user_id,
         epoch_us(ts) - lag(epoch_us(ts), 1) OVER
           (PARTITION BY user_id ORDER BY ts, event_id) AS gap_us,
         lead(event_type, 1) OVER
           (PARTITION BY user_id ORDER BY ts, event_id) AS next_type
         FROM events ORDER BY event_id""",
    "q_union" ->
      """SELECT k, count(*) AS cnt FROM (
           SELECT c_nationkey AS k FROM customer
           UNION ALL SELECT s_nationkey AS k FROM supplier) t
         GROUP BY k ORDER BY k""",
    "q_intersect_except" ->
      """SELECT 'intersect' AS op, k FROM
           (SELECT c_nationkey AS k FROM customer
            INTERSECT SELECT s_nationkey FROM supplier) a
         UNION ALL
         SELECT 'except' AS op, k FROM
           (SELECT c_nationkey AS k FROM customer
            EXCEPT SELECT s_nationkey FROM supplier) b
         ORDER BY op, k""",
    "q_str_funcs" ->
      """SELECT p_partkey, upper(p_name) AS up, substring(p_name, 1, 4) AS sub,
         length(p_name) AS len, replace(p_name, ' ', '_') AS rep,
         concat(p_brand, ':', p_type) AS cat,
         regexp_extract(p_name, '^([a-z]+)', 1) AS fw
         FROM part ORDER BY p_partkey""",
    "q_date_funcs" ->
      """SELECT year(o_orderdate) AS y, month(o_orderdate) AS m,
         count(*) AS cnt, min(o_orderdate) AS min_d,
         min(date_trunc('month', o_orderdate)) AS first_day,
         min(o_orderdate + INTERVAL 30 DAY) AS plus30,
         dayofweek(min(o_orderdate)) + 1 AS dow_min
         FROM orders GROUP BY 1, 2 ORDER BY y, m""",
    "q_math_funcs" ->
      """SELECT p_partkey, round(sqrt(p_retailprice), 4) AS sq,
         round(ln(p_retailprice + 1), 4) AS lg,
         CAST(p_size AS BIGINT) * p_size AS sz2,
         CAST(abs(-p_size) AS BIGINT) AS ab,
         p_partkey % 7 AS md,
         CAST(floor(p_retailprice) AS BIGINT) AS fl,
         CAST(ceil(p_retailprice) AS BIGINT) AS ce
         FROM part ORDER BY p_partkey""",
    "q_json_extract" ->
      """SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
         count(*) AS cnt, round(sum(value), 2) AS sum_value
         FROM events GROUP BY 1 ORDER BY k""",
    "q_array_funcs" ->
      """SELECT vec_id, len(embedding) AS dim,
         round(CAST(embedding[1] AS DOUBLE), 4) AS first,
         round(sqrt(list_sum(list_transform(embedding,
           x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))), 4) AS l2norm,
         round(CAST(list_max(embedding) AS DOUBLE), 4) AS maxe
         FROM embeddings ORDER BY vec_id"""
  )
}
