package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** T1 core relational surface (SURVEY §2 tier T1).
  *
  * Reference: Samsung/spark-cep delegates projection/filter/join/agg to
  * Catalyst (SURVEY §2.2–§2.4 [R]); we express each as a declarative
  * DataFrame plan so Spark 4's optimizer (pushdown, pruning, whole-stage
  * codegen, AQE) does the physical work — nothing here materializes on the
  * driver, and every plan scales by partition count alone.
  *
  * Determinism contract (SURVEY §7.5): every query ends in a total order on
  * a unique key set, aggregated doubles are rounded, and column names match
  * the DuckDB oracle exactly.
  */
object Core {
  private def T(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.table(s, dir, n)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // S1/P1 — projection with arithmetic; scan should prune to 5 columns.
    "q_scan_project" -> ((s, dir) => {
      T(s, dir, "lineitem")
        .select(
          col("l_orderkey"), col("l_linenumber"),
          // unrounded: one IEEE multiply of identical doubles is bit-exact
          // in both engines; rounding would ADD a boundary divergence.
          (col("l_extendedprice") * (lit(1.0) - col("l_discount")))
            .as("revenue"),
          col("l_returnflag"))
        .orderBy("l_orderkey", "l_linenumber")
    }),

    // P2 — BETWEEN + IN + LIKE + IS NOT NULL, all pushdown-eligible.
    "q_filter_pred" -> ((s, dir) => {
      T(s, dir, "lineitem")
        .filter(
          col("l_shipdate").between(lit("1996-01-01"), lit("1996-12-31")) &&
          col("l_returnflag").isin("A", "R") &&
          col("l_quantity").between(5, 25) &&
          col("l_linestatus").like("F%") &&
          col("l_extendedprice").isNotNull)
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag",
          "l_shipdate")
        .orderBy("l_orderkey", "l_linenumber")
    }),

    // J1 — inner equi join; at 100 TB this is a shuffle join on o_custkey;
    // AQE picks broadcast when customer fits (it does at bench SF).
    "q_join_inner" -> ((s, dir) => {
      val o = T(s, dir, "orders")
      val c = T(s, dir, "customer")
      o.join(c, o("o_custkey") === c("c_custkey"))
        .select(col("o_orderkey"), col("c_name"), col("c_mktsegment"),
          col("o_totalprice"))
        .orderBy("o_orderkey")
    }),

    // A1 — TPC-H-Q1-style grouped agg with partial (map-side) aggregation.
    "q_agg_groupby" -> ((s, dir) => {
      T(s, dir, "lineitem")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          round(sum("l_quantity"), 2).as("sum_qty"),
          round(sum("l_extendedprice"), 2).as("sum_base"),
          round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2)
            .as("sum_disc_price"),
          fround(avg("l_quantity"), 2).as("avg_qty"),
          count(lit(1)).as("cnt"))
        .orderBy("l_returnflag", "l_linestatus")
    }),

    // O1/O2 — top-k: Catalyst plans TakeOrderedAndProject (no full sort).
    "q_topk" -> ((s, dir) => {
      T(s, dir, "lineitem")
        .select("l_orderkey", "l_linenumber", "l_extendedprice")
        .orderBy(desc("l_extendedprice"), asc("l_orderkey"),
          asc("l_linenumber"))
        .offset(10)
        .limit(100)
    }),

    // C1 — FLAGSHIP: event-time tumbling window aggregation. Same plan
    // works verbatim as a Structured Streaming query (see graft.streaming).
    "q_window_tumbling" -> ((s, dir) => {
      T(s, dir, "events")
        .groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("cnt"), round(sum("value"), 2).as("sum_value"))
        .select(col("window.start").as("ws"), col("event_type"), col("cnt"),
          col("sum_value"))
        .orderBy("ws", "event_type")
    })
  )

  val oracles: Map[String, String] = Map(
    "q_scan_project" ->
      """SELECT l_orderkey, l_linenumber,
         l_extendedprice * (1.0 - l_discount) AS revenue,
         l_returnflag
         FROM lineitem ORDER BY l_orderkey, l_linenumber""",
    "q_filter_pred" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag, l_shipdate
         FROM lineitem
         WHERE l_shipdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1996-12-31'
           AND l_returnflag IN ('A','R')
           AND l_quantity BETWEEN 5 AND 25
           AND l_linestatus LIKE 'F%'
           AND l_extendedprice IS NOT NULL
         ORDER BY l_orderkey, l_linenumber""",
    "q_join_inner" ->
      """SELECT o_orderkey, c_name, c_mktsegment, o_totalprice
         FROM orders JOIN customer ON o_custkey = c_custkey
         ORDER BY o_orderkey""",
    "q_agg_groupby" ->
      """SELECT l_returnflag, l_linestatus,
         round(sum(l_quantity), 2) AS sum_qty,
         round(sum(l_extendedprice), 2) AS sum_base,
         round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS sum_disc_price,
         floor(avg(l_quantity) * 100 + 0.5) / 100 AS avg_qty,
         count(*) AS cnt
         FROM lineitem GROUP BY l_returnflag, l_linestatus
         ORDER BY l_returnflag, l_linestatus""",
    "q_topk" ->
      """SELECT l_orderkey, l_linenumber, l_extendedprice
         FROM lineitem
         ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
         LIMIT 100 OFFSET 10""",
    "q_window_tumbling" ->
      """SELECT date_trunc('hour', ts) AS ws, event_type,
         count(*) AS cnt, round(sum(value), 2) AS sum_value
         FROM events GROUP BY 1, 2 ORDER BY ws, event_type"""
  )
}
