package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** T2 relational surface, round-3 widening (SURVEY §2.2–§2.8 extensions):
  * subqueries (EXISTS / IN / correlated scalar), LATERAL join, GROUPING
  * SETS, window navigation functions, UNPIVOT, FILTER-clause aggregates,
  * and ordered string aggregation.
  *
  * The subquery/lateral keys deliberately go through `spark.sql` on the
  * registered views: the point is to prove the engine's *SQL surface*
  * (the reference's users submit SQL strings — SURVEY §3.1), and Catalyst's
  * decorrelation (RewriteCorrelatedScalarSubquery, DecorrelateInnerQuery)
  * turns each into the same join/aggregate plans the DataFrame API would
  * produce — no per-row re-execution, so they scale like ordinary joins.
  */
object RelationalExt {
  private def T(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.table(s, dir, n)

  /** Register views then run a SQL-surface query. */
  private def sql(s: SparkSession, dir: String, q: String): DataFrame = {
    Tables.load(s, dir)
    s.sql(q)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Correlated EXISTS — planned as a left-semi join (one shuffle per
    // side on l_orderkey at scale; no nested-loop anywhere).
    "q_subquery_exists" -> ((s, dir) => sql(s, dir,
      """SELECT o_orderkey, o_totalprice FROM orders o
         WHERE EXISTS (SELECT 1 FROM lineitem l
                       WHERE l.l_orderkey = o.o_orderkey
                         AND l.l_quantity > 45)
         ORDER BY o_orderkey""")),

    // Uncorrelated IN — semi join against the subquery's distinct keys.
    "q_subquery_in" -> ((s, dir) => sql(s, dir,
      """SELECT c_mktsegment, count(*) AS cnt FROM customer
         WHERE c_custkey IN (SELECT o_custkey FROM orders
                             WHERE o_orderstatus = 'F')
         GROUP BY c_mktsegment ORDER BY c_mktsegment""")),

    // Correlated scalar subquery with aggregate — decorrelated to
    // (orders ⋈ per-customer avg): one extra aggregation, not N queries.
    "q_subquery_scalar" -> ((s, dir) => sql(s, dir,
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders o
         WHERE o_totalprice > 1.5 * (SELECT avg(o_totalprice)
                                     FROM orders o2
                                     WHERE o2.o_custkey = o.o_custkey)
         ORDER BY o_orderkey""")),

    // LATERAL correlated subquery with ORDER BY + LIMIT (top-N per group)
    // — Catalyst decorrelates to a ranked window, so the per-group LIMIT
    // is one pass, not a loop over groups.
    "q_lateral" -> ((s, dir) => sql(s, dir,
      """SELECT t.seg, l.o_orderkey, l.o_totalprice
         FROM (SELECT DISTINCT c_mktsegment AS seg FROM customer) t,
         LATERAL (SELECT o.o_orderkey, o.o_totalprice
                  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
                  WHERE c.c_mktsegment = t.seg
                  ORDER BY o.o_totalprice DESC, o.o_orderkey LIMIT 3) l
         ORDER BY t.seg, l.o_totalprice DESC, l.o_orderkey""")),

    // A5c — explicit GROUPING SETS with grouping() marker (rollup/cube are
    // the fixed-shape cousins, declared separately).
    "q_agg_gsets" -> ((s, dir) => sql(s, dir,
      """SELECT coalesce(l_returnflag, 'ALL') AS rf,
                coalesce(l_linestatus, 'ALL') AS ls,
                CAST(grouping(l_returnflag) AS BIGINT) AS g_rf,
                count(*) AS cnt, round(sum(l_quantity), 2) AS sum_qty
         FROM lineitem
         GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
                                 (l_returnflag), ())
         ORDER BY rf, ls""")),

    // W5 — navigation functions. Two frames on one sort: rank-family
    // (percent_rank/cume_dist) use the default running frame; value
    // navigation (first/last/nth) uses the full-partition rows frame.
    // Single window sort at scale — Spark collapses same-spec windows.
    "q_window_nav" -> ((s, dir) => {
      val wOrd = Window.partitionBy("o_custkey")
        .orderBy(desc("o_totalprice"), asc("o_orderkey"))
      val wFull = wOrd.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing)
      T(s, dir, "orders")
        .withColumn("fv", first("o_totalprice").over(wFull))
        .withColumn("lv", last("o_totalprice").over(wFull))
        .withColumn("nv2", nth_value(col("o_totalprice"), 2).over(wFull))
        .withColumn("pr", fround(percent_rank().over(wOrd), 6))
        .withColumn("cd", fround(cume_dist().over(wOrd), 6))
        .select("o_custkey", "o_orderkey", "o_totalprice",
          "fv", "lv", "nv2", "pr", "cd")
        .orderBy("o_custkey", "o_orderkey")
    }),

    // Wide→long UNPIVOT (melt) — constant-width expand, no shuffle at all
    // until the final presentation sort.
    "q_unpivot" -> ((s, dir) => {
      T(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber").cast("long"),
          col("l_quantity").as("qty"), col("l_extendedprice").as("price"),
          col("l_discount").as("disc"))
        .unpivot(Array(col("l_orderkey"), col("l_linenumber")),
          Array(col("qty"), col("price"), col("disc")), "metric", "value")
        // (l_orderkey, l_linenumber) is NOT unique in this synthetic data
        // (1161 dup pairs at sf0.001) — value completes the total order.
        .orderBy("l_orderkey", "l_linenumber", "metric", "value")
    }),

    // FILTER-clause aggregates — conditional aggregation in one pass over
    // the fact table (the idiomatic replacement for N self-joins).
    "q_agg_filter" -> ((s, dir) => sql(s, dir,
      """SELECT l_returnflag, count(*) AS cnt,
                count(*) FILTER (WHERE l_discount > 0.05) AS hi_disc,
                round(sum(l_quantity) FILTER (WHERE l_tax > 0.04), 2)
                  AS qty_hi_tax,
                count(*) FILTER (WHERE l_quantity >= 25
                                   AND l_linestatus = 'F') AS big_f
         FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")),

    // F6 — map/struct functions with an oracle: parse events.props into a
    // map (from_json), read keys/values/size, route fields through a
    // struct, aggregate. Output is flat so the cross-engine compare sees
    // plain columns; the map/struct work happens inside the plan (all
    // codegen — from_json and map ops are native expressions).
    "q_map_struct" -> ((s, dir) => {
      T(s, dir, "events")
        .withColumn("m", from_json(col("props"),
          org.apache.spark.sql.types.MapType(
            org.apache.spark.sql.types.StringType,
            org.apache.spark.sql.types.LongType)))
        .withColumn("st",
          struct(col("event_type").as("et"), col("user_id").as("uid")))
        .select(
          col("st").getField("et").as("et"),
          element_at(map_keys(col("m")), 1).as("k1"),
          element_at(col("m"), "k").as("kv"),
          size(col("m")).cast("long").as("nkeys"))
        .groupBy("et")
        .agg(count(lit(1)).as("cnt"), sum("kv").as("sum_kv"),
          max("nkeys").as("max_keys"), min("k1").as("min_key"))
        .orderBy("et")
    }),

    // F6b — VARIANT (Spark 4's binary semi-structured type, r6): parse
    // the JSON props into a VARIANT once, then typed-path extraction with
    // variant_get / null-safe try_variant_get. Same answers as string
    // json_extract, but at 100 TB VARIANT is the right column type: the
    // binary encoding parses once at ingest (not per expression), presses
    // into shredded parquet storage, and keeps extraction in codegen.
    "q_variant_extract" -> ((s, dir) => {
      T(s, dir, "events")
        .withColumn("v", expr("parse_json(props)"))
        .withColumn("k", expr("variant_get(v, '$.k', 'int')"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("cnt"),
          sum("k").as("sum_k"),
          max("k").as("max_k"),
          count(expr("try_variant_get(v, '$.missing', 'int')"))
            .as("n_missing"))
        .orderBy("event_type")
    }),

    // A5b — GROUPING()/grouping-id introspection: the bits that tell a
    // rollup consumer WHICH level a row belongs to (the 'ALL' coalesce
    // trick is lossy when a real value collides with the sentinel).
    "q_grouping_id" -> ((s, dir) => {
      T(s, dir, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("cnt"),
          grouping("l_returnflag").cast("long").as("g_rf"),
          grouping("l_linestatus").cast("long").as("g_ls"))
        .select(coalesce(col("l_returnflag"), lit("ALL")).as("rf"),
          coalesce(col("l_linestatus"), lit("ALL")).as("ls"),
          col("g_rf"), col("g_ls"),
          (col("g_rf") * 2 + col("g_ls")).as("gid"), col("cnt"))
        .orderBy("rf", "ls", "gid")
    }),

    // W7 — distribution window functions: percent_rank + cume_dist per
    // nation. The ordering key (acctbal, custkey) is unique, so both are
    // deterministic rank ratios of exact integers; one WindowExec pass.
    "q_window_dist" -> ((s, dir) => {
      val w = Window.partitionBy("c_nationkey")
        .orderBy(asc("c_acctbal"), asc("c_custkey"))
      T(s, dir, "customer")
        .select(col("c_custkey"), col("c_nationkey"),
          fround(percent_rank().over(w), 6).as("pr"),
          fround(cume_dist().over(w), 6).as("cd"))
        .orderBy("c_custkey")
    }),

    // Ordered string aggregation (listagg) — deterministic via explicit
    // sort of the collected set; map-side partial collect keeps the
    // shuffle at one row per (lang) group.
    "q_string_agg" -> ((s, dir) => {
      T(s, dir, "documents")
        .select("lang", "source").distinct()
        .groupBy("lang")
        .agg(array_join(array_sort(collect_list("source")), ",")
            .as("sources"),
          count(lit(1)).as("n_src"))
        .orderBy("lang")
    })
  )

  val oracles: Map[String, String] = Map(
    "q_grouping_id" ->
      """SELECT coalesce(l_returnflag, 'ALL') AS rf,
           coalesce(l_linestatus, 'ALL') AS ls,
           CAST(GROUPING(l_returnflag) AS BIGINT) AS g_rf,
           CAST(GROUPING(l_linestatus) AS BIGINT) AS g_ls,
           CAST(GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus)
                AS BIGINT) AS gid,
           count(*) AS cnt
         FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
         ORDER BY rf, ls, gid""",
    "q_window_dist" ->
      """SELECT c_custkey, c_nationkey,
           floor(percent_rank() OVER w * 1e6 + 0.5) / 1e6 AS pr,
           floor(cume_dist() OVER w * 1e6 + 0.5) / 1e6 AS cd
         FROM customer
         WINDOW w AS (PARTITION BY c_nationkey
                      ORDER BY c_acctbal, c_custkey)
         ORDER BY c_custkey""",
    "q_subquery_exists" ->
      """SELECT o_orderkey, o_totalprice FROM orders o
         WHERE EXISTS (SELECT 1 FROM lineitem l
                       WHERE l.l_orderkey = o.o_orderkey
                         AND l.l_quantity > 45)
         ORDER BY o_orderkey""",
    "q_subquery_in" ->
      """SELECT c_mktsegment, count(*) AS cnt FROM customer
         WHERE c_custkey IN (SELECT o_custkey FROM orders
                             WHERE o_orderstatus = 'F')
         GROUP BY c_mktsegment ORDER BY c_mktsegment""",
    "q_subquery_scalar" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders o
         WHERE o_totalprice > 1.5 * (SELECT avg(o_totalprice)
                                     FROM orders o2
                                     WHERE o2.o_custkey = o.o_custkey)
         ORDER BY o_orderkey""",
    "q_lateral" ->
      """SELECT t.seg, l.o_orderkey, l.o_totalprice
         FROM (SELECT DISTINCT c_mktsegment AS seg FROM customer) t,
         LATERAL (SELECT o.o_orderkey, o.o_totalprice
                  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
                  WHERE c.c_mktsegment = t.seg
                  ORDER BY o.o_totalprice DESC, o.o_orderkey LIMIT 3) l
         ORDER BY t.seg, l.o_totalprice DESC, l.o_orderkey""",
    "q_agg_gsets" ->
      """SELECT coalesce(l_returnflag, 'ALL') AS rf,
                coalesce(l_linestatus, 'ALL') AS ls,
                CAST(grouping(l_returnflag) AS BIGINT) AS g_rf,
                count(*) AS cnt, round(sum(l_quantity), 2) AS sum_qty
         FROM lineitem
         GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
                                 (l_returnflag), ())
         ORDER BY rf, ls""",
    "q_window_nav" ->
      """SELECT o_custkey, o_orderkey, o_totalprice,
                first_value(o_totalprice) OVER w2 AS fv,
                last_value(o_totalprice) OVER w2 AS lv,
                nth_value(o_totalprice, 2) OVER w2 AS nv2,
                floor(percent_rank() OVER w1 * 1000000 + 0.5) / 1000000
                  AS pr,
                floor(cume_dist() OVER w1 * 1000000 + 0.5) / 1000000 AS cd
         FROM orders
         WINDOW w1 AS (PARTITION BY o_custkey
                       ORDER BY o_totalprice DESC, o_orderkey),
                w2 AS (PARTITION BY o_custkey
                       ORDER BY o_totalprice DESC, o_orderkey
                       ROWS BETWEEN UNBOUNDED PRECEDING
                                AND UNBOUNDED FOLLOWING)
         ORDER BY o_custkey, o_orderkey""",
    "q_unpivot" ->
      """SELECT l_orderkey, l_linenumber, metric, value FROM
         (UNPIVOT (SELECT l_orderkey, CAST(l_linenumber AS BIGINT)
                     AS l_linenumber, l_quantity AS qty,
                     l_extendedprice AS price, l_discount AS disc
                   FROM lineitem)
          ON qty, price, disc INTO NAME metric VALUE value)
         ORDER BY l_orderkey, l_linenumber, metric, value""",
    "q_agg_filter" ->
      """SELECT l_returnflag, count(*) AS cnt,
                count(*) FILTER (WHERE l_discount > 0.05) AS hi_disc,
                round(sum(l_quantity) FILTER (WHERE l_tax > 0.04), 2)
                  AS qty_hi_tax,
                count(*) FILTER (WHERE l_quantity >= 25
                                   AND l_linestatus = 'F') AS big_f
         FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",
    "q_variant_extract" ->
      """SELECT event_type, count(*) AS cnt,
           CAST(sum(CAST(props->>'k' AS INT)) AS BIGINT) AS sum_k,
           max(CAST(props->>'k' AS INT)) AS max_k,
           CAST(count(json_extract(props, '$.missing')) AS BIGINT)
             AS n_missing
         FROM events GROUP BY event_type ORDER BY event_type""",
    "q_map_struct" ->
      """SELECT event_type AS et, count(*) AS cnt,
                CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT))
                  AS BIGINT) AS sum_kv,
                max(CAST(len(json_keys(props)) AS BIGINT)) AS max_keys,
                min(json_keys(props)[1]) AS min_key
         FROM events GROUP BY event_type ORDER BY et""",
    "q_string_agg" ->
      """SELECT lang, string_agg(source, ',' ORDER BY source) AS sources,
                count(*) AS n_src
         FROM (SELECT DISTINCT lang, source FROM documents)
         GROUP BY lang ORDER BY lang"""
  )
}
