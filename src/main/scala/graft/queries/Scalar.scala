package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** T2 scalar/window widening, round 4 (SURVEY §2.7 F-family + §2.5 W):
  * IGNORE NULLS window navigation, regular-expression functions, null
  * tri-state surface (try_cast / nullif / null-safe equality), exact
  * DECIMAL aggregation, and bitwise operators — each with a value-exact
  * DuckDB oracle. All row-level projections are single-pass codegen
  * (no shuffle except the presentation sort); the decimal aggregate is
  * the standard two-phase hash agg. */
object Scalar {
  private def T(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.table(s, dir, n)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // W6 — IGNORE NULLS navigation: carry the last non-null metric
    // forward per user (gap-fill), and the previous non-null via lag.
    // One window sort; both frames share the WindowExec.
    "q_window_ignore_nulls" -> ((s, dir) => {
      val wOrd = Window.partitionBy("user_id")
        .orderBy(asc("ts"), asc("event_id"))
      val wRun = wOrd.rowsBetween(
        Window.unboundedPreceding, Window.currentRow)
      T(s, dir, "events")
        .withColumn("v",
          when(col("event_type") === "view", lit(null)).otherwise(col("value")))
        .withColumn("lnn", last(col("v"), ignoreNulls = true).over(wRun))
        .withColumn("pnn", lag(col("v"), 1, null, ignoreNulls = true).over(wOrd))
        .select("event_id", "lnn", "pnn")
        .orderBy("event_id")
    }),

    // F8 — regex surface: extract / global replace / match / extract_all.
    // Patterns are RE2-and-Java-portable (character classes only).
    "q_regex_funcs" -> ((s, dir) => {
      T(s, dir, "documents")
        .select(col("doc_id"),
          regexp_extract(col("text"), "([A-Za-z]+)", 1).as("w"),
          length(regexp_replace(col("text"), "[aeiou]", ""))
            .cast("long").as("nl"),
          col("text").rlike("[0-9]").cast("long").as("hasnum"),
          expr("size(regexp_extract_all(text, '[A-Za-z]+', 0))")
            .cast("long").as("nwords"))
        .orderBy("doc_id")
    }),

    // F9 — null tri-state: try_cast (error→null), nullif, null-safe
    // equality (Spark `<=>` == DuckDB IS NOT DISTINCT FROM), coalesce.
    "q_null_safety" -> ((s, dir) => {
      T(s, dir, "customer")
        .select(col("c_custkey"),
          expr("try_cast(right(c_name, 2) AS INT)").as("tc"),
          expr("nullif(c_mktsegment, 'BUILDING') <=> " +
            "nullif(c_mktsegment, 'AUTOMOBILE')").as("ns"),
          coalesce(expr("nullif(c_mktsegment, 'BUILDING')"), lit("NONE"))
            .as("co"))
        .orderBy("c_custkey")
    }),

    // F10 — exact money aggregation: sum in DECIMAL, not double — the
    // 100 TB answer to float drift (decimal sums are associative, so
    // partial aggregation stays exact across any partitioning).
    "q_decimal_exact" -> ((s, dir) => {
      T(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(sum(col("l_extendedprice").cast("decimal(18,2)"))
          .cast("decimal(20,2)").as("sd"),
          count(lit(1)).as("cnt"))
        .orderBy("l_returnflag")
    }),

    // F12 — array higher-order functions over the embedding column:
    // transform (cast), aggregate (fold-sum — the 0.0 init is exact, so
    // the left fold is bit-identical to DuckDB's list_reduce), filter
    // (count positives), exists (any element past a threshold), zip_with
    // (elementwise self-product → L2 norm). All map-side, zero shuffle.
    "q_higher_order" -> ((s, dir) => {
      val v = transform(col("embedding"), _.cast("double"))
      T(s, dir, "embeddings")
        .select(col("vec_id"),
          fround(aggregate(v, lit(0.0), (a, x) => a + x), 4).as("vsum"),
          size(filter(col("embedding"), _ > 0)).cast("long").as("n_pos"),
          exists(col("embedding"), _ > 0.9).cast("long").as("has_big"),
          fround(sqrt(aggregate(zip_with(v, v, (a, b) => a * b),
            lit(0.0), (a, x) => a + x)), 4).as("l2"))
        .orderBy("vec_id")
    }),

    // F13 — array SET operations (intersect/union/except) over the head
    // and tail token windows of each doc. Results are emitted as sorted,
    // comma-joined SETS: Spark's array_intersect/union/except dedup with
    // first-argument order and DuckDB's list ops make no dedup promise,
    // so both sides canonicalize (distinct + sort) before comparing.
    "q_array_setops" -> ((s, dir) => {
      val ws = split(col("text"), " ")
      val a = slice(ws, 1, 8)
      val b = slice(ws, greatest(size(ws) - 7, lit(1)), lit(8))
      T(s, dir, "documents")
        .select(col("doc_id"),
          array_join(array_sort(array_intersect(a, b)), ",").as("inter"),
          array_join(array_sort(array_union(a, b)), ",").as("uni"),
          array_join(array_sort(array_except(a, b)), ",").as("diff"),
          array_contains(a, "the").cast("long").as("has_the"))
        .orderBy("doc_id")
    }),

    // F11 — bitwise operators (&, |, ^, shift, popcount).
    "q_bitwise" -> ((s, dir) => {
      T(s, dir, "events")
        .select(col("event_id"),
          expr("event_id & 255").as("ba"),
          expr("event_id | 4096").as("bo"),
          expr("event_id ^ 255").as("bx"),
          expr("shiftleft(event_id, 3)").as("bs"),
          expr("bit_count(event_id)").cast("long").as("bc"))
        .orderBy("event_id")
    })
  )

  val oracles: Map[String, String] = Map(
    "q_array_setops" ->
      """WITH t AS (
           SELECT doc_id, string_split(text, ' ') AS w FROM documents),
         s AS (
           SELECT doc_id, list_slice(w, 1, 8) AS a,
             list_slice(w, greatest(len(w) - 7, 1), len(w)) AS b
           FROM t)
         SELECT doc_id,
           -- DuckDB array_to_string([]) is NULL; Spark array_join([]) is ''
           coalesce(array_to_string(list_sort(list_distinct(
             list_filter(a, x -> list_contains(b, x)))), ','), '') AS inter,
           coalesce(array_to_string(list_sort(list_distinct(
             list_concat(a, b))), ','), '') AS uni,
           coalesce(array_to_string(list_sort(list_distinct(
             list_filter(a, x -> NOT list_contains(b, x)))), ','), '') AS diff,
           CAST(list_contains(a, 'the') AS BIGINT) AS has_the
         FROM s ORDER BY doc_id""",
    "q_higher_order" ->
      """WITH v AS (
           SELECT vec_id,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vd,
             embedding
           FROM embeddings)
         SELECT vec_id,
           floor(list_reduce(list_prepend(0.0, vd), (a, x) -> a + x)
                 * 1e4 + 0.5) / 1e4 AS vsum,
           CAST(len(list_filter(embedding, x -> x > 0)) AS BIGINT) AS n_pos,
           CAST(len(list_filter(embedding, x -> x > 0.9)) > 0 AS BIGINT)
             AS has_big,
           floor(sqrt(list_reduce(list_prepend(0.0,
                 list_transform(vd, x -> x * x)), (a, x) -> a + x))
                 * 1e4 + 0.5) / 1e4 AS l2
         FROM v ORDER BY vec_id""",
    "q_window_ignore_nulls" ->
      """SELECT event_id,
                last_value(CASE WHEN event_type = 'view' THEN NULL
                                ELSE value END IGNORE NULLS)
                  OVER (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS lnn,
                lag(CASE WHEN event_type = 'view' THEN NULL
                         ELSE value END IGNORE NULLS)
                  OVER (PARTITION BY user_id ORDER BY ts, event_id) AS pnn
         FROM events ORDER BY event_id""",
    "q_regex_funcs" ->
      """SELECT doc_id,
                regexp_extract(text, '([A-Za-z]+)', 1) AS w,
                CAST(length(regexp_replace(text, '[aeiou]', '', 'g'))
                  AS BIGINT) AS nl,
                CAST(regexp_matches(text, '[0-9]') AS BIGINT) AS hasnum,
                CAST(len(regexp_extract_all(text, '[A-Za-z]+')) AS BIGINT)
                  AS nwords
         FROM documents ORDER BY doc_id""",
    "q_null_safety" ->
      """SELECT c_custkey,
                TRY_CAST(right(c_name, 2) AS INTEGER) AS tc,
                nullif(c_mktsegment, 'BUILDING') IS NOT DISTINCT FROM
                  nullif(c_mktsegment, 'AUTOMOBILE') AS ns,
                coalesce(nullif(c_mktsegment, 'BUILDING'), 'NONE') AS co
         FROM customer ORDER BY c_custkey""",
    "q_decimal_exact" ->
      """SELECT l_returnflag,
                CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)))
                  AS DECIMAL(20,2)) AS sd,
                count(*) AS cnt
         FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",
    "q_bitwise" ->
      """SELECT event_id,
                event_id & 255 AS ba,
                event_id | 4096 AS bo,
                xor(event_id, 255) AS bx,
                event_id << 3 AS bs,
                CAST(bit_count(event_id) AS BIGINT) AS bc
         FROM events ORDER BY event_id"""
  )
}
