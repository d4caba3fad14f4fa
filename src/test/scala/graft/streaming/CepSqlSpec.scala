package graft.streaming

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** Reference-dialect SQL strings must run unchanged through the adapter
  * and agree with the native window() formulation. */
class CepSqlSpec extends SparkSpec {

  private def rows(df: org.apache.spark.sql.DataFrame): Set[Seq[Any]] =
    df.collect().map(_.toSeq).toSet

  test("sliding OVER(WINDOW,SLIDE) == native window() aggregation") {
    Tables.load(spark, sf)
    // the translated query's output schema is the user's SELECT list (the
    // window key groups but is not projected) → compare as multisets
    val got = CepSql.sql(spark,
      """SELECT event_type, COUNT(*) AS cnt FROM events
         OVER (WINDOW '1800' SECONDS, SLIDE '600' SECONDS)
         GROUP BY event_type""")
      .collect().map(_.toSeq).toSeq.sortBy(_.toString)
    val want = Tables.table(spark, sf, "events")
      .groupBy(window(col("ts"), "1800 seconds", "600 seconds"),
        col("event_type"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("event_type"), col("cnt"))
      .collect().map(_.toSeq).toSeq.sortBy(_.toString)
    assert(got === want)
  }

  test("tumbling OVER(WINDOW) with no GROUP BY gets one, before ORDER BY") {
    Tables.load(spark, sf)
    val got = CepSql.sql(spark,
      """SELECT COUNT(*) AS cnt FROM events
         OVER (WINDOW '3600' SECONDS) ORDER BY cnt DESC LIMIT 5""")
    val want = Tables.table(spark, sf, "events")
      .groupBy(window(col("ts"), "3600 seconds"))
      .agg(count(lit(1)).as("cnt"))
      .select("cnt").orderBy(desc("cnt")).limit(5)
    assert(got.collect().map(_.getLong(0)).toSeq ===
      want.collect().map(_.getLong(0)).toSeq)
  }

  test("statements without an OVER clause pass through untouched") {
    val q = "SELECT user_id, count(*) FROM events GROUP BY user_id"
    assert(CepSql.translate(q) === q)
  }

  test("WHERE clause survives the rewrite") {
    Tables.load(spark, sf)
    val got = CepSql.sql(spark,
      """SELECT event_type, COUNT(*) AS cnt FROM events
         WHERE event_type = 'click'
         OVER (WINDOW '3600' SECONDS)
         GROUP BY event_type""")
    assert(got.select("event_type").distinct().collect()
      .map(_.getString(0)).toSeq === Seq("click"))
  }

  test("subquery GROUP BY is not the injection target") {
    val q = """SELECT COUNT(*) AS cnt
               FROM (SELECT user_id FROM events GROUP BY user_id) t
               OVER (WINDOW '60' SECONDS)"""
    val t = CepSql.translate(q)
    // inner GROUP BY untouched; a NEW top-level GROUP BY carries the key
    assert(t.contains("GROUP BY user_id)"))
    assert(t.indexOf("window(ts,") > t.indexOf("GROUP BY user_id)"))
  }

  test("keywords inside string literals are ignored") {
    val q = """SELECT COUNT(*) AS cnt FROM events
               WHERE event_type = 'order by limit'
               OVER (WINDOW '60' SECONDS) LIMIT 5"""
    val t = CepSql.translate(q)
    // injected GROUP BY lands before the real LIMIT, after the literal
    assert(t.indexOf("'order by limit'") < t.indexOf("GROUP BY window(ts,"))
    assert(t.indexOf("GROUP BY window(ts,") < t.lastIndexOf("LIMIT 5"))
  }

  test("trailing semicolon: GROUP BY inserted before the ';'") {
    val t = CepSql.translate(
      "SELECT COUNT(*) AS cnt FROM events OVER (WINDOW '60' SECONDS);")
    assert(t.indexOf("GROUP BY window(ts,") < t.lastIndexOf(";"), t)
    Tables.load(spark, sf)
    assert(spark.sql(t).collect().nonEmpty) // and it actually parses
  }

  test("OVER-window in a top-level set operation is rejected") {
    intercept[IllegalArgumentException] {
      CepSql.translate(
        """SELECT event_type, count(*) FROM a GROUP BY event_type
           UNION ALL
           SELECT event_type, count(*) FROM s OVER (WINDOW '60' SECONDS)
           GROUP BY event_type""")
    }
    // ...but UNION inside a subquery is fine (not ambiguous)
    val ok = CepSql.translate(
      """SELECT COUNT(*) AS cnt FROM
         (SELECT 1 AS x UNION ALL SELECT 2 AS x) t
         OVER (WINDOW '60' SECONDS)""")
    assert(ok.contains("GROUP BY window(ts,"))
  }

  test("multiple or nested OVER-window clauses are rejected") {
    intercept[IllegalArgumentException] {
      CepSql.translate(
        """SELECT 1 FROM a OVER (WINDOW '60' SECONDS)
           UNION ALL SELECT 1 FROM b OVER (WINDOW '30' SECONDS)""")
    }
    intercept[IllegalArgumentException] {
      CepSql.translate(
        """SELECT * FROM (SELECT COUNT(*) FROM events
           OVER (WINDOW '60' SECONDS)) t""")
    }
    // ...but the same text inside a string literal is just data
    val q = "SELECT \"OVER (WINDOW '60' SECONDS)\" AS s FROM t"
    assert(CepSql.translate(q) === q)
  }

  test("multi-statement text with an OVER clause is rejected") {
    // the GROUP BY anchor search scans the whole text: with a second
    // ';'-separated statement the injection could land in the WRONG one —
    // loud rejection instead (the injected parser fronts every statement)
    intercept[IllegalArgumentException] {
      CepSql.translate(
        """SELECT event_type FROM t GROUP BY event_type;
           SELECT COUNT(*) AS cnt FROM s OVER (WINDOW '60' SECONDS)""")
    }
    intercept[IllegalArgumentException] {
      CepSql.translate(
        "SELECT COUNT(*) FROM s OVER (WINDOW '60' SECONDS); SELECT 1")
    }
    // a ';' inside a string literal is data, not a statement separator
    val lit = "SELECT ';' AS s, COUNT(*) AS cnt FROM t " +
      "OVER (WINDOW '60' SECONDS)"
    assert(CepSql.translate(lit).contains("GROUP BY window(ts,"))
    // ...and a trailing COMMENT after the final ';' is still one statement
    val cmt = CepSql.translate(
      "SELECT COUNT(*) AS cnt FROM t OVER (WINDOW '60' SECONDS); -- hourly")
    assert(cmt.contains("GROUP BY window(ts,"), cmt)
  }

  test("QUALIFY == wrapped-subquery WHERE; ORDER BY/LIMIT stay outer (r11)") {
    Tables.load(spark, sf)
    val got = CepSql.sql(spark,
      """SELECT user_id, event_id,
                row_number() OVER (PARTITION BY user_id
                  ORDER BY ts, event_id) AS rn
         FROM events QUALIFY rn <= 2 ORDER BY user_id, rn LIMIT 40""")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val want = Tables.table(spark, sf, "events")
      .select(col("user_id"), col("event_id"),
        row_number().over(w).as("rn"))
      .filter(col("rn") <= 2)
      .orderBy("user_id", "rn").limit(40)
    assert(got.collect().map(_.toSeq).toSeq ===
      want.collect().map(_.toSeq).toSeq)
    // the window ORDER BY (inside OVER's parens) is NOT the outer tail:
    // a statement ending at the predicate keeps the whole pred intact
    val t = CepSql.translate(
      "SELECT a, rank() OVER (ORDER BY b) AS r FROM t QUALIFY r = 1")
    assert(t.endsWith("WHERE r = 1"), t)
  }

  test("QUALIFY grammar edges: literals pass, ambiguous forms reject (r11)") {
    // inside a string literal it is data, not a clause
    val lit = "SELECT 'QUALIFY' AS k FROM t"
    assert(CepSql.translate(lit) === lit)
    // inside a subquery
    intercept[IllegalArgumentException] { CepSql.translate(
      "SELECT * FROM (SELECT a, r FROM t QUALIFY r = 1) s") }
    // two clauses
    intercept[IllegalArgumentException] { CepSql.translate(
      "SELECT a FROM t QUALIFY r = 1 QUALIFY q = 2") }
    // combined with the stream OVER (WINDOW …) clause
    intercept[IllegalArgumentException] { CepSql.translate(
      "SELECT COUNT(*) AS c FROM t OVER (WINDOW '60' SECONDS) QUALIFY c > 1") }
    // top-level set operation: wrapped-subquery extent is ambiguous
    intercept[IllegalArgumentException] { CepSql.translate(
      "SELECT a FROM t UNION SELECT a FROM u QUALIFY r = 1") }
    // multi-statement text
    intercept[IllegalArgumentException] { CepSql.translate(
      "SELECT a FROM t QUALIFY r = 1; SELECT 1") }
    // empty predicate
    intercept[IllegalArgumentException] { CepSql.translate(
      "SELECT a FROM t QUALIFY") }
    // bare window call in the predicate needs the alias form
    intercept[IllegalArgumentException] { CepSql.translate(
      "SELECT a FROM t QUALIFY row_number() OVER (ORDER BY a) = 1") }
  }

  test("ASOF JOIN dialect: dispatch == TemporalJoins carry; inner vs " +
      "LEFT; strict >; grammar edges loud (r11)") {
    Tables.load(spark, sf)
    val e = Tables.table(spark, sf, "events")
    e.filter(col("event_type") === "error")
      .select(col("event_id").as("err_id"), col("user_id"),
        col("ts").as("err_ts")).createOrReplaceTempView("asof_l")
    e.filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id"),
        col("ts").as("click_ts")).createOrReplaceTempView("asof_r")
    def direct(strict: Boolean) =
      graft.operators.TemporalJoins.asofJoinBackwardCarry(
        spark.table("asof_l"), spark.table("asof_r"), Seq("user_id"),
        "err_ts", "click_ts", "event_id", strict = strict)
        .select(col("err_id"), col("event_id").as("click_id"))
    val left = CepSql.sql(spark,
      """SELECT e.err_id, c.event_id AS click_id
         FROM asof_l e ASOF LEFT JOIN asof_r c
         ON e.user_id = c.user_id AND e.err_ts >= c.click_ts""")
    assert(left.collect().map(_.toSeq).toSet ===
      direct(strict = false).collect().map(_.toSeq).toSet)
    // inner drops unmatched; strict > drops equal-ts matches
    val inner = CepSql.sql(spark,
      """SELECT e.err_id, c.event_id AS click_id
         FROM asof_l e ASOF JOIN asof_r c
         ON e.user_id = c.user_id AND e.err_ts >= c.click_ts""")
    assert(inner.collect().map(_.toSeq).toSet ===
      direct(strict = false).filter(col("click_id").isNotNull)
        .collect().map(_.toSeq).toSet)
    assert(inner.count() < left.count(),
      "fixture must contain unmatched errors")
    val strictQ = CepSql.sql(spark,
      """SELECT e.err_id, c.event_id AS click_id
         FROM asof_l e ASOF LEFT JOIN asof_r c
         ON e.user_id = c.user_id AND e.err_ts > c.click_ts""")
    assert(strictQ.collect().map(_.toSeq).toSet ===
      direct(strict = true).collect().map(_.toSeq).toSet)
    // ORDER BY + LIMIT apply on the dispatch output
    val top = CepSql.sql(spark,
      """SELECT e.err_id, c.event_id AS click_id
         FROM asof_l e ASOF LEFT JOIN asof_r c
         ON e.user_id = c.user_id AND e.err_ts >= c.click_ts
         ORDER BY err_id DESC LIMIT 3""").collect()
    assert(top.length === 3)
    assert(top.map(_.getLong(0)).toSeq ===
      top.map(_.getLong(0)).sorted(Ordering[Long].reverse).toSeq)
    // translate(): text rewrite rejects loudly; literal form is data
    intercept[IllegalArgumentException] { CepSql.translate(
      "SELECT * FROM a ASOF JOIN b ON a.k = b.k AND a.t >= b.t") }
    val litQ = "SELECT 'ASOF JOIN' AS k FROM t"
    assert(CepSql.translate(litQ) === litQ)
    // sql(): non-disjoint columns, reversed inequality, bad items
    e.select(col("event_id"), col("user_id"), col("ts"))
      .createOrReplaceTempView("asof_clash")
    intercept[IllegalArgumentException] { CepSql.sql(spark,
      """SELECT a.event_id FROM asof_clash a ASOF JOIN asof_clash b
         ON a.user_id = b.user_id AND a.ts >= b.ts""") }
    intercept[IllegalArgumentException] { CepSql.sql(spark,
      """SELECT e.err_id FROM asof_l e ASOF JOIN asof_r c
         ON e.user_id = c.user_id AND c.click_ts >= e.err_ts""") }
    intercept[IllegalArgumentException] { CepSql.sql(spark,
      """SELECT x.err_id FROM asof_l e ASOF JOIN asof_r c
         ON e.user_id = c.user_id AND e.err_ts >= c.click_ts""") }
  }

  test("ASOF JOIN select items resolve per SIDE (r12): right-key refs " +
      "survive the key rename; cross-side refs reject loudly") {
    Tables.load(spark, sf)
    val e = Tables.table(spark, sf, "events")
    e.filter(col("event_type") === "error")
      .select(col("event_id").as("err_id"), col("user_id"),
        col("ts").as("err_ts")).createOrReplaceTempView("asof_l2")
    // right side keys on a DIFFERENT name (uid) — the dispatch renames it
    e.filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id").as("uid"),
        col("ts").as("click_ts")).createOrReplaceTempView("asof_r2")
    // selecting the right key by ITS name must translate across the rename
    val got = CepSql.sql(spark,
      """SELECT e.err_id, c.uid AS right_key, c.event_id AS click_id
         FROM asof_l2 e ASOF JOIN asof_r2 c
         ON e.user_id = c.uid AND e.err_ts >= c.click_ts""")
    assert(got.columns.toSeq === Seq("err_id", "right_key", "click_id"))
    val rows = got.collect()
    assert(rows.nonEmpty)
    // the matched right key equals the left key by the equi-condition:
    // verify the translated column really is the key, not garbage
    val chk = CepSql.sql(spark,
      """SELECT e.user_id AS lk, c.uid AS rk
         FROM asof_l2 e ASOF JOIN asof_r2 c
         ON e.user_id = c.uid AND e.err_ts >= c.click_ts""").collect()
    assert(chk.forall(r => r.getLong(0) == r.getLong(1)))
    // a wrong-side qualified reference must reject, not silently resolve
    intercept[IllegalArgumentException] { CepSql.sql(spark,
      """SELECT e.click_ts FROM asof_l2 e ASOF JOIN asof_r2 c
         ON e.user_id = c.uid AND e.err_ts >= c.click_ts""") }
    intercept[IllegalArgumentException] { CepSql.sql(spark,
      """SELECT c.err_id FROM asof_l2 e ASOF JOIN asof_r2 c
         ON e.user_id = c.uid AND e.err_ts >= c.click_ts""") }
  }

  test("DISTINCT ON dialect: rank-1 rewrite; star select; grammar " +
      "edges loud (r12)") {
    Tables.load(spark, sf)
    // rewrite == the hand-written rank-1 window
    val got = CepSql.sql(spark,
      """SELECT DISTINCT ON (o_custkey) o_custkey, o_orderkey
         FROM orders
         ORDER BY o_custkey, o_totalprice DESC, o_orderkey""")
    val want = spark.sql(
      """SELECT o_custkey, o_orderkey FROM (
           SELECT o_custkey, o_orderkey, o_totalprice,
             row_number() OVER (PARTITION BY o_custkey
               ORDER BY o_totalprice DESC, o_orderkey) AS rn
           FROM orders) WHERE rn = 1
         ORDER BY o_custkey, o_totalprice DESC, o_orderkey""")
    assert(got.columns.toSeq === Seq("o_custkey", "o_orderkey"))
    assert(got.collect().map(_.toSeq).toSeq ===
      want.collect().map(_.toSeq).toSeq)
    assert(got.count() > 0)
    // SELECT * keeps every input column and hides the helper
    val star = CepSql.sql(spark,
      """SELECT DISTINCT ON (o_custkey) * FROM orders
         ORDER BY o_custkey, o_orderkey LIMIT 5""")
    assert(star.columns.contains("o_totalprice") &&
      !star.columns.contains("__graft_don"))
    assert(star.count() === 5)
    // WHERE stays inside the window input (applies BEFORE the pick)
    val filtered = CepSql.sql(spark,
      """SELECT DISTINCT ON (o_custkey) o_custkey, o_orderkey
         FROM orders WHERE o_totalprice < 50000
         ORDER BY o_custkey, o_totalprice DESC, o_orderkey""")
    assert(filtered.count() > 0 && filtered.count() < got.count(),
      "the WHERE must bite inside the window input")
    // grammar edges: no ORDER BY / no tiebreak / keys must lead /
    // subquery / multi-statement / set ops / QUALIFY combo
    def rej(sqlText: String, frag: String): Unit = {
      val e = intercept[IllegalArgumentException] {
        CepSql.translate(sqlText) }
      assert(e.getMessage.contains(frag), s"$sqlText → ${e.getMessage}")
    }
    rej("SELECT DISTINCT ON (k) a FROM t", "ORDER BY is REQUIRED")
    rej("SELECT DISTINCT ON (k) a FROM t ORDER BY k", "tiebreak")
    rej("SELECT DISTINCT ON (k) a FROM t ORDER BY a, k", "lead with")
    rej("SELECT * FROM (SELECT DISTINCT ON (k) a FROM t ORDER BY k, a)",
      "subquery")
    rej("SELECT DISTINCT ON (k) a FROM t ORDER BY k, a; SELECT 1",
      "multi-statement")
    rej("SELECT DISTINCT ON (k) a FROM t ORDER BY k, a UNION SELECT 1",
      "ambiguous")
    rej("SELECT DISTINCT ON (k) a FROM t QUALIFY r = 1 ORDER BY k, a",
      "QUALIFY")
    rej("SELECT DISTINCT ON (k + 1) a FROM t ORDER BY k, a",
      "plain column names")
    // literal text is data, not a clause
    val litQ = "SELECT 'DISTINCT ON' AS k FROM t"
    assert(CepSql.translate(litQ) === litQ)
  }

  test("SELECT * EXCLUDE/REPLACE dialect: schema-aware star expansion; " +
      "edges loud (r12)") {
    Tables.load(spark, sf)
    // plain EXCLUDE drops exactly the named columns, keeps schema order
    val ex = CepSql.sql(spark,
      "SELECT * EXCLUDE (o_orderdate, o_custkey) FROM orders LIMIT 5")
    assert(ex.columns.toSeq ===
      Seq("o_orderkey", "o_orderstatus", "o_totalprice",
        "o_orderpriority"))
    assert(ex.count() === 5)
    // REPLACE swaps the expression in place, keeps the position + name
    val rep = CepSql.sql(spark,
      """SELECT * EXCLUDE (o_orderdate)
             REPLACE (o_totalprice * 2 AS o_totalprice)
         FROM orders ORDER BY o_orderkey LIMIT 3""")
    assert(rep.columns.toSeq ===
      Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderpriority"))
    val wantPrice = spark.sql(
      "SELECT o_totalprice * 2 AS p FROM orders ORDER BY o_orderkey " +
        "LIMIT 3").collect().map(_.getDouble(0)).toSeq
    assert(rep.collect().map(_.getAs[Double]("o_totalprice")).toSeq
      === wantPrice)
    // the WHERE tail passes through and bites
    val flt = CepSql.sql(spark,
      "SELECT * EXCLUDE (o_orderdate) FROM orders " +
        "WHERE o_orderstatus = 'F'")
    assert(flt.count() > 0 &&
      flt.count() < spark.table("orders").count())
    // case-insensitive resolution against the schema
    assert(CepSql.sql(spark,
      "SELECT * EXCLUDE (O_ORDERDATE) FROM orders LIMIT 1")
      .columns.length === 5)
    // the parser-extension path expands too (it has the session)
    assert(CepSql.realExclude(
      "SELECT * EXCLUDE (o_custkey) FROM orders"))
    assert(CepSql.excludeRewrite(spark,
      "SELECT * EXCLUDE (o_custkey) FROM orders")
      .startsWith("SELECT `o_orderkey`"))
    // grammar edges
    def rej(sqlText: String, frag: String): Unit = {
      val e = intercept[IllegalArgumentException] {
        CepSql.sql(spark, sqlText) }
      assert(e.getMessage.contains(frag), s"$sqlText → ${e.getMessage}")
    }
    rej("SELECT * EXCLUDE (no_such) FROM orders", "not a column")
    rej("SELECT * EXCLUDE (o_custkey, o_custkey) FROM orders",
      "duplicate EXCLUDE")
    rej("SELECT * EXCLUDE (o_orderkey, o_custkey, o_orderstatus, " +
      "o_totalprice, o_orderdate, o_orderpriority) FROM orders",
      "every column")
    rej("SELECT * EXCLUDE (o_orderdate) REPLACE (1 AS no_such) " +
      "FROM orders", "not a column")
    rej("SELECT * EXCLUDE (o_custkey) REPLACE (1 AS o_custkey) " +
      "FROM orders", "also EXCLUDEd")
    rej("SELECT * EXCLUDE (o_orderdate) REPLACE (o_totalprice) " +
      "FROM orders", "AS")
    rej("SELECT * EXCLUDE (o_orderdate) FROM orders " +
      "UNION SELECT 1, 2, 3, 4, 5", "ambiguous")
    rej("SELECT * EXCLUDE (o_orderdate) FROM orders; SELECT 1",
      "multi-statement")
    // a literal ';' before a REAL separator must not mask it (ADVICE
    // r12: the guard used to look only at the FIRST ';')
    rej("SELECT * EXCLUDE (o_orderdate) REPLACE (';' AS o_orderpriority) " +
      "FROM orders; SELECT 1", "multi-statement")
    // the star must not silently expand over ONE table of a JOIN or a
    // comma FROM list (ADVICE r12): reject, don't produce wrong columns
    rej("SELECT * EXCLUDE (o_orderdate) FROM orders JOIN customer " +
      "ON o_custkey = c_custkey", "single base table")
    rej("SELECT * EXCLUDE (o_orderdate) FROM orders, customer",
      "single base table")
    rej("SELECT * EXCLUDE (o_orderdate) FROM orders o2 WHERE 1=1",
      "single base table") // bare alias: ambiguous with a second table
    // `AS alias` + plain clause tails still pass through
    assert(CepSql.sql(spark,
      "SELECT * EXCLUDE (o_orderdate) FROM orders AS o2 LIMIT 3")
      .count() === 3)
    rej("SELECT a, * EXCLUDE (b) FROM orders", "accepts exactly")
    // RENAME star modifier (r13): rename-in-place, schema order kept
    val ren = CepSql.sql(spark,
      "SELECT * RENAME (o_orderdate AS odate) FROM orders LIMIT 5")
    assert(ren.columns.toSeq ===
      Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "odate", "o_orderpriority"))
    assert(ren.count() === 5)
    rej("SELECT * RENAME (no_such AS x) FROM orders", "not a column")
    rej("SELECT * RENAME (o_custkey AS x, o_custkey AS y) FROM orders",
      "duplicate RENAME source")
    rej("SELECT * RENAME (o_custkey AS x, o_orderdate AS x) FROM orders",
      "duplicate RENAME target")
    rej("SELECT * RENAME (o_custkey AS o_orderdate) FROM orders",
      "collides")
    rej("SELECT * RENAME (upper(o_orderstatus) AS s) FROM orders",
      "bare column names") // computed items fail the grammar itself
    rej("SELECT * RENAME (o_orderdate AS odate) FROM orders, customer",
      "single base table")
    rej("SELECT * RENAME (o_orderdate AS odate) FROM orders; SELECT 1",
      "multi-statement")
    val eRen = intercept[IllegalArgumentException] {
      CepSql.translate("SELECT * RENAME (a AS b) FROM t") }
    assert(eRen.getMessage.contains("CepSql.sql"))
    // pure-text translate has no schema: loud pointer, not a pass-through
    val e = intercept[IllegalArgumentException] {
      CepSql.translate("SELECT * EXCLUDE (a) FROM t") }
    assert(e.getMessage.contains("CepSql.sql"))
    // literal text is data, not a clause
    val litQ = "SELECT '* EXCLUDE (x)' AS k FROM t"
    assert(CepSql.translate(litQ) === litQ)
  }

  test("auto-PIVOT dialect: data-derived IN list; edges loud (r12)") {
    Tables.load(spark, sf)
    val got = CepSql.sql(spark,
      """PIVOT orders ON o_orderstatus USING count(o_orderkey)
         GROUP BY o_orderpriority ORDER BY o_orderpriority""")
    // columns = sorted distinct statuses, rows = priorities
    assert(got.columns.head === "o_orderpriority")
    val statuses = spark.table("orders").select("o_orderstatus")
      .distinct().collect().map(_.getString(0)).sorted
    assert(got.columns.drop(1).toSeq === statuses.toSeq)
    // cell parity vs a plain group-by
    val want = spark.sql(
      """SELECT o_orderpriority, o_orderstatus, count(o_orderkey) AS c
         FROM orders GROUP BY 1, 2""").collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    got.collect().foreach { r =>
      statuses.zipWithIndex.foreach { case (st, i) =>
        val cell = if (r.isNullAt(i + 1)) 0L else r.getLong(i + 1)
        assert(cell === want.getOrElse((r.getString(0), st), 0L),
          s"cell (${r.getString(0)}, $st)")
      }
    }
    // multi-column GROUP BY accepted
    assert(CepSql.sql(spark,
      """PIVOT orders ON o_orderstatus USING count(o_orderkey)
         GROUP BY o_orderpriority, o_custkey LIMIT 5""").count() === 5)
    // Spark's own subquery PIVOT form passes through untouched
    val sub = "SELECT * FROM (SELECT o_orderpriority, o_orderstatus " +
      "FROM orders) PIVOT (count(o_orderstatus) FOR o_orderstatus " +
      "IN ('F', 'O', 'P'))"
    assert(!CepSql.realPivot(sub) && CepSql.sql(spark, sub).count() > 0)
    def rej(sqlText: String, frag: String): Unit = {
      val e = intercept[IllegalArgumentException] {
        CepSql.sql(spark, sqlText) }
      assert(e.getMessage.contains(frag), s"$sqlText → ${e.getMessage}")
    }
    rej("PIVOT orders ON no_such USING count(o_orderkey) " +
      "GROUP BY o_orderpriority", "not a column")
    rej("PIVOT orders ON o_orderstatus USING median(o_totalprice) " +
      "GROUP BY o_orderpriority", "must be one of")
    rej("PIVOT orders ON o_orderkey USING count(o_custkey) " +
      "GROUP BY o_orderpriority", "100 distinct")
    rej("PIVOT orders ON o_orderstatus USING count(o_orderkey)",
      "accepts exactly")
    // ADVICE r12: the derived pivot columns order in UTF-8 BYTE order
    // (DuckDB's binary collation), not UTF-16 code-unit order — the two
    // disagree exactly on supplementary characters: U+EFFF (UTF-8
    // EE BF BF) sorts BEFORE U+1F600 (UTF-8 F0 9F 98 80) in byte order,
    // while its UTF-16 code unit 0xEFFF sorts AFTER the surrogate pair
    // 0xD83D 0xDE00
    import spark.implicits._
    Seq(("\uD83D\uDE00", 1L), ("\uEFFF", 2L), ("a", 3L))
      .toDF("k", "v").createOrReplaceTempView("__pv_utf8")
    val pv = CepSql.sql(spark,
      "PIVOT __pv_utf8 ON k USING sum(v) GROUP BY v")
    assert(pv.columns.drop(1).toSeq ===
      Seq("a", "\uEFFF", "\uD83D\uDE00"),
      "pivot columns must follow UTF-8 byte order")
  }

  test("long-form UNPIVOT dialect: bare list + COLUMNS(* EXCLUDE); " +
      "edges loud (r12)") {
    Tables.load(spark, sf)
    val got = CepSql.sql(spark,
      """UNPIVOT orders ON o_orderkey, o_custkey
         INTO NAME metric VALUE val LIMIT 10""")
    assert(got.columns.contains("metric") && got.columns.contains("val"))
    assert(!got.columns.contains("o_orderkey"),
      "melted columns must leave the wide shape")
    assert(got.count() === 10)
    // the schema-aware EXCLUDE form melts the complement
    val ex = CepSql.sql(spark,
      """UNPIVOT orders ON COLUMNS(* EXCLUDE (o_orderstatus,
           o_totalprice, o_orderdate, o_orderpriority))
         INTO NAME metric VALUE val""")
    assert(ex.select("metric").distinct().collect()
      .map(_.getString(0)).sorted.toSeq ===
      Seq("o_custkey", "o_orderkey"))
    // row count doubles (two melted BIGINT columns, no NULLs in fixture)
    assert(ex.count() === spark.table("orders").count() * 2)
    def rej(sqlText: String, frag: String): Unit = {
      val e = intercept[IllegalArgumentException] {
        CepSql.sql(spark, sqlText) }
      assert(e.getMessage.contains(frag), s"$sqlText → ${e.getMessage}")
    }
    rej("UNPIVOT orders ON no_such INTO NAME m VALUE v", "not a column")
    rej("UNPIVOT orders ON o_orderkey, o_custkey, o_orderstatus, " +
      "o_totalprice, o_orderdate, o_orderpriority INTO NAME m VALUE v",
      "every column")
    rej("UNPIVOT orders ON COLUMNS(* EXCLUDE (o_orderkey, o_custkey, " +
      "o_orderstatus, o_totalprice, o_orderdate, o_orderpriority)) " +
      "INTO NAME m VALUE v", "excludes everything")
    rej("UNPIVOT orders ON o_orderkey INTO NAME m", "accepts exactly")
    // Spark's own FROM-UNPIVOT form passes through untouched
    val sub = "SELECT * FROM orders UNPIVOT (v FOR n IN " +
      "(o_orderkey, o_custkey))"
    assert(!CepSql.realUnpivot(sub) && CepSql.sql(spark, sub).count() > 0)
  }

  test("q_dialect_asof fixture has unique (user_id, ts) clicks — the " +
      "DuckDB native-ASOF oracle's equal-ts tie choice is unspecified, " +
      "so the hash gate is deterministic ONLY under this pin (r12)") {
    // check the spec's sf AND the driver's correctness-gate sf (0.01)
    for (dir <- Seq(sf, "/root/testdata/sf0.01")
         if new java.io.File(dir).isDirectory) {
      Tables.load(spark, dir)
      val clk = Tables.table(spark, dir, "events")
        .filter(col("event_type") === "click")
      assert(clk.groupBy("user_id", "ts").count()
        .filter(col("count") > 1).isEmpty,
        s"equal-ts same-user clicks in $dir would make the native-ASOF " +
          "oracle's right-row choice nondeterministic; re-key the " +
          "fixture or make the oracle tie-explicit (rank-1 by " +
          "click_ts DESC, event_id DESC)")
    }
  }

  test("MATCH PATTERN sequence == q_cep_seq (join/window formulation)") {
    Tables.load(spark, sf)
    val got = CepSql.sql(spark,
      """SELECT * FROM events
         MATCH PATTERN (signup THEN purchase WITHIN '30' MINUTES)
         PARTITION BY user_id""")
    assert(got.columns.toSeq ===
      Seq("user_id", "sid", "pid", "s_ts", "p_ts"))
    val want = graft.SparkEntry.queries("q_cep_seq")(spark, sf)
    assert(got.collect().map(_.toSeq).toSeq ===
      want.collect().map(_.toSeq).toSeq)
  }

  test("MATCH PATTERN THEN NOT == q_cep_absence (left-anti formulation)") {
    Tables.load(spark, sf)
    val got = CepSql.sql(spark,
      """SELECT * FROM events
         MATCH PATTERN (signup THEN NOT purchase WITHIN '30' MINUTES)
         PARTITION BY user_id""")
    assert(got.columns.toSeq === Seq("sid", "user_id", "s_ts"))
    val want = graft.SparkEntry.queries("q_cep_absence")(spark, sf)
    assert(got.collect().map(_.toSeq).toSeq ===
      want.collect().map(_.toSeq).toSeq)
  }

  test("MATCH PATTERN 3-step chain == chained rank-1 joins (r6)") {
    Tables.load(spark, sf)
    val got = CepSql.sql(spark,
      """SELECT * FROM events
         MATCH PATTERN (signup THEN click THEN purchase WITHIN '24' HOURS)
         PARTITION BY user_id""")
    assert(got.columns.toSeq ===
      Seq("user_id", "id_1", "id_2", "id_3", "ts_1", "ts_2", "ts_3"))
    // independent recomputation with the DataFrame API: greedy first
    // click after each signup, then greedy first purchase after that
    // click, both within 24h of the SIGNUP (anchor-relative WITHIN)
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val e = spark.table("events")
    val s1 = e.filter(col("event_type") === "signup")
      .select(col("user_id").as("k"), col("event_id").as("id_1"),
        col("ts").as("ts_1"))
    def step(prev: org.apache.spark.sql.DataFrame, ev: String, i: Int) = {
      val b = e.filter(col("event_type") === ev)
        .select(col("user_id").as("bk"), col("event_id").as(s"id_$i"),
          col("ts").as(s"ts_$i"))
      val w = Window.partitionBy("id_1")
        .orderBy(asc(s"ts_$i"), asc(s"id_$i"))
      prev.join(b, col("k") === col("bk") &&
          col(s"ts_$i") > col(s"ts_${i - 1}") &&
          col(s"ts_$i") <= col("ts_1") + expr("INTERVAL 24 HOURS"))
        .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
        .drop("bk", "rn")
    }
    val want = step(step(s1, "click", 2), "purchase", 3)
      .select(col("k").as("user_id"), col("id_1"), col("id_2"), col("id_3"),
        col("ts_1"), col("ts_2"), col("ts_3"))
      .orderBy("id_1")
    assert(got.count() > 0, "chain must match at least once on sf0.001")
    assert(got.collect().map(_.toSeq).toSeq ===
      want.collect().map(_.toSeq).toSeq)
    // matched chains step strictly forward in time
    got.collect().foreach { r =>
      val (t1, t2, t3) = (r.getTimestamp(4), r.getTimestamp(5),
        r.getTimestamp(6))
      assert(t1.before(t2) && t2.before(t3))
    }
  }

  test("MATCH PATTERN 3-step THEN NOT == anti join after the prefix (r6)") {
    Tables.load(spark, sf)
    val got = CepSql.sql(spark,
      """SELECT * FROM events
         MATCH PATTERN (signup THEN click THEN NOT purchase WITHIN '24' HOURS)
         PARTITION BY user_id""")
    assert(got.columns.toSeq ===
      Seq("user_id", "id_1", "id_2", "ts_1", "ts_2"))
    // prefix chains (signup→click) split exactly into completed (the
    // 3-step key) and absent (this key) on the anchor id
    val full = CepSql.sql(spark,
      """SELECT * FROM events
         MATCH PATTERN (signup THEN click THEN purchase WITHIN '24' HOURS)
         PARTITION BY user_id""")
    val prefix = CepSql.sql(spark,
      """SELECT * FROM events
         MATCH PATTERN (signup THEN click WITHIN '24' HOURS)
         PARTITION BY user_id""")
    val gotIds = got.select("id_1").collect().map(_.getLong(0)).toSet
    val fullIds = full.select("id_1").collect().map(_.getLong(0)).toSet
    val prefIds = prefix.select("sid").collect().map(_.getLong(0)).toSet
    assert(gotIds.intersect(fullIds).isEmpty)
    assert(gotIds.union(fullIds) === prefIds)
  }

  test("MATCH PATTERN quantified run == gaps-and-islands recomputation (r6)") {
    Tables.load(spark, sf)
    val got = CepSql.sql(spark,
      """SELECT * FROM events
         MATCH PATTERN (click{3,} THEN purchase WITHIN '12' HOURS)
         PARTITION BY user_id""")
    assert(got.columns.toSeq ===
      Seq("user_id", "run_len", "run_start", "run_end", "b_ts"))
    // independent DataFrame recomputation of the q_cep_times formulation
    // at this window: maximal click runs >= 3, first purchase within 12h
    // of the run end (left join keeps uncompleted runs for the complement)
    import org.apache.spark.sql.expressions.Window
    val e = spark.table("events")
      .select("event_id", "user_id", "event_type", "ts")
    val wU = Window.partitionBy("user_id").orderBy(asc("ts"), asc("event_id"))
    val wUT = Window.partitionBy("user_id", "event_type")
      .orderBy(asc("ts"), asc("event_id"))
    val allRuns = e
      .withColumn("grp", row_number().over(wU) - row_number().over(wUT))
      .filter(col("event_type") === "click")
      .groupBy("user_id", "grp")
      .agg(count(lit(1)).as("run_len"), min("ts").as("run_start"),
        max("ts").as("run_end"))
      .filter(col("run_len") >= 3)
      .join(e.filter(col("event_type") === "purchase")
          .select(col("user_id").as("pu"), col("ts").as("p_ts")),
        col("user_id") === col("pu") && col("p_ts") > col("run_end") &&
          col("p_ts") <= col("run_end") + expr("INTERVAL 12 HOURS"),
        "left")
      .groupBy("user_id", "run_len", "run_start", "run_end")
      .agg(min("p_ts").as("b_ts"))
    val want = allRuns.filter(col("b_ts").isNotNull)
      .orderBy("user_id", "run_start")
    assert(got.collect().map(_.toSeq).toSeq ===
      want.collect().map(_.toSeq).toSeq)
    assert(got.count() > 0, "completed runs must exist at this sf")
    // ...and the THEN NOT variant is exactly the uncompleted complement
    val gotNot = CepSql.sql(spark,
      """SELECT * FROM events
         MATCH PATTERN (click{3,} THEN NOT purchase WITHIN '12' HOURS)
         PARTITION BY user_id""")
    val wantNot = allRuns.filter(col("b_ts").isNull)
      .select("user_id", "run_len", "run_start", "run_end")
      .orderBy("user_id", "run_start")
    assert(gotNot.collect().map(_.toSeq).toSeq ===
      wantNot.collect().map(_.toSeq).toSeq)
  }

  test("bounded quantifier {m,n} / {m}: capped runs, whole-run semantics (r7)") {
    Tables.load(spark, sf)
    import org.apache.spark.sql.expressions.Window
    val e = spark.table("events")
      .select("event_id", "user_id", "event_type", "ts")
    val wU = Window.partitionBy("user_id").orderBy(asc("ts"), asc("event_id"))
    val wUT = Window.partitionBy("user_id", "event_type")
      .orderBy(asc("ts"), asc("event_id"))
    val allRuns = e
      .withColumn("grp", row_number().over(wU) - row_number().over(wUT))
      .filter(col("event_type") === "click")
      .groupBy("user_id", "grp")
      .agg(count(lit(1)).as("run_len"), min("ts").as("run_start"),
        max("ts").as("run_end"))
      .drop("grp")
    // the fixture must contain maximal runs LONGER than the cap, so the
    // cap is observable (whole-run semantics: those runs simply vanish,
    // they are never truncated to their first 3 events)
    assert(allRuns.filter(col("run_len") > 3).count() > 0,
      "fixture needs a maximal click run longer than the cap")
    val got = CepSql.sql(spark,
      """SELECT * FROM events
         MATCH PATTERN (click{2,3} THEN purchase WITHIN '12' HOURS)
         PARTITION BY user_id""")
    val want = allRuns
      .filter(col("run_len") >= 2 && col("run_len") <= 3)
      .join(e.filter(col("event_type") === "purchase")
          .select(col("user_id").as("pu"), col("ts").as("p_ts")),
        col("user_id") === col("pu") && col("p_ts") > col("run_end") &&
          col("p_ts") <= col("run_end") + expr("INTERVAL 12 HOURS"))
      .groupBy("user_id", "run_len", "run_start", "run_end")
      .agg(min("p_ts").as("b_ts"))
      .orderBy("user_id", "run_start")
    assert(got.collect().map(_.toSeq).toSeq ===
      want.collect().map(_.toSeq).toSeq)
    assert(got.count() > 0, "capped runs must exist at this sf")
    // {m} is exactly {m,m}
    val exact = CepSql.sql(spark,
      """SELECT * FROM events
         MATCH PATTERN (click{3} THEN purchase WITHIN '12' HOURS)
         PARTITION BY user_id""").collect().map(_.toSeq).toSeq
    val pair = CepSql.sql(spark,
      """SELECT * FROM events
         MATCH PATTERN (click{3,3} THEN purchase WITHIN '12' HOURS)
         PARTITION BY user_id""").collect().map(_.toSeq).toSeq
    assert(exact === pair)
    assert(exact.forall(_(1) == 3L), "{3} admits length-3 runs only")
    // bad bounds are parse errors, not silent surprises
    val eRev = intercept[IllegalArgumentException] {
      CepSql.parsePattern(
        """SELECT * FROM events
           MATCH PATTERN (click{4,2} THEN purchase WITHIN '1' HOURS)
           PARTITION BY user_id""")
    }
    assert(eRev.getMessage.contains("max < min"))
    intercept[IllegalArgumentException] {
      CepSql.parsePattern(
        """SELECT * FROM events
           MATCH PATTERN (click{0,2} THEN purchase WITHIN '1' HOURS)
           PARTITION BY user_id""")
    }
  }

  test("reluctant quantifier {m,}?: lazy truncation at m, grammar " +
      "guards (r8)") {
    Tables.load(spark, sf)
    import org.apache.spark.sql.expressions.Window
    val e = spark.table("events")
      .select("event_id", "user_id", "event_type", "ts")
    val wU = Window.partitionBy("user_id").orderBy(asc("ts"), asc("event_id"))
    val wUT = Window.partitionBy("user_id", "event_type")
      .orderBy(asc("ts"), asc("event_id"))
    val wRun = Window.partitionBy("user_id", "grp")
      .orderBy(asc("ts"), asc("event_id"))
    // independent lazy-run recomputation: per qualifying maximal run,
    // truncate to the first 3 clicks
    val lazyRuns = e
      .withColumn("grp", row_number().over(wU) - row_number().over(wUT))
      .filter(col("event_type") === "click")
      .withColumn("rn", row_number().over(wRun))
      .groupBy("user_id", "grp")
      .agg(count(lit(1)).as("total_len"), min("ts").as("run_start"),
        max(when(col("rn") <= 3, col("ts"))).as("run_end"))
      .filter(col("total_len") >= 3)
      .drop("grp")
    val got = CepSql.sql(spark,
      """SELECT * FROM events
         MATCH PATTERN (click{3,}? THEN purchase WITHIN '12' HOURS)
         PARTITION BY user_id""")
    val want = lazyRuns
      .join(e.filter(col("event_type") === "purchase")
          .select(col("user_id").as("pu"), col("ts").as("p_ts")),
        col("user_id") === col("pu") && col("p_ts") > col("run_end") &&
          col("p_ts") <= col("run_end") + expr("INTERVAL 12 HOURS"))
      .groupBy("user_id", "run_start", "run_end")
      .agg(min("p_ts").as("b_ts"))
      .select(col("user_id"), lit(3L).as("run_len"), col("run_start"),
        col("run_end"), col("b_ts"))
      .orderBy("user_id", "run_start")
    assert(got.collect().map(_.toSeq).toSeq ===
      want.collect().map(_.toSeq).toSeq)
    assert(got.count() > 0)
    assert(got.collect().forall(_(1) == 3L), "lazy match is exactly m long")
    // lazy differs from greedy on this fixture (long runs exist, so the
    // completion windows genuinely shift)
    val greedy = graft.SparkEntry.queries("q_pattern_times")(spark, sf)
      .collect().map(_.toSeq).toSeq
    assert(got.collect().map(_.toSeq).toSeq !== greedy)
    // bounded lazy forms are rejected loudly — the bound can never bind
    val eBound = intercept[IllegalArgumentException] {
      CepSql.parsePattern(
        """SELECT * FROM events
           MATCH PATTERN (click{2,4}? THEN purchase WITHIN '1' HOURS)
           PARTITION BY user_id""")
    }
    assert(eBound.getMessage.contains("reluctant"))
    intercept[IllegalArgumentException] {
      CepSql.parsePattern(
        """SELECT * FROM events
           MATCH PATTERN (click{3}? THEN purchase WITHIN '1' HOURS)
           PARTITION BY user_id""")
    }
    // a reluctant step parses as quantified, never as optional
    val spec = CepSql.parsePattern(
      """SELECT * FROM events
         MATCH PATTERN (click{3,}? THEN purchase WITHIN '1' HOURS)
         PARTITION BY user_id""")
    assert(spec.steps.head.reluctant && !spec.steps.head.optional &&
      spec.steps.head.minTimes.contains(3))
  }

  test("FIRST/LAST(ev.col) boundary refs on a mid-chain run (r8)") {
    Tables.load(spark, sf)
    // signup THEN click{2,} THEN purchase, measuring the mid run's own
    // boundary rows: FIRST(click.ts) = run start (NOT in the chain's
    // ordinary output — ts_2 is the run END), LAST(click.event_id) =
    // the run's last row id
    val got = CepSql.sql(spark,
      """SELECT * FROM events
         MATCH PATTERN (signup THEN click{2,} THEN purchase WITHIN '48' HOURS)
         PARTITION BY user_id
         MEASURES FIRST(click.ts) AS run_t0, LAST(click.event_id) AS run_id1""")
    assert(got.count() > 0)
    // independent recomputation: the mid-run stage's accepted run is
    // the FIRST maximal >= 2 click island after the signup fitting the
    // window; rebuild islands and join on (run_end = ts_2)
    import org.apache.spark.sql.expressions.Window
    val e = spark.table("events")
    val wU = Window.partitionBy("user_id").orderBy(asc("ts"), asc("event_id"))
    val wUT = Window.partitionBy("user_id", "event_type")
      .orderBy(asc("ts"), asc("event_id"))
    val runs = e
      .withColumn("grp", row_number().over(wU) - row_number().over(wUT))
      .filter(col("event_type") === "click")
      .groupBy("user_id", "grp")
      .agg(count(lit(1)).as("rl"), min("ts").as("t0"), max("ts").as("t1"),
        max(struct(col("ts"), col("event_id"))).as("lastrow"))
      .filter(col("rl") >= 2)
      .select(col("user_id").as("ru"), col("t0"), col("t1"),
        col("lastrow.event_id").as("id1"))
    val joined = got.join(runs,
      got("user_id") === col("ru") && got("ts_2") === col("t1"))
    assert(joined.count() === got.count(),
      "every match's ts_2 must identify exactly one island")
    assert(joined.filter(col("run_t0") =!= col("t0")).count() === 0)
    assert(joined.filter(col("run_id1") =!= col("id1")).count() === 0)
    // FIRST/LAST on an UNQUANTIFIED step is malformed with a pointer
    val ePlain = intercept[IllegalArgumentException] {
      CepSql.parsePattern(
        """SELECT * FROM events
           MATCH PATTERN (signup THEN purchase WITHIN '1' HOURS)
           PARTITION BY user_id MEASURES FIRST(signup.ts) AS t0""")
    }
    assert(ePlain.getMessage.contains("not") &&
      ePlain.getMessage.contains("quantified"))
  }

  test("reluctant quantifier mid-chain: lazy run feeds the next step (r8)") {
    Tables.load(spark, sf)
    import org.apache.spark.sql.expressions.Window
    val e = spark.table("events")
      .select("event_id", "user_id", "event_type", "ts")
    val wU = Window.partitionBy("user_id").orderBy(asc("ts"), asc("event_id"))
    val wUT = Window.partitionBy("user_id", "event_type")
      .orderBy(asc("ts"), asc("event_id"))
    val wRun = Window.partitionBy("user_id", "grp")
      .orderBy(asc("ts"), asc("event_id"))
    val lazyRuns = e
      .withColumn("grp", row_number().over(wU) - row_number().over(wUT))
      .filter(col("event_type") === "click")
      .withColumn("rn", row_number().over(wRun))
      .groupBy("user_id", "grp")
      .agg(count(lit(1)).as("total_len"), min("ts").as("run_start"),
        max(when(col("rn") <= 2, col("ts"))).as("run_end"))
      .filter(col("total_len") >= 2)
      .select(col("user_id").as("ru"), col("run_start"), col("run_end"))
    val su = e.filter(col("event_type") === "signup")
      .select(col("event_id").as("id_1"), col("user_id"),
        col("ts").as("ts_1"))
    // rank-1 lazy run per anchor: first by (run_start, run_end)
    val wA = Window.partitionBy("id_1").orderBy(asc("run_start"),
      asc("run_end"))
    val step2 = su.join(lazyRuns, col("user_id") === col("ru") &&
        col("run_start") > col("ts_1") &&
        col("run_end") <= col("ts_1") + expr("INTERVAL 48 HOURS"))
      .withColumn("rn", row_number().over(wA)).filter(col("rn") === 1)
      .select(col("user_id"), col("id_1"), lit(2L).as("len_2"),
        col("ts_1"), col("run_end").as("ts_2"))
    val wP = Window.partitionBy("id_1").orderBy(asc("p_ts"), asc("p_id"))
    val want = step2.join(e.filter(col("event_type") === "purchase")
        .select(col("user_id").as("pu"), col("event_id").as("p_id"),
          col("ts").as("p_ts")),
      col("user_id") === col("pu") && col("p_ts") > col("ts_2") &&
        col("p_ts") <= col("ts_1") + expr("INTERVAL 48 HOURS"))
      .withColumn("rn", row_number().over(wP)).filter(col("rn") === 1)
      .select(col("user_id"), col("id_1"), col("len_2"),
        col("p_id").as("id_3"), col("ts_1"), col("ts_2"),
        col("p_ts").as("ts_3"))
      .orderBy("id_1")
    val got = CepSql.sql(spark,
      """SELECT * FROM events
         MATCH PATTERN (signup THEN click{2,}? THEN purchase WITHIN '48' HOURS)
         PARTITION BY user_id""")
    assert(got.count() > 0)
    assert(got.collect().map(_.toSeq).toSeq ===
      want.collect().map(_.toSeq).toSeq)
  }

  test("optional step ev?: pivot decides take vs skip, greedy (r7)") {
    import java.sql.Timestamp
    import spark.implicits._
    val rows = Seq(
      // user 1: signup, click, purchase → take branch (click matched)
      (1L, "2026-01-01 00:00:00", 1L, "signup"),
      (2L, "2026-01-01 00:05:00", 1L, "click"),
      (3L, "2026-01-01 00:10:00", 1L, "purchase"),
      // user 2: signup, purchase (no click) → skip branch (NULL step 2)
      (4L, "2026-01-01 00:00:00", 2L, "signup"),
      (5L, "2026-01-01 00:07:00", 2L, "purchase"),
      // user 3: purchase BEFORE the click → the pivot is the purchase,
      // so the optional step is skipped even though a later click+
      // purchase pair exists (greedy scan, not global search)
      (6L, "2026-01-01 00:00:00", 3L, "signup"),
      (7L, "2026-01-01 00:05:00", 3L, "purchase"),
      (8L, "2026-01-01 00:06:00", 3L, "click"),
      (9L, "2026-01-01 00:08:00", 3L, "purchase"),
      // user 4: click inside the window but its purchase beyond it →
      // the taken optional consumes the pivot, completion fails
      (10L, "2026-01-01 00:00:00", 4L, "signup"),
      (11L, "2026-01-01 00:25:00", 4L, "click"),
      (12L, "2026-01-01 00:40:00", 4L, "purchase"))
    rows.map { case (id, ts, u, ty) =>
      (id, Timestamp.valueOf(ts), u, ty, 0.0)
    }.toDF("event_id", "ts", "user_id", "event_type", "value")
      .createOrReplaceTempView("ev_opt")
    val got = CepSql.sql(spark,
      """SELECT * FROM ev_opt
         MATCH PATTERN (signup THEN click? THEN purchase WITHIN '30' MINUTES)
         PARTITION BY user_id""")
    assert(got.columns.toSeq ===
      Seq("user_id", "id_1", "id_2", "id_3", "ts_1", "ts_2", "ts_3"))
    val ids = got.select("user_id", "id_1", "id_2", "id_3").collect()
      .map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2)), r.getLong(3)))
    assert(ids.toSeq === Seq(
      (1L, 1L, Some(2L), 3L),
      (2L, 4L, None, 5L),
      (3L, 6L, None, 7L)))
    spark.catalog.dropTempView("ev_opt")
    // shape violations are parse errors
    Seq(
      """SELECT * FROM t MATCH PATTERN (a? THEN b WITHIN '5' MINUTES)
         PARTITION BY k""", // optional anchor
      """SELECT * FROM t MATCH PATTERN (a THEN b? WITHIN '5' MINUTES)
         PARTITION BY k""", // optional last step
      """SELECT * FROM t MATCH PATTERN (a THEN b? THEN c? THEN d
         WITHIN '5' MINUTES) PARTITION BY k""", // consecutive optionals
      """SELECT * FROM t MATCH PATTERN (a THEN b? THEN NOT c
         WITHIN '5' MINUTES) PARTITION BY k""", // optional before NOT
      // (a THEN b{2,}? THEN c is NOT here: since r8 that parses as the
      // RELUCTANT quantifier, not quantified+optional)
      """SELECT * FROM t MATCH PATTERN (a{2,} THEN b? THEN c
         WITHIN '5' MINUTES) PARTITION BY k""", // mixed in one pattern
      """SELECT * FROM t MATCH PATTERN (a THEN b? THEN c
         WITHIN '5' MINUTES) PARTITION BY k
         AFTER MATCH SKIP PAST LAST ROW""" // skip-past + optional
    ).foreach { q =>
      intercept[IllegalArgumentException](CepSql.parsePattern(q))
    }
  }

  test("PERMUTE(a, b): union of the two directional rewrites (r7)") {
    Tables.load(spark, sf)
    val got = CepSql.sql(spark,
      """SELECT * FROM events
         MATCH PATTERN (PERMUTE(signup, purchase) WITHIN '30' MINUTES)
         PARTITION BY user_id""")
    assert(got.columns.toSeq === Seq("user_id", "first_ev", "first_id",
      "second_id", "first_ts", "second_ts"))
    // independent recomputation: the two directional 2-step rewrites
    val fwd = CepSql.sql(spark,
      """SELECT * FROM events
         MATCH PATTERN (signup THEN purchase WITHIN '30' MINUTES)
         PARTITION BY user_id""")
      .select(col("user_id"), lit("signup").as("first_ev"),
        col("sid").as("first_id"), col("pid").as("second_id"),
        col("s_ts").as("first_ts"), col("p_ts").as("second_ts"))
    val bwd = CepSql.sql(spark,
      """SELECT * FROM events
         MATCH PATTERN (purchase THEN signup WITHIN '30' MINUTES)
         PARTITION BY user_id""")
      .select(col("user_id"), lit("purchase").as("first_ev"),
        col("sid").as("first_id"), col("pid").as("second_id"),
        col("s_ts").as("first_ts"), col("p_ts").as("second_ts"))
    val want = fwd.union(bwd).orderBy("first_id")
    assert(got.collect().map(_.toSeq).toSeq ===
      want.collect().map(_.toSeq).toSeq)
    assert(got.count() > 0)
    assert(got.select("first_ev").distinct().count() === 2,
      "both directions must occur at this sf")
    // near-misses are loud
    intercept[IllegalArgumentException] {
      CepSql.parsePattern(
        """SELECT * FROM t MATCH PATTERN (PERMUTE(a, a) WITHIN '5' MINUTES)
           PARTITION BY k""")
    }
    // PERMUTE(a, b, c) parses since r9 (its own test below); 4-way and
    // duplicate names stay loud
    intercept[IllegalArgumentException] {
      CepSql.parsePattern(
        """SELECT * FROM t MATCH PATTERN (PERMUTE(a, b, c, d) WITHIN '5'
           MINUTES) PARTITION BY k""")
    }
    intercept[IllegalArgumentException] {
      CepSql.parsePattern(
        """SELECT * FROM t MATCH PATTERN (PERMUTE(a, b, a) WITHIN '5'
           MINUTES) PARTITION BY k""")
    }
    intercept[IllegalArgumentException] {
      CepSql.parsePattern(
        """SELECT * FROM t MATCH PATTERN (PERMUTE(a, b) WITHIN '5' MINUTES)
           PARTITION BY k AFTER MATCH SKIP PAST LAST ROW""")
    }
  }

  test("PERMUTE(a, b, c): listed-lex alternative preference per anchor " +
      "(r9)") {
    // MATCH_RECOGNIZE expands PERMUTE to the alternation of orderings
    // in listed-lex order: for an anchor of class X the candidates are
    // (X, Y, Z) then (X, Z, Y), greedy rank-1 each, first completion
    // wins. The fixture pins exactly that: user 1's anchor 'a' can
    // complete BOTH a->b->c and a->c->b — listed order says a->b->c
    // wins; user 2's anchor 'a' has no c after its first b, so the
    // SECOND alternative (a, c, b) must fire instead.
    import java.sql.Timestamp
    import spark.implicits._
    val rows = Seq(
      // user 1: a@0, b@1, c@2 — and c@2 also allows (a,c,b)? no b
      // after 2, so only (a,b,c) completes; add b@3 so both complete
      (1L, "2026-01-01 00:00:00", 1L, "a"),
      (2L, "2026-01-01 00:01:00", 1L, "b"),
      (3L, "2026-01-01 00:02:00", 1L, "c"),
      (4L, "2026-01-01 00:03:00", 1L, "b"),
      // user 2: a@0, b@1 … no c after b within order (a,b,c)? c@2
      // exists — make (a,b,c) fail by placing c BEFORE b: a@0, c@1,
      // b@2 → (a,b,c) takes b@2 then needs c after 00:02 — none; so
      // (a,c,b) wins: c@1 then b@2
      (5L, "2026-01-01 00:00:00", 2L, "a"),
      (6L, "2026-01-01 00:01:00", 2L, "c"),
      (7L, "2026-01-01 00:02:00", 2L, "b"))
    rows.map { case (id, ts, u, ty) =>
      (id, Timestamp.valueOf(ts), u, ty, 0.0)
    }.toDF("event_id", "ts", "user_id", "event_type", "value")
      .createOrReplaceTempView("ev_p3")
    val got = CepSql.sql(spark,
      """SELECT * FROM ev_p3
         MATCH PATTERN (PERMUTE(a, b, c) WITHIN '30' MINUTES)
         PARTITION BY user_id""")
      .filter(col("first_ev") === "a")
      .select("user_id", "id_1", "id_2", "id_3").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    // user 1: (a,b,c) = ids 1,2,3 (NOT the (a,c,b) completion 1,3,4);
    // user 2: (a,c,b) = ids 5,6,7
    assert(got === Set((1L, 1L, 2L, 3L), (2L, 5L, 6L, 7L)), s"got $got")
    // every b/c event anchors its own match attempt too
    val all = CepSql.sql(spark,
      """SELECT * FROM ev_p3
         MATCH PATTERN (PERMUTE(a, b, c) WITHIN '30' MINUTES)
         PARTITION BY user_id""").collect()
    assert(all.map(_.getLong(2)).distinct.length === all.length,
      "anchor ids must be unique (one match attempt per anchor)")
    spark.catalog.dropTempView("ev_p3")
    // streaming 3-way (r10, was batch-only): the same fixture through
    // the Permute3Detector must reproduce the batch preference —
    // including user 1's arm-2 completion (1,3,4) being SUPPRESSED by
    // the arm-1 win and user 2's held arm-2 triple releasing once the
    // watermark passes its window (driven by the far-future flush)
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sq = spark.sqlContext
    val stream = MemoryStream[CepEvent]
    stream.toDF().createOrReplaceTempView("pat_p3")
    val q = ContinuousQueries.submitPattern(spark,
      """SELECT * FROM pat_p3
         MATCH PATTERN (PERMUTE(a, b, c) WITHIN '30' MINUTES)
         PARTITION BY user_id""", "svc_p3")
    try {
      stream.addData(rows.map { case (id, ts, u, ty) =>
        CepEvent(id, Timestamp.valueOf(ts), u, ty, 0.0)
      })
      q.processAllAvailable()
      stream.addData(CepEvent(99L,
        Timestamp.valueOf("2026-01-02 00:00:00"), 9L, "zz_flush", 0.0))
      q.processAllAvailable()
      val sgot = spark.table("svc_p3")
        .filter(col("first_ev") === "a")
        .select("user_id", "id_1", "id_2", "id_3").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3))).toSet
      assert(sgot === Set((1L, 1L, 2L, 3L), (2L, 5L, 6L, 7L)),
        s"streaming 3-way PERMUTE diverged: $sgot")
      val sAll = spark.table("svc_p3").collect()
      assert(sAll.map(_.getLong(2)).distinct.length === sAll.length,
        "streaming: one resolution per anchor")
    } finally {
      if (q.isActive) q.stop()
      spark.catalog.dropTempView("pat_p3")
    }
  }

  test("3-way PERMUTE streaming == batch on randomized dense fixtures " +
      "(r10 fuzz)") {
    // adversarial execution fuzz for Permute3Detector: dense random
    // fixtures (ts collisions likely, tight window so arm-1 windows
    // close mid-stream and held arm-2 triples must release, noise
    // events interleaved), replayed in 4 ts-ordered chunks + flush —
    // the match set must equal the batch rewrite's, seed by seed.
    // Lateness is NONZERO here by necessity, not convenience: the fuzz
    // itself caught that with '0 seconds' an event whose ts EQUALS the
    // watermark (an equal-ts tie straddling a micro-batch boundary —
    // seed 1 splits two same-second anchors across chunks) is dropped
    // by Spark's late-row filter before any detector sees it; a real
    // deployment of second-dense data needs lateness ≥ the tie window
    import java.sql.Timestamp
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sq = spark.sqlContext
    for (seed <- 1 to 5) {
      val rnd = new scala.util.Random(seed)
      val types = Array("a", "b", "c", "x") // x = noise
      val rows = (1 to 80).map { id =>
        (id.toLong,
          new Timestamp(Timestamp.valueOf("2026-01-01 00:00:00").getTime
            + rnd.nextInt(600) * 1000L),
          (1 + rnd.nextInt(3)).toLong,
          types(rnd.nextInt(4)), 0.0)
      }.sortBy(r => (r._2.getTime, r._1))
      rows.toDF("event_id", "ts", "user_id", "event_type", "value")
        .createOrReplaceTempView(s"ev_p3f_$seed")
      val stmt = s"""SELECT * FROM ev_p3f_$seed
         MATCH PATTERN (PERMUTE(a, b, c) WITHIN '2' MINUTES)
         PARTITION BY user_id"""
      val batch = CepSql.sql(spark, stmt)
        .select("first_ev", "id_1", "id_2", "id_3").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          r.getLong(3))).toSet
      val stream = MemoryStream[CepEvent]
      stream.toDF().createOrReplaceTempView(s"pat_p3f_$seed")
      val q = ContinuousQueries.submitPattern(spark,
        stmt.replace(s"ev_p3f_$seed", s"pat_p3f_$seed"),
        s"svc_p3f_$seed", lateness = "5 seconds")
      try {
        rows.map { case (id, ts, u, ty, v) => CepEvent(id, ts, u, ty, v) }
          .grouped(20).foreach { c =>
            stream.addData(c); q.processAllAvailable()
          }
        stream.addData(CepEvent(-1L,
          Timestamp.valueOf("2026-01-02 00:00:00"), 9L, "zz", 0.0))
        q.processAllAvailable()
        val got = spark.table(s"svc_p3f_$seed")
          .select("first_ev", "id_1", "id_2", "id_3").collect()
          .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
            r.getLong(3))).toSet
        assert(got === batch,
          s"seed $seed: ${got.diff(batch).take(3)} extra, " +
            s"${batch.diff(got).take(3)} missing " +
            s"(${got.size} streamed vs ${batch.size} batch)")
      } finally {
        if (q.isActive) q.stop()
        spark.catalog.dropTempView(s"pat_p3f_$seed")
        spark.catalog.dropTempView(s"ev_p3f_$seed")
      }
    }
  }

  test("PERMUTE(a, b, c) == driver-side brute-force greedy scan on the " +
      "full fixture (r9)") {
    // independent recomputation (not the SQL rewrite, not the oracle's
    // mirror of it): per anchor, try the two listed-lex orders with a
    // plain greedy scan over the user's (ts, id)-sorted events
    Tables.load(spark, sf)
    def usOf(t: java.sql.Timestamp) =
      t.getTime / 1000 * 1000000L + t.getNanos / 1000
    val byUser = spark.table("events")
      .select("event_id", "ts", "user_id", "event_type").collect()
      .map(r => (r.getLong(0), usOf(r.getTimestamp(1)), r.getLong(2),
        r.getString(3)))
      .groupBy(_._3).view.mapValues(_.sortBy(e => (e._2, e._1))).toMap
    val classes = Seq("signup", "click", "purchase")
    val winUs = 12L * 3600 * 1000000L
    def greedy(user: Long, anchorIdx: Int, order: Seq[String])
        : Option[Seq[(Long, Long)]] = {
      val es = byUser(user)
      val a = es(anchorIdx)
      var acc = List((a._1, a._2))
      var from = anchorIdx
      order.drop(1).foreach { cls =>
        if (acc != null) {
          val prevTs = acc.head._2
          val hit = es.indexWhere(e => e._4 == cls && e._2 > prevTs &&
            e._2 <= a._2 + winUs, from + 1)
          if (hit < 0) acc = null
          else { acc = (es(hit)._1, es(hit)._2) :: acc; from = hit }
        }
      }
      Option(acc).map(_.reverse)
    }
    val want = byUser.toSeq.flatMap { case (u, es) =>
      es.indices.flatMap { i =>
        val cls = es(i)._4
        if (!classes.contains(cls)) None
        else {
          val rest = classes.filterNot(_ == cls)
          val o1 = cls +: rest
          val o2 = Seq(cls, rest(1), rest(0))
          greedy(u, i, o1).orElse(greedy(u, i, o2))
            .map(m => (u, cls, m.map(_._1)))
        }
      }
    }.toSet
    val got = CepSql.sql(spark,
      """SELECT * FROM events
         MATCH PATTERN (PERMUTE(signup, click, purchase)
         WITHIN '12' HOURS)
         PARTITION BY user_id""").collect()
      .map(r => (r.getLong(0), r.getString(1),
        Seq(r.getLong(2), r.getLong(3), r.getLong(4)))).toSet
    assert(want.nonEmpty)
    assert(got === want,
      s"rewrite vs brute force: ${(got -- want).take(3)} extra, " +
        s"${(want -- got).take(3)} missing")
  }

  test("skip-past dispatch rejects a non-integral PARTITION BY key (r8)") {
    // SkipMatch keys on a long; a string key would cast to null and
    // collapse every group — the dispatch must fail loudly instead
    import java.sql.Timestamp
    import spark.implicits._
    Seq(("u1", 1L, Timestamp.valueOf("2026-01-01 00:00:00"), "signup"))
      .toDF("name", "event_id", "ts", "event_type")
      .createOrReplaceTempView("skip_strkey_events")
    val e = intercept[IllegalArgumentException] {
      CepSql.sql(spark,
        """SELECT * FROM skip_strkey_events
           MATCH PATTERN (signup THEN purchase WITHIN '5' MINUTES)
           PARTITION BY name AFTER MATCH SKIP PAST LAST ROW""")
    }
    assert(e.getMessage.contains("integral"))
    val missing = intercept[IllegalArgumentException] {
      CepSql.sql(spark,
        """SELECT * FROM skip_strkey_events
           MATCH PATTERN (signup THEN purchase WITHIN '5' MINUTES)
           PARTITION BY nope AFTER MATCH SKIP PAST LAST ROW""")
    }
    assert(missing.getMessage.contains("not found"))
  }

  test("MEASURES fn(col): span aggregate over the matched rows (r7)") {
    Tables.load(spark, sf)
    // reference spans from the unmeasured rewrite, aggregated directly
    val spans = CepSql.sql(spark,
      """SELECT * FROM events
         MATCH PATTERN (signup THEN purchase WITHIN '12' HOURS)
         PARTITION BY user_id""")
      .select(col("user_id").as("k"), col("sid"), col("pid"),
        col("s_ts"), col("p_ts"))
    val e = spark.table("events")
    val want = spans.join(e, col("k") === col("user_id") &&
        (col("ts") > col("s_ts") ||
          (col("ts") === col("s_ts") && col("event_id") >= col("sid"))) &&
        (col("ts") < col("p_ts") ||
          (col("ts") === col("p_ts") && col("event_id") <= col("pid"))))
      .groupBy("k", "sid")
      .agg(sum("value").as("w_sum"), count(lit(1)).as("w_cnt"),
        min("value").as("w_min"), max("value").as("w_max"),
        avg("value").as("w_avg"))
      .collect().map(r => r.getLong(1) ->
        (r.getDouble(2), r.getLong(3), r.getDouble(4), r.getDouble(5),
          r.getDouble(6))).toMap
    assert(want.nonEmpty)
    assert(want.values.exists(_._2 > 2),
      "some span must contain events beyond the two matched rows")
    def measured(fnTxt: String): Map[Long, Double] =
      CepSql.sql(spark,
        s"""SELECT * FROM events
           |MATCH PATTERN (signup THEN purchase WITHIN '12' HOURS)
           |PARTITION BY user_id
           |MEASURES $fnTxt""".stripMargin)
        .select(col("id_1"), col("measure").cast("double"))
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val sums = measured("SUM(value)")
    val cnts = measured("COUNT(*)")
    val mins = measured("MIN(value)")
    val maxs = measured("MAX(value)")
    val avgs = measured("AVG(value)")
    assert(sums.keySet === want.keySet)
    want.foreach { case (sid, (s, c, mn, mx, av)) =>
      assert(math.abs(sums(sid) - s) < 1e-9, s"sum@$sid")
      assert(cnts(sid) === c.toDouble, s"count@$sid")
      assert(mins(sid) === mn, s"min@$sid")
      assert(maxs(sid) === mx, s"max@$sid")
      assert(math.abs(avgs(sid) - av) < 1e-9, s"avg@$sid")
    }
    // measures reject optional/skip-past chains, SUM(*), and refs to a
    // NOT step. (A class ref into a quantified run — a{2,} … MEASURES
    // a.value — stopped being malformed in r9: it desugars to
    // LAST(a.value) per MATCH_RECOGNIZE running semantics, pinned by
    // the desugar test and oracle-gated as q_pattern_qref. The
    // trailing-NOT form itself stopped being malformed in r14: it
    // rewrites to the anti-join-wrapped measures pipeline — see
    // q_measure_absent — so only REFERENCES to the never-matching NOT
    // step reject.)
    Seq(
      "MATCH PATTERN (a THEN b? THEN c WITHIN '5' MINUTES) PARTITION " +
        "BY k MEASURES COUNT(*)",
      "MATCH PATTERN (a THEN b WITHIN '5' MINUTES) PARTITION BY k " +
        "AFTER MATCH SKIP PAST LAST ROW MEASURES COUNT(*)",
      "MATCH PATTERN (a THEN b WITHIN '5' MINUTES) PARTITION BY k " +
        "MEASURES SUM(*)",
      "MATCH PATTERN (a THEN NOT b WITHIN '5' MINUTES) PARTITION BY k " +
        "MEASURES b.value"
    ).foreach { frag =>
      intercept[IllegalArgumentException](
        CepSql.parsePattern(s"SELECT * FROM t $frag"))
    }
    // the absent form WITH measures parses since r14
    val abs = CepSql.parsePattern("SELECT * FROM t MATCH PATTERN " +
      "(a THEN NOT b WITHIN '5' MINUTES) PARTITION BY k " +
      "MEASURES COUNT(*) AS c")
    assert(abs.absent && abs.measures.nonEmpty)
  }

  test("MEASURES over a mid-chain quantified step == direct span agg " +
    "(r8)") {
    // a{1} THEN b{2,} THEN c with measures: the span's ends are both
    // unquantified, so the law is checkable directly — the measured
    // rewrite must equal the unmeasured rewrite's spans aggregated by
    // hand (the head-quantified case is oracle-gated as
    // q_pattern_qmeasure; this pins the mid-run case the oracle skips)
    Tables.load(spark, sf)
    val spans = CepSql.sql(spark,
      """SELECT * FROM events
         MATCH PATTERN (signup THEN click{2,} THEN purchase
         WITHIN '24' HOURS)
         PARTITION BY user_id""")
      .select(col("user_id").as("k"), col("id_1"), col("id_3"),
        col("ts_1"), col("ts_3"))
    val e = spark.table("events")
    val want = spans.join(e, col("k") === col("user_id") &&
        (col("ts") > col("ts_1") ||
          (col("ts") === col("ts_1") && col("event_id") >= col("id_1"))) &&
        (col("ts") < col("ts_3") ||
          (col("ts") === col("ts_3") && col("event_id") <= col("id_3"))))
      .groupBy("k", "id_1").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
    assert(want.nonEmpty, "fixture must produce mid-run measured matches")
    val got = CepSql.sql(spark,
      """SELECT * FROM events
         MATCH PATTERN (signup THEN click{2,} THEN purchase
         WITHIN '24' HOURS)
         PARTITION BY user_id
         MEASURES COUNT(*) AS n""")
      .select(col("id_1"), col("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === want)
  }

  test("head-quantified MEASURES span == independent run-boundary " +
    "recomputation (r8)") {
    // click{2,} THEN purchase with SUM(value): the span starts at the
    // RUN'S FIRST ROW, which the measures rewrite recovers by re-joining
    // the runs subquery (the r0 bound join). The truth here derives the
    // run boundaries INDEPENDENTLY — gaps-and-islands in the DataFrame
    // API — so a wrong boundary join cannot agree by construction.
    import org.apache.spark.sql.expressions.Window
    Tables.load(spark, sf)
    val e = spark.table("events")
    val wAll = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val wCls = Window.partitionBy("user_id", "event_type")
      .orderBy("ts", "event_id")
    val runs = e
      .withColumn("grp", row_number().over(wAll) -
        row_number().over(wCls))
      .filter(col("event_type") === "click")
      .groupBy("user_id", "grp")
      .agg(count(lit(1)).as("run_len"),
        min(struct(col("ts"), col("event_id"))).as("lo"),
        max(struct(col("ts"), col("event_id"))).as("hi"))
      .filter(col("run_len") >= 2)
      .select(col("user_id").as("k"),
        col("lo.ts").as("run_start"), col("lo.event_id").as("sid"),
        col("hi.ts").as("run_end"), col("run_len"))
    val wRun = Window.partitionBy("k", "run_end")
      .orderBy("ts", "event_id")
    val comp = runs.join(e,
        col("k") === col("user_id") && col("event_type") === "purchase" &&
          col("ts") > col("run_end") &&
          col("ts") <= col("run_end") +
            org.apache.spark.sql.functions.expr("INTERVAL 2 HOURS"))
      .withColumn("rn", row_number().over(wRun))
      .filter(col("rn") === 1)
      .select(col("k"), col("run_start"), col("sid"),
        col("run_end").as("ts_1"),
        col("ts").as("p_ts"), col("event_id").as("pid"))
    val want = comp.join(e.select(col("user_id").as("u"),
        col("ts").as("ets"), col("event_id").as("eid"),
        col("value").as("ev")),
        col("k") === col("u") &&
          (col("ets") > col("run_start") ||
            (col("ets") === col("run_start") && col("eid") >= col("sid"))) &&
          (col("ets") < col("p_ts") ||
            (col("ets") === col("p_ts") && col("eid") <= col("pid"))))
      .groupBy("k", "ts_1")
      .agg(sum("ev").as("sv"))
      .collect().map(r => (r.getLong(0), r.getTimestamp(1).getTime) ->
        r.getDouble(2)).toMap
    assert(want.nonEmpty, "fixture must produce head-quantified matches")
    val got = CepSql.sql(spark,
      """SELECT * FROM events
         MATCH PATTERN (click{2,} THEN purchase WITHIN '2' HOURS)
         PARTITION BY user_id
         MEASURES SUM(value) AS sv""")
      .select(col("user_id"), col("ts_1"), col("sv"))
      .collect().map(r => (r.getLong(0), r.getTimestamp(1).getTime) ->
        r.getDouble(2)).toMap
    assert(got.keySet === want.keySet)
    want.foreach { case (kk, w) =>
      assert(math.abs(got(kk) - w) < 1e-9, s"sum@$kk: ${got(kk)} vs $w")
    }
  }

  test("multi-measure MEASURES: span aggs + class refs + match_number (r8)") {
    Tables.load(spark, sf)
    val got = CepSql.sql(spark,
      """SELECT * FROM events
         MATCH PATTERN (signup THEN purchase WITHIN '12' HOURS)
         PARTITION BY user_id
         MEASURES COUNT(*) AS c, SUM(value) AS sv,
                  signup.value AS s_v, purchase.value AS p_v,
                  MATCH_NUMBER() AS mno""")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(5), r.getDouble(6), r.getDouble(7), r.getDouble(8),
        r.getLong(9), r.getTimestamp(3).getTime))
    assert(got.nonEmpty)
    // class refs recompute from the raw table by matched id
    val byId = spark.table("events")
      .select("event_id", "value").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    got.foreach { case (_, id1, id2, _, _, sv, pv, _, _) =>
      assert(sv === byId(id1), s"signup.value@$id1")
      assert(pv === byId(id2), s"purchase.value@$id2")
    }
    // match_number: per key, exactly 1..k in (ts_1, id_1) order
    got.groupBy(_._1).foreach { case (k, rows) =>
      assert(rows.sortBy(r => (r._9, r._2)).map(_._8).toSeq ===
        (1L to rows.length).toSeq,
        s"match_number sequence for key $k")
    }
    // span aggs agree with the r7 single-measure form
    val single = CepSql.sql(spark,
      """SELECT * FROM events
         MATCH PATTERN (signup THEN purchase WITHIN '12' HOURS)
         PARTITION BY user_id
         MEASURES COUNT(*)""")
      .select(col("id_1"), col("measure").cast("long"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    got.foreach { case (_, id1, _, c, _, _, _, _, _) =>
      assert(c === single(id1), s"span count@$id1")
    }
    // near-misses are loud
    Seq(
      "MEASURES nosuch.value",                       // unknown event
      "MEASURES SUM(value) AS a, COUNT(*) AS a",     // duplicate alias
      "MEASURES COUNT(*) AS id_1",                   // column collision
      "MEASURES COUNT(*) AS k",                      // key collision
      "MEASURES AVG(*)"                              // * is COUNT-only
    ).foreach { frag =>
      intercept[IllegalArgumentException](CepSql.parsePattern(
        "SELECT * FROM t MATCH PATTERN (a THEN b WITHIN '5' MINUTES) " +
          s"PARTITION BY k $frag"))
    }
    // an event appearing in two steps is ambiguous as a reference
    intercept[IllegalArgumentException](CepSql.parsePattern(
      "SELECT * FROM t MATCH PATTERN (a THEN a WITHIN '5' MINUTES) " +
        "PARTITION BY k MEASURES a.value"))
  }

  test("reluctant islands with same-microsecond run_end stay distinct " +
      "in MEASURES (ADVICE r9)") {
    // two lazy a{2,}? islands of ONE key whose m-th (=2nd) events share
    // a microsecond: pre-r9 the island re-join keyed on (run_end,
    // run_len) — run_len is the constant m for reluctant runs, so the
    // two islands cross-joined (inflated span sums) AND the (__k, ts_1)
    // anchor collapsed them to one match. run_start_id identity keeps
    // them distinct and numbers them deterministically.
    import java.sql.Timestamp
    import spark.implicits._
    val rows = Seq(
      (1L, "2026-01-01 00:00:00", 1L, "a", 1.0),
      (2L, "2026-01-01 00:00:01", 1L, "a", 2.0),  // island 1 ends here
      (3L, "2026-01-01 00:00:01", 1L, "x", 0.0),  // breaks the run
      (4L, "2026-01-01 00:00:01", 1L, "a", 4.0),  // island 2 starts
      (5L, "2026-01-01 00:00:01", 1L, "a", 8.0),  // island 2 ends — SAME
                                                  // microsecond as id=2
      (6L, "2026-01-01 00:04:00", 1L, "b", 16.0)) // completes both
    rows.map { case (id, ts, u, ty, v) =>
      (id, Timestamp.valueOf(ts), u, ty, v)
    }.toDF("event_id", "ts", "user_id", "event_type", "value")
      .createOrReplaceTempView("ev_tie")
    val got = CepSql.sql(spark,
      """SELECT * FROM ev_tie
         MATCH PATTERN (a{2,}? THEN b WITHIN '5' MINUTES)
         PARTITION BY user_id
         MEASURES SUM(value) AS sv, MATCH_NUMBER() AS mn""")
      .select("len_1", "ts_1", "sv", "mn").collect()
      .map(r => (r.getLong(0), r.getDouble(2), r.getLong(3))).sortBy(_._3)
    // island 1 spans ids 1..6 (sum 31), island 2 spans ids 4..6
    // (sum 28); numbering ties on ts_1 break by run start id
    assert(got.toSeq === Seq((2L, 31.0, 1L), (2L, 28.0, 2L)),
      s"got: ${got.toSeq}")
    spark.catalog.dropTempView("ev_tie")
  }

  test("bare class ref into a quantified run desugars to LAST " +
      "(MATCH_RECOGNIZE running semantics, r9)") {
    val spec = CepSql.parsePattern(
      """SELECT * FROM t
         MATCH PATTERN (a{2,} THEN b WITHIN '5' MINUTES)
         PARTITION BY k
         MEASURES a.value AS av, b.value AS bv""")
    assert(spec.measures === Seq(
      CepSql.BoundRef("LAST", "a", "value", 1, "av"),
      CepSql.ClassRef("b", "value", 2, "bv")),
      "quantified ref must become LAST; unquantified stays a class ref")
    // and it streams: the desugared BoundRef rides the boundary slots
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import java.sql.Timestamp
    implicit val sq = spark.sqlContext
    val stream = MemoryStream[CepEvent]
    stream.toDF().createOrReplaceTempView("pat_qref")
    val q = ContinuousQueries.submitPattern(spark,
      """SELECT * FROM pat_qref
         MATCH PATTERN (a{2,} THEN b WITHIN '5' MINUTES)
         PARTITION BY k
         MEASURES a.value AS av""".replace("PARTITION BY k",
        "PARTITION BY user_id"), "svc_qref")
    try {
      stream.addData(
        CepEvent(1, Timestamp.valueOf("2026-01-01 00:00:00"), 1, "a", 10),
        CepEvent(2, Timestamp.valueOf("2026-01-01 00:00:10"), 1, "a", 20),
        CepEvent(3, Timestamp.valueOf("2026-01-01 00:00:20"), 1, "x", 0),
        CepEvent(4, Timestamp.valueOf("2026-01-01 00:00:30"), 1, "b", 5))
      q.processAllAvailable()
      val got = spark.table("svc_qref").select("av").collect()
        .map(_.getDouble(0)).toSeq
      assert(got === Seq(20.0), "bare a.value = the run's LAST event")
    } finally {
      if (q.isActive) q.stop()
      spark.catalog.dropTempView("pat_qref")
    }
  }

  test("custom ts/type/id columns: STRING ids survive every r7 form") {
    import java.sql.Timestamp
    import spark.implicits._
    // the review-found hazard: the optional-step skip arm must emit a
    // NULL of the ID COLUMN'S OWN TYPE (string here), not a hardcoded
    // bigint — and the other new forms must take custom columns too
    val rows = Seq(
      ("e1", "2026-01-01 00:00:00", 7L, "signup", 1.0),
      ("e2", "2026-01-01 00:05:00", 7L, "purchase", 2.0),
      ("e3", "2026-01-01 00:00:00", 8L, "signup", 1.0),
      ("e4", "2026-01-01 00:03:00", 8L, "click", 0.0),
      ("e5", "2026-01-01 00:06:00", 8L, "purchase", 3.0))
    rows.map { case (id, ts, u, ty, v) =>
      (id, Timestamp.valueOf(ts), u, ty, v)
    }.toDF("my_id", "my_ts", "user_id", "my_type", "value")
      .createOrReplaceTempView("ev_custom")
    def run(text: String) = CepSql.sql(spark, text,
      tsCol = "my_ts", typeCol = "my_type", idCol = "my_id")
    // optional step: user 7 skips (string NULL), user 8 takes
    val opt = run(
      """SELECT * FROM ev_custom
         MATCH PATTERN (signup THEN click? THEN purchase WITHIN '30' MINUTES)
         PARTITION BY user_id""")
      .collect().map(r => (r.getLong(0), r.getString(1),
        Option(r.getString(2)), r.getString(3))).toSet
    assert(opt === Set(
      (7L, "e1", None, "e2"),
      (8L, "e3", Some("e4"), "e5")))
    // bounded quantifier parses and runs on the custom columns
    val bounded = run(
      """SELECT * FROM ev_custom
         MATCH PATTERN (click{1,2} THEN purchase WITHIN '30' MINUTES)
         PARTITION BY user_id""").collect()
    assert(bounded.length === 1 && bounded.head.getLong(1) === 1L)
    // PERMUTE and MEASURES run on the custom columns too
    val perm = run(
      """SELECT * FROM ev_custom
         MATCH PATTERN (PERMUTE(signup, purchase) WITHIN '30' MINUTES)
         PARTITION BY user_id""").collect()
    assert(perm.length === 2)
    val meas = run(
      """SELECT * FROM ev_custom
         MATCH PATTERN (signup THEN purchase WITHIN '30' MINUTES)
         PARTITION BY user_id
         MEASURES SUM(value)""")
      .collect().map(r => r.getString(1) -> r.getDouble(5)).toMap
    assert(meas === Map("e1" -> 3.0, "e3" -> 4.0))
    spark.catalog.dropTempView("ev_custom")
  }

  test("MATCH PATTERN: quoted events, unit variants, trailing ';' accepted") {
    Tables.load(spark, sf)
    // '1800' SECONDS ≡ '30' MINUTES; quoted event names; trailing ';'
    val got = CepSql.sql(spark,
      """SELECT * FROM events
         MATCH PATTERN ('signup' THEN 'purchase' WITHIN '1800' SECONDS)
         PARTITION BY user_id;""")
    val want = graft.SparkEntry.queries("q_cep_seq")(spark, sf)
    assert(got.collect().map(_.toSeq).toSeq ===
      want.collect().map(_.toSeq).toSeq)
  }

  test("malformed MATCH PATTERN is rejected loudly, literal form is data") {
    // missing PARTITION BY
    intercept[IllegalArgumentException] {
      CepSql.translate(
        "SELECT * FROM events MATCH PATTERN (a THEN b WITHIN '30' MINUTES)")
    }
    // projection other than * (the output schema is fixed by the rewrite)
    intercept[IllegalArgumentException] {
      CepSql.translate(
        """SELECT sid FROM events
           MATCH PATTERN (a THEN b WITHIN '30' MINUTES)
           PARTITION BY user_id""")
    }
    // a NOT step cannot be quantified
    intercept[IllegalArgumentException] {
      CepSql.translate(
        """SELECT * FROM events
           MATCH PATTERN (a THEN NOT b{2,} WITHIN '30' MINUTES)
           PARTITION BY user_id""")
    }
    // SKIP PAST LAST ROW does not combine with absence or quantifiers
    intercept[IllegalArgumentException] {
      CepSql.translate(
        """SELECT * FROM events
           MATCH PATTERN (a THEN NOT b WITHIN '30' MINUTES)
           PARTITION BY user_id AFTER MATCH SKIP PAST LAST ROW""")
    }
    intercept[IllegalArgumentException] {
      CepSql.translate(
        """SELECT * FROM events
           MATCH PATTERN (a{2,} THEN b WITHIN '30' MINUTES)
           PARTITION BY user_id AFTER MATCH SKIP PAST LAST ROW""")
    }
    // a huge-but-valid WITHIN numeral overflows loudly, not to a
    // negative window that silently matches nothing
    intercept[IllegalArgumentException] {
      CepSql.translate(
        """SELECT * FROM events
           MATCH PATTERN (a THEN b WITHIN '9999999999999999' HOURS)
           PARTITION BY user_id""")
    }
    // ...but the keyword inside a string literal is data, untouched
    val q = "SELECT 'MATCH PATTERN' AS s FROM t"
    assert(CepSql.translate(q) === q)
  }

  test("alternation step == IN-predicate recomputation (r7)") {
    Tables.load(spark, sf)
    val got = CepSql.sql(spark,
      """SELECT * FROM events
         MATCH PATTERN (signup THEN click|purchase WITHIN '30' MINUTES)
         PARTITION BY user_id""")
    val want = spark.sql(
      """SELECT user_id, sid, pid, s_ts, p_ts FROM (
           SELECT a.user_id, a.event_id AS sid, b.event_id AS pid,
             a.ts AS s_ts, b.ts AS p_ts,
             row_number() OVER (PARTITION BY a.event_id
                                ORDER BY b.ts, b.event_id) AS rn
           FROM events a JOIN events b
             ON a.user_id = b.user_id AND a.event_type = 'signup'
            AND b.event_type IN ('click', 'purchase')
            AND b.ts > a.ts AND b.ts <= a.ts + INTERVAL 30 MINUTES) t
         WHERE rn = 1 ORDER BY sid""")
    assert(got.collect().map(_.toSeq).toSeq ===
      want.collect().map(_.toSeq).toSeq)
    assert(got.collect().nonEmpty)
  }

  test("step condition (DEFINE-lite) == widened-predicate recomputation (r7)") {
    Tables.load(spark, sf)
    val got = CepSql.sql(spark,
      """SELECT * FROM events
         MATCH PATTERN (signup THEN purchase(value > 50) WITHIN '30' MINUTES)
         PARTITION BY user_id""")
    val want = spark.sql(
      """SELECT user_id, sid, pid, s_ts, p_ts FROM (
           SELECT a.user_id, a.event_id AS sid, b.event_id AS pid,
             a.ts AS s_ts, b.ts AS p_ts,
             row_number() OVER (PARTITION BY a.event_id
                                ORDER BY b.ts, b.event_id) AS rn
           FROM events a JOIN events b
             ON a.user_id = b.user_id AND a.event_type = 'signup'
            AND b.event_type = 'purchase' AND b.value > 50
            AND b.ts > a.ts AND b.ts <= a.ts + INTERVAL 30 MINUTES) t
         WHERE rn = 1 ORDER BY sid""")
    assert(got.collect().map(_.toSeq).toSeq ===
      want.collect().map(_.toSeq).toSeq)
    // the condition must bite: strictly fewer matches than unconditioned
    val base = CepSql.sql(spark,
      """SELECT * FROM events
         MATCH PATTERN (signup THEN purchase WITHIN '30' MINUTES)
         PARTITION BY user_id""").count()
    assert(got.count() < base && got.count() > 0)

    // condition on a NOT step: absence of a QUALIFYING completion —
    // supersets the unconditioned absence (harder to cancel)
    val absCond = CepSql.sql(spark,
      """SELECT * FROM events
         MATCH PATTERN (signup THEN NOT purchase(value > 50) WITHIN '30' MINUTES)
         PARTITION BY user_id""").count()
    val absBase = CepSql.sql(spark,
      """SELECT * FROM events
         MATCH PATTERN (signup THEN NOT purchase WITHIN '30' MINUTES)
         PARTITION BY user_id""").count()
    assert(absCond >= absBase)

    // condition inside a quantified class: runs of high-value clicks
    val runCond = CepSql.sql(spark,
      """SELECT * FROM events
         MATCH PATTERN (click(value >= 0){2,} THEN purchase WITHIN '12' HOURS)
         PARTITION BY user_id""")
    val runBase = CepSql.sql(spark,
      """SELECT * FROM events
         MATCH PATTERN (click{2,} THEN purchase WITHIN '12' HOURS)
         PARTITION BY user_id""")
    // value >= 0 is vacuously true on the fixture -> identical result
    assert(runCond.collect().map(_.toSeq).toSeq ===
      runBase.collect().map(_.toSeq).toSeq)
  }

  test("AFTER MATCH SKIP TO NEXT ROW is accepted and is the default") {
    Tables.load(spark, sf)
    val explicit = CepSql.sql(spark,
      """SELECT * FROM events
         MATCH PATTERN (signup THEN purchase WITHIN '30' MINUTES)
         PARTITION BY user_id AFTER MATCH SKIP TO NEXT ROW""")
    val default = CepSql.sql(spark,
      """SELECT * FROM events
         MATCH PATTERN (signup THEN purchase WITHIN '30' MINUTES)
         PARTITION BY user_id""")
    assert(explicit.collect().map(_.toSeq).toSeq ===
      default.collect().map(_.toSeq).toSeq)
  }

  test("mid-chain {m,} quantifier == brute-force greedy recomputation (r7)") {
    Tables.load(spark, sf)
    val got = CepSql.sql(spark,
      """SELECT * FROM events
         MATCH PATTERN (signup THEN click{2,} THEN purchase WITHIN '24' HOURS)
         PARTITION BY user_id""")
    assert(got.columns.toSeq ===
      Seq("user_id", "id_1", "len_2", "id_3", "ts_1", "ts_2", "ts_3"))

    // independent Scala recomputation: per user, sort the FULL stream by
    // (ts, id); runs = maximal stretches of consecutive clicks; for each
    // signup anchor pick the first (run_start, run_end) run of len >= 2
    // with run_start > ts_1 and run_end <= ts_1 + 24h, then the first
    // purchase in (ts_2, ts_1 + 24h]
    def us(t: java.sql.Timestamp): Long =
      t.getTime / 1000 * 1000000L + t.getNanos / 1000
    val H24 = 24L * 3600 * 1000000L
    val evs = Tables.table(spark, sf, "events")
      .select("user_id", "event_id", "ts", "event_type")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getTimestamp(2), r.getString(3)))
      .groupBy(_._1)
    val expected = evs.toSeq.flatMap { case (u, rows0) =>
      val rows = rows0.sortBy(r => (us(r._3), r._2))
      // runs of consecutive clicks: (len, startUs, endUs, endTs)
      val runs = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long)]
      var i = 0
      while (i < rows.length) {
        if (rows(i)._4 == "click") {
          var j = i
          while (j + 1 < rows.length && rows(j + 1)._4 == "click") j += 1
          if (j - i + 1 >= 2) runs += ((j - i + 1L, us(rows(i)._3), us(rows(j)._3)))
          i = j + 1
        } else i += 1
      }
      rows.filter(_._4 == "signup").flatMap { a =>
        val t1 = us(a._3)
        runs.filter(r => r._2 > t1 && r._3 <= t1 + H24)
          .sortBy(r => (r._2, r._3)).headOption.flatMap { r =>
            rows.filter(e => e._4 == "purchase" && us(e._3) > r._3 &&
                us(e._3) <= t1 + H24)
              .sortBy(e => (us(e._3), e._2)).headOption
              .map(p => (u, a._2, r._1, p._2, us(a._3), r._3, us(p._3)))
          }
      }
    }.sortBy(_._2)
    val gotRows = got.collect().map(r => (r.getLong(0), r.getLong(1),
      r.getLong(2), r.getLong(3), us(r.getTimestamp(4)),
      us(r.getTimestamp(5)), us(r.getTimestamp(6)))).toSeq
    assert(gotRows === expected)
    assert(gotRows.nonEmpty)
  }

  test("absence after a quantified chain == anti join on the run prefix (r8)") {
    Tables.load(spark, sf)
    val got = CepSql.sql(spark,
      """SELECT * FROM events
         MATCH PATTERN (signup THEN click{2,} THEN NOT purchase
         WITHIN '24' HOURS)
         PARTITION BY user_id""")
    assert(got.columns.toSeq ===
      Seq("user_id", "id_1", "len_2", "ts_1", "ts_2"))
    // the quantified prefixes (signup → first qualifying click run)
    // split EXACTLY into completed (the mid-times key's statement) and
    // absent (this one) on the anchor id — same identity the r6 plain
    // 3-step absence test pins, now over a quantified prefix
    val full = CepSql.sql(spark,
      """SELECT * FROM events
         MATCH PATTERN (signup THEN click{2,} THEN purchase
         WITHIN '24' HOURS)
         PARTITION BY user_id""")
    val prefix = CepSql.sql(spark,
      """SELECT * FROM events
         MATCH PATTERN (signup THEN click{2,} WITHIN '24' HOURS)
         PARTITION BY user_id""")
    val gotIds = got.select("id_1").collect().map(_.getLong(0)).toSet
    val fullIds = full.select("id_1").collect().map(_.getLong(0)).toSet
    val prefIds = prefix.select("id_1").collect().map(_.getLong(0)).toSet
    assert(gotIds.intersect(fullIds).isEmpty)
    assert(gotIds.union(fullIds) === prefIds)
    assert(gotIds.nonEmpty, "fixture must produce unconverted prefixes")
    // and the prefix rows carried into the absence output are unchanged
    val gotPref = got.collect()
      .map(r => (r.getLong(1), r.getLong(2))).toMap
    val prefRows = prefix.collect()
      .map(r => (r.getLong(1), r.getLong(2))).toMap
    gotPref.foreach { case (id1, len2) =>
      assert(prefRows(id1) === len2,
        s"absence row for anchor $id1 must carry the prefix run length")
    }
  }

  test("parser extension: reference dialect runs via plain spark.sql") {
    Tables.load(spark, sf) // warm shared context first
    val old = spark
    org.apache.spark.sql.SparkSession.clearActiveSession()
    org.apache.spark.sql.SparkSession.clearDefaultSession()
    val s2 = org.apache.spark.sql.SparkSession.builder()
      .master("local[4]")
      // spark.sql.extensions is STATIC conf — ignored when the shared
      // test SparkContext already exists — so inject the same class
      // programmatically (identical code path post-injection)
      .withExtensions(ext => new graft.plans.GraftExtensions()(ext))
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    try {
      assert(s2 ne old)
      assert(s2.sessionState.sqlParser.isInstanceOf[CepSqlParser])
      Tables.load(s2, sf)
      // NO manual translate call — the injected parser does the rewrite
      val got = s2.sql(
        """SELECT event_type, COUNT(*) AS cnt FROM events
           OVER (WINDOW '1800' SECONDS, SLIDE '600' SECONDS)
           GROUP BY event_type""")
        .collect().map(_.toSeq).toSeq.sortBy(_.toString)
      val want = Tables.table(s2, sf, "events")
        .groupBy(window(col("ts"), "1800 seconds", "600 seconds"),
          col("event_type"))
        .agg(count(lit(1)).as("cnt"))
        .select(col("event_type"), col("cnt"))
        .collect().map(_.toSeq).toSeq.sortBy(_.toString)
      assert(got === want)
      // MATCH PATTERN flows through the SAME injected parser — sequence
      // CEP reachable from plain spark.sql, results ≡ the q_cep_seq key
      val pat = s2.sql(
        """SELECT * FROM events
           MATCH PATTERN (signup THEN purchase WITHIN '30' MINUTES)
           PARTITION BY user_id""")
        .collect().map(_.toSeq).toSeq
      val patWant = graft.SparkEntry.queries("q_cep_seq")(s2, sf)
        .collect().map(_.toSeq).toSeq
      assert(pat === patWant)
      // absence form through the same parser
      val abs = s2.sql(
        """SELECT * FROM events
           MATCH PATTERN (signup THEN NOT purchase WITHIN '30' MINUTES)
           PARTITION BY user_id""")
        .collect().map(_.toSeq).toSeq
      val absWant = graft.SparkEntry.queries("q_cep_absence")(s2, sf)
        .collect().map(_.toSeq).toSeq
      assert(abs === absWant)
      // non-dialect SQL still parses through the delegate untouched
      assert(s2.sql("SELECT 1 AS one").collect().head.getInt(0) === 1)
    } finally {
      org.apache.spark.sql.SparkSession.setDefaultSession(old)
      org.apache.spark.sql.SparkSession.setActiveSession(old)
    }
  }
}
