package graft.streaming

import java.util.regex.Pattern

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.parser.ParserInterface
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.types.{DataType, StructType}

/** Reference-dialect SQL adapter (SURVEY §3.1 EP2): spark-cep queries carry
  * their window in a trailing `OVER (WINDOW 'w' SECONDS, SLIDE 's'
  * SECONDS)` clause on the stream table (recalled public syntax, SURVEY §0
  * [R]). Spark expresses the same thing as a `window(ts, ...)` grouping
  * key, so a migrating user's query strings need one mechanical rewrite —
  * this performs it, letting reference-dialect text run unchanged on graft:
  *
  *  - `OVER (WINDOW 'w' SECONDS, SLIDE 's' SECONDS)` → sliding window
  *  - `OVER (WINDOW 'w' SECONDS)` → tumbling window (window == slide)
  *  - `MATCH PATTERN (e1[{m,}] THEN e2 [THEN e3 …] [THEN NOT eN] WITHIN
  *    'n' <unit>) PARTITION BY k` → sequence / absence / N-step-chain /
  *    quantified-run CEP as plain Spark SQL (see [[translatePattern]])
  *
  * The clause is removed and `window(<tsCol>, ...)` is prepended to the
  * GROUP BY (created if absent). Semantics upgrade exactly as documented
  * in MIGRATION.md: the reference windows on arrival time; the rewritten
  * query windows on event time (`tsCol`), which is the deterministic,
  * replayable behavior — and identical in batch and streaming.
  *
  * The rewrite is SYNTAX-AWARE, not purely regex: clause positions are
  * validated against a single-pass lexical scan (string/identifier
  * literals, `--` and bracketed comments, paren depth), so a GROUP BY
  * inside a subquery or a keyword inside a string literal is never the
  * injection target, and a statement with more than one OVER-window
  * clause (or one nested in a subquery) is rejected loudly rather than
  * silently mis-rewritten.
  *
  * For zero-code-change migration the same translation is available as a
  * parser extension ([[CepSqlParser]], injected by
  * [[graft.plans.GraftExtensions]]): with
  * `spark.sql.extensions=graft.plans.GraftExtensions`, reference-dialect
  * text runs through plain `spark.sql(...)` directly.
  */
object CepSql {
  private val over = Pattern.compile(
    """OVER\s*\(\s*WINDOW\s*'(\d+)'\s*SECONDS?\s*(?:,\s*SLIDE\s*'(\d+)'\s*SECONDS?\s*)?\)""",
    Pattern.CASE_INSENSITIVE)
  private val matchPat = Pattern.compile("MATCH\\s+PATTERN",
    Pattern.CASE_INSENSITIVE)
  /** The full MATCH PATTERN statement grammar (sequence CEP from SQL —
    * SURVEY EP1/EP3's pattern surface):
    *
    * {{{
    * SELECT * FROM <table>
    * MATCH PATTERN (<e1>[{m,}] THEN <e2> [THEN <e3> …] [THEN NOT <eN>]
    *                WITHIN '<n>' SECONDS|MINUTES|HOURS)
    * PARTITION BY <key>
    * }}}
    *
    * Chains of any length ≥ 2; `NOT` is legal on the FINAL step only
    * (absence of a completion after a matched prefix); `{m,}` on the
    * FIRST step only quantifies it as a maximal run of ≥ m consecutive
    * events (then exactly one THEN step). Anchored end-to-end: the
    * pattern statement IS the whole statement (projection/extra
    * predicates belong in a view over the result). */
  private val patternStmt = Pattern.compile(
    "^\\s*SELECT\\s+\\*\\s+FROM\\s+([A-Za-z_][\\w.]*)\\s+" +
      "MATCH\\s+PATTERN\\s*\\(\\s*" +
      "('?\\w+'?(?:\\{\\d+,\\})?(?:\\s+THEN\\s+(?:NOT\\s+)?'?\\w+'?(?:\\{\\d+,\\})?)+)" +
      "\\s+WITHIN\\s+'(\\d+)'\\s+(SECONDS?|MINUTES?|HOURS?)\\s*\\)" +
      "\\s+PARTITION\\s+BY\\s+([A-Za-z_]\\w*)\\s*;?\\s*$",
    Pattern.CASE_INSENSITIVE)
  private val thenSplit = Pattern.compile("\\s+THEN\\s+",
    Pattern.CASE_INSENSITIVE)
  private val stepTok =
    Pattern.compile("(?i)^(NOT\\s+)?'?(\\w+)'?(?:\\{(\\d+),\\})?$")
  private val groupBy = Pattern.compile("GROUP\\s+BY", Pattern.CASE_INSENSITIVE)
  private val tail = Pattern.compile(
    "\\b(HAVING|ORDER\\s+BY|LIMIT)\\b|;", Pattern.CASE_INSENSITIVE)
  private val setOp = Pattern.compile(
    "\\b(UNION|INTERSECT|EXCEPT)\\b", Pattern.CASE_INSENSITIVE)

  /** Per-character lexical state from one left-to-right scan:
    * `lit(i)` — position i is inside a quoted literal ('…', "…", `…`) or
    * a comment; `depth(i)` — parenthesis nesting depth at position i
    * (0 = top level of the statement). */
  private def scan(q: String): (Array[Boolean], Array[Int]) = {
    val n = q.length
    val lit = new Array[Boolean](n)
    val depth = new Array[Int](n)
    var i = 0; var d = 0
    var quote: Char = 0     // active quote char, 0 if none
    var lineC = false        // in -- comment
    var blockC = false       // in /* */ comment
    while (i < n) {
      val c = q.charAt(i)
      lit(i) = quote != 0 || lineC || blockC
      depth(i) = d
      if (lineC) { if (c == '\n') lineC = false }
      else if (blockC) {
        if (c == '*' && i + 1 < n && q.charAt(i + 1) == '/') {
          lit(i + 1) = true; depth(i + 1) = d; i += 1; blockC = false
        }
      } else if (quote != 0) {
        if (c == '\\' && quote != '`' && i + 1 < n) {
          lit(i + 1) = true; depth(i + 1) = d; i += 1 // backslash escape
        } else if (c == quote) {
          if (i + 1 < n && q.charAt(i + 1) == quote) {
            lit(i + 1) = true; depth(i + 1) = d; i += 1 // doubled quote
          } else quote = 0
        }
      } else c match {
        case '\'' | '"' | '`' => quote = c; lit(i) = true
        case '-' if i + 1 < n && q.charAt(i + 1) == '-' => lineC = true; lit(i) = true
        case '/' if i + 1 < n && q.charAt(i + 1) == '*' => blockC = true; lit(i) = true
        case '(' => d += 1; depth(i) = d // '(' itself counts as inside
        case ')' => d -= 1
        case _ => ()
      }
      i += 1
    }
    (lit, depth)
  }

  /** Rewrite one reference-dialect statement to Spark SQL. Statements
    * without an OVER-window clause pass through unchanged (the relational
    * dialect is already Spark-compatible). Throws `IllegalArgumentException`
    * on ambiguous input: multiple OVER-window clauses, or one inside a
    * subquery (the reference dialect allows exactly one, on the top-level
    * stream scan). */
  def translate(q: String, tsCol: String = "ts",
      typeCol: String = "event_type", idCol: String = "event_id"): String = {
    // fast path: the injected parser routes EVERY statement through here,
    // so don't build the scan arrays unless a clause can possibly match
    val mayOver = over.matcher(q).find()
    val mayPat = matchPat.matcher(q).find()
    if (!mayOver && !mayPat) return q
    val (lit, depth) = scan(q)
    if (mayPat) {
      // a MATCH PATTERN inside a string literal is data, not a clause
      val mp = matchPat.matcher(q)
      var real = false
      while (mp.find() && !real) if (!lit(mp.start())) real = true
      if (real) return translatePattern(q, tsCol, typeCol, idCol)
    }
    if (!mayOver) return q
    val m = over.matcher(q)
    var found: Option[(Int, Int, String, String)] = None
    while (m.find()) {
      if (!lit(m.start())) { // a match inside a string literal is data
        if (found.isDefined)
          throw new IllegalArgumentException(
            "multiple OVER (WINDOW …) clauses in one statement — the " +
              "stream dialect allows exactly one, on the outer query")
        if (depth(m.start()) != 0)
          throw new IllegalArgumentException(
            "OVER (WINDOW …) inside a subquery is not supported — window " +
              "the outer query, or use window()/DataFrame API directly")
        val w = s"${m.group(1)} seconds"
        val sl = Option(m.group(2)).map(x => s"$x seconds").getOrElse(w)
        found = Some((m.start(), m.end(), w, sl))
      }
    }
    found match {
      case None => q
      case Some((a, b, w, sl)) =>
        val winExpr = s"window($tsCol, '$w', '$sl')"
        val stripped = q.substring(0, a) + q.substring(b)
        val (slit, sdepth) = scan(stripped)
        def firstTopLevel(p: Pattern): Option[java.util.regex.Matcher] = {
          val mm = p.matcher(stripped)
          while (mm.find())
            if (!slit(mm.start()) && sdepth(mm.start()) == 0) return Some(mm)
          None
        }
        // multi-statement text makes the injection target ambiguous the
        // same way: the first top-level GROUP BY (or HAVING/ORDER BY/LIMIT
        // anchor) found in the WHOLE text may belong to a different
        // ';'-separated statement than the one carrying the OVER clause,
        // silently windowing the wrong statement — reject loudly. A
        // trailing ';' (nothing but whitespace after it) stays legal.
        var si = 0
        while (si < stripped.length) {
          // "content" = non-whitespace OUTSIDE literals/comments: a
          // trailing "; -- note" is still a single statement
          if (stripped.charAt(si) == ';' && !slit(si) && sdepth(si) == 0 &&
              (si + 1 until stripped.length).exists(j =>
                !slit(j) && !stripped.charAt(j).isWhitespace))
            throw new IllegalArgumentException(
              "OVER (WINDOW …) in multi-statement text is ambiguous — " +
                "submit the windowed statement on its own")
          si += 1
        }
        // a top-level set operation makes the injection target ambiguous
        // (the first top-level GROUP BY may belong to a DIFFERENT branch
        // than the one carrying the OVER clause) — reject loudly
        if (firstTopLevel(setOp).isDefined)
          throw new IllegalArgumentException(
            "OVER (WINDOW …) in a UNION/INTERSECT/EXCEPT statement is " +
              "ambiguous — window the branch inside a subquery instead")
        firstTopLevel(groupBy) match {
          case Some(gm) =>
            // prepend the window key to the existing top-level GROUP BY
            stripped.substring(0, gm.end()) + s" $winExpr," +
              stripped.substring(gm.end())
          case None =>
            // no GROUP BY: insert one before HAVING/ORDER BY/LIMIT (or at end)
            val at = firstTopLevel(tail).map(_.start()).getOrElse(stripped.length)
            stripped.substring(0, at).stripTrailing() +
              s" GROUP BY $winExpr " + stripped.substring(at)
        }
    }
  }

  /** One parsed pattern step: `NOT`? event name, `{m,}` quantifier? */
  case class PatternStep(negated: Boolean, event: String,
      minTimes: Option[Int])

  /** A fully parsed-and-validated MATCH PATTERN statement — the shared
    * front half of [[translatePattern]] (batch SQL rewrite) and
    * [[ContinuousQueries.submitPattern]] (streaming detector dispatch). */
  case class PatternSpec(table: String, steps: Seq[PatternStep],
      n: Long, unit: String, key: String) {
    def absent: Boolean = steps.last.negated
    def withinMs: Long = unit match {
      case "SECONDS" => n * 1000L
      case "MINUTES" => n * 60L * 1000L
      case _         => n * 3600L * 1000L
    }
  }

  /** Parse + validate one MATCH PATTERN statement (loud on every
    * near-miss — see [[patternStmt]] for the grammar). */
  def parsePattern(q: String): PatternSpec = {
    def malformed(detail: String): Nothing =
      throw new IllegalArgumentException(
        "malformed MATCH PATTERN statement — expected exactly: SELECT * " +
          "FROM <table> MATCH PATTERN (<e1>[{m,}] THEN <e2> [THEN <e3> …] " +
          "[THEN NOT <eN>] WITHIN '<n>' SECONDS|MINUTES|HOURS) " +
          s"PARTITION BY <key> ($detail)")
    val m = patternStmt.matcher(q)
    if (!m.matches()) malformed("statement shape")
    val steps = thenSplit.split(m.group(2).trim).toSeq.map { tok =>
      val sm = stepTok.matcher(tok.trim)
      if (!sm.matches()) malformed(s"bad step token '$tok'")
      PatternStep(sm.group(1) != null, sm.group(2),
        Option(sm.group(3)).map(_.toInt))
    }
    if (steps.head.negated) malformed("NOT on the first step")
    if (steps.init.exists(_.negated))
      malformed("NOT is legal on the final step only")
    // {m,} is the RUN quantifier: first step only, 2-step pattern only —
    // `a{m,} THEN [NOT] b` = a maximal run of >= m consecutive a's,
    // completed (or not) by a b within the window of the RUN'S END
    if (steps.tail.exists(_.minTimes.isDefined))
      malformed("a {m,} quantifier is legal on the first step only")
    if (steps.head.minTimes.isDefined && steps.length != 2)
      malformed("a quantified first step takes exactly one THEN step")
    steps.head.minTimes.foreach { mt =>
      if (mt < 1) malformed("quantifier minimum must be >= 1")
    }
    val unit = m.group(4).toUpperCase(java.util.Locale.ROOT) match {
      case u if u.startsWith("SEC") => "SECONDS"
      case u if u.startsWith("MIN") => "MINUTES"
      case _                        => "HOURS"
    }
    val n =
      try m.group(3).toLong
      catch { case _: NumberFormatException =>
        malformed(s"WITHIN numeral '${m.group(3)}' out of range") }
    PatternSpec(m.group(1), steps, n, unit, m.group(5))
  }

  /** Rewrite one MATCH PATTERN statement (see [[patternStmt]]) to plain
    * Spark SQL — the SQL-string surface for sequence CEP, so a reference
    * user's continuous pattern text runs through `spark.sql` like the
    * OVER-window dialect does.
    *
    *  - `a THEN b WITHIN '<n>' <unit>`: for each `a` event, the FIRST `b`
    *    event of the same `key` with ts in (a.ts, a.ts + n unit] — AFTER
    *    MATCH SKIP TO NEXT ROW, exactly the q_cep_seq formulation (equi
    *    self-join on the key + range predicate + per-a-row top-1). Output:
    *    (key, sid, pid, s_ts, p_ts), ordered by sid.
    *  - `a THEN NOT b WITHIN …`: absence — `a` events with NO qualifying
    *    `b` (left-anti), the q_cep_absence formulation. Output:
    *    (sid, key, s_ts), ordered by sid.
    *  - `e1 THEN e2 THEN e3 [… THEN eN] WITHIN …` (r6): N-step chains.
    *    Greedy left-to-right: step i is the FIRST `e_i` event of the key
    *    strictly after the matched `e_{i-1}` and no later than the
    *    ANCHOR's ts + n unit (the whole chain fits in one window measured
    *    from step 1 — the standard CEP WITHIN). One match per anchor
    *    (skip-to-next-row), built as i-1 chained rank-1 joins. Output:
    *    (key, id_1…id_N, ts_1…ts_N), ordered by id_1. `THEN NOT eN` on
    *    the final step = matched N-1 prefix with NO completion (anti
    *    join); `NOT` anywhere else is rejected.
    *
    * Event names compare against `typeCol`; event ids come from `idCol`;
    * both default to the events-table conventions and are overridable via
    * `spark.graft.cep.typeColumn` / `spark.graft.cep.idColumn` on the
    * injected-parser path. Batch/interactive surface: the rewrite uses a
    * ranking window (sequence) / anti join (absence), which Structured
    * Streaming does not support incrementally — the streaming twins are
    * [[CepSequence]] / [[AbsenceDetector]] (N-step: [[PatternMatch]]).
    *
    * A statement that *mentions* MATCH PATTERN but does not match the
    * grammar end-to-end is rejected loudly — a silent pass-through would
    * surface as a confusing Spark parser error on CEP syntax. */
  private def translatePattern(q: String, tsCol: String, typeCol: String,
      idCol: String): String = {
    val spec = parsePattern(q)
    val tbl = spec.table
    val steps = spec.steps
    val absent = spec.absent
    val n = spec.n.toString
    val unit = spec.unit
    val key = spec.key
    def bq(c: String) = s"`$c`"
    val (k, t, ty, id) = (bq(key), bq(tsCol), bq(typeCol), bq(idCol))
    if (steps.head.minTimes.isDefined) {
      // quantified run: the q_cep_times formulation — maximal runs of
      // consecutive evA per key (gaps-and-islands: difference of two
      // row_numbers), length >= mt, then the first evB strictly after the
      // run's END and within the window of it. Sequence output:
      // (key, run_len, run_start, run_end, b_ts); absence output drops
      // b_ts and keeps runs with NO qualifying completion.
      val mt = steps.head.minTimes.get
      val (evA, evB) = (steps.head.event, steps.last.event)
      val runs =
        s"""(SELECT $k AS __k, count(*) AS run_len,
           |   min($t) AS run_start, max($t) AS run_end
           | FROM (SELECT $k, $ty, $t, $id,
           |         row_number() OVER (PARTITION BY $k
           |                            ORDER BY $t, $id)
           |       - row_number() OVER (PARTITION BY $k, $ty
           |                            ORDER BY $t, $id) AS __grp
           |       FROM $tbl) o
           | WHERE $ty = '$evA'
           | GROUP BY $k, __grp HAVING count(*) >= $mt)""".stripMargin
      val range = s"b.$t > r.run_end AND b.$t <= r.run_end + " +
        s"INTERVAL $n $unit"
      if (absent)
        s"""SELECT r.__k AS $k, r.run_len, r.run_start, r.run_end
           |FROM $runs r
           |LEFT ANTI JOIN (SELECT * FROM $tbl WHERE $ty = '$evB') b
           |ON r.__k = b.$k AND $range
           |ORDER BY $k, run_start""".stripMargin
      else
        s"""SELECT r.__k AS $k, r.run_len, r.run_start, r.run_end,
           |  min(b.$t) AS b_ts
           |FROM $runs r
           |JOIN (SELECT * FROM $tbl WHERE $ty = '$evB') b
           |ON r.__k = b.$k AND $range
           |GROUP BY r.__k, r.run_len, r.run_start, r.run_end
           |ORDER BY $k, run_start""".stripMargin
    } else if (steps.length == 2) {
      // 2-step keeps the original q_cep_seq / q_cep_absence output shape
      val (evA, evB) = (steps.head.event, steps.last.event)
      val range = s"b.$t > a.$t AND b.$t <= a.$t + INTERVAL $n $unit"
      if (absent)
        s"""SELECT a.$id AS sid, a.$k AS $k, a.$t AS s_ts
           |FROM (SELECT * FROM $tbl WHERE $ty = '$evA') a
           |LEFT ANTI JOIN (SELECT * FROM $tbl WHERE $ty = '$evB') b
           |ON a.$k = b.$k AND $range
           |ORDER BY sid""".stripMargin
      else
        s"""SELECT $k, sid, pid, s_ts, p_ts FROM (
           |  SELECT a.$k AS $k, a.$id AS sid, b.$id AS pid,
           |         a.$t AS s_ts, b.$t AS p_ts,
           |         row_number() OVER (PARTITION BY a.$id
           |                            ORDER BY b.$t, b.$id) AS __rn
           |  FROM $tbl a JOIN $tbl b
           |  ON a.$k = b.$k AND a.$ty = '$evA' AND b.$ty = '$evB' AND $range
           |) WHERE __rn = 1 ORDER BY sid""".stripMargin
    } else {
      // N ≥ 3: chain of rank-1 joins. `prefix` selects
      // (__k, id_1…id_i, ts_1…ts_i), one row per surviving anchor id_1.
      val chainSteps = if (absent) steps.init else steps
      def cols(i: Int): String =
        (1 to i).map(j => s"id_$j").mkString(", ") + ", " +
          (1 to i).map(j => s"ts_$j").mkString(", ")
      var prefix =
        s"""(SELECT $k AS __k, $id AS id_1, $t AS ts_1
           |   FROM $tbl WHERE $ty = '${chainSteps.head.event}')""".stripMargin
      for (i <- 2 to chainSteps.length) {
        val ev = chainSteps(i - 1).event
        prefix =
          s"""(SELECT __k, ${cols(i)} FROM (
             |  SELECT p.__k, ${(1 until i).map(j => s"p.id_$j").mkString(", ")},
             |         b.$id AS id_$i,
             |         ${(1 until i).map(j => s"p.ts_$j").mkString(", ")},
             |         b.$t AS ts_$i,
             |         row_number() OVER (PARTITION BY p.id_1
             |                            ORDER BY b.$t, b.$id) AS __rn
             |  FROM $prefix p JOIN $tbl b
             |  ON p.__k = b.$k AND b.$ty = '$ev'
             |     AND b.$t > p.ts_${i - 1}
             |     AND b.$t <= p.ts_1 + INTERVAL $n $unit
             |) WHERE __rn = 1)""".stripMargin
      }
      val np = chainSteps.length
      if (absent) {
        val evN = steps.last.event
        s"""SELECT __k AS $k, ${cols(np)}
           |FROM $prefix p
           |LEFT ANTI JOIN (SELECT * FROM $tbl WHERE $ty = '$evN') b
           |ON p.__k = b.$k AND b.$t > p.ts_$np
           |   AND b.$t <= p.ts_1 + INTERVAL $n $unit
           |ORDER BY id_1""".stripMargin
      } else
        s"""SELECT __k AS $k, ${cols(np)}
           |FROM $prefix
           |ORDER BY id_1""".stripMargin
    }
  }

  /** Translate and run against the session's registered views (batch or
    * streaming — the plan is identical either way). */
  def sql(spark: SparkSession, q: String, tsCol: String = "ts",
      typeCol: String = "event_type", idCol: String = "event_id"): DataFrame =
    spark.sql(translate(q, tsCol, typeCol, idCol))
}

/** Parser extension delegating to Spark's parser after the reference-
  * dialect rewrite — the idiomatic endpoint SURVEY §3.2 names for the
  * reference's forked-parser EP1 surface. Plan-level entry points get the
  * rewrite; expression/identifier/type entry points pass straight through
  * (the dialect only extends full statements). The event-time column is
  * read per statement from `spark.graft.cep.tsColumn` (default `ts`). */
class CepSqlParser(session: SparkSession, delegate: ParserInterface)
    extends ParserInterface {
  private def conf(key: String, default: String): String =
    try session.conf.get(key, default)
    catch { case _: Throwable => default }
  private def t(sqlText: String): String = CepSql.translate(sqlText,
    conf("spark.graft.cep.tsColumn", "ts"),
    conf("spark.graft.cep.typeColumn", "event_type"),
    conf("spark.graft.cep.idColumn", "event_id"))

  override def parsePlan(sqlText: String): LogicalPlan =
    delegate.parsePlan(t(sqlText))
  override def parseQuery(sqlText: String): LogicalPlan =
    delegate.parseQuery(t(sqlText))
  override def parseExpression(sqlText: String): Expression =
    delegate.parseExpression(sqlText)
  override def parseTableIdentifier(sqlText: String): TableIdentifier =
    delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(sqlText: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String): Seq[String] =
    delegate.parseMultipartIdentifier(sqlText)
  override def parseRoutineParam(sqlText: String): StructType =
    delegate.parseRoutineParam(sqlText)
  override def parseTableSchema(sqlText: String): StructType =
    delegate.parseTableSchema(sqlText)
  override def parseDataType(sqlText: String): DataType =
    delegate.parseDataType(sqlText)
}
