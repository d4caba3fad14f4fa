package graft.streaming

import java.util.regex.Pattern

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Reference-dialect SQL adapter (SURVEY §3.1 EP2): spark-cep queries carry
  * their window in a trailing `OVER (WINDOW 'w' SECONDS, SLIDE 's'
  * SECONDS)` clause on the stream table (recalled public syntax, SURVEY §0
  * [R]). Spark expresses the same thing as a `window(ts, ...)` grouping
  * key, so a migrating user's query strings need one mechanical rewrite —
  * this performs it, letting reference-dialect text run unchanged on graft:
  *
  *  - `OVER (WINDOW 'w' SECONDS, SLIDE 's' SECONDS)` → sliding window
  *  - `OVER (WINDOW 'w' SECONDS)` → tumbling window (window == slide)
  *
  * The clause is removed and `window(<tsCol>, ...)` is prepended to the
  * GROUP BY (created if absent). Semantics upgrade exactly as documented
  * in MIGRATION.md: the reference windows on arrival time; the rewritten
  * query windows on event time (`tsCol`), which is the deterministic,
  * replayable behavior — and identical in batch and streaming.
  */
object CepSql {
  private val over = Pattern.compile(
    """OVER\s*\(\s*WINDOW\s*'(\d+)'\s*SECONDS?\s*(?:,\s*SLIDE\s*'(\d+)'\s*SECONDS?\s*)?\)""",
    Pattern.CASE_INSENSITIVE)
  private val groupBy = Pattern.compile("GROUP\\s+BY", Pattern.CASE_INSENSITIVE)
  private val tail = Pattern.compile(
    "\\b(HAVING|ORDER\\s+BY|LIMIT)\\b", Pattern.CASE_INSENSITIVE)

  /** Rewrite one reference-dialect statement to Spark SQL. Statements
    * without an OVER-window clause pass through unchanged (the relational
    * dialect is already Spark-compatible). */
  def translate(q: String, tsCol: String = "ts"): String = {
    val m = over.matcher(q)
    if (!m.find()) return q
    val w = s"${m.group(1)} seconds"
    val s = Option(m.group(2)).map(x => s"$x seconds").getOrElse(w)
    val winExpr = s"window($tsCol, '$w', '$s')"
    val stripped = m.replaceAll("")
    val gm = groupBy.matcher(stripped)
    if (gm.find())
      // prepend the window key to the existing GROUP BY list
      stripped.substring(0, gm.end()) + s" $winExpr," +
        stripped.substring(gm.end())
    else {
      // no GROUP BY: insert one before HAVING/ORDER BY/LIMIT (or at end)
      val tm = tail.matcher(stripped)
      val at = if (tm.find()) tm.start() else stripped.length
      stripped.substring(0, at).stripTrailing() +
        s" GROUP BY $winExpr " + stripped.substring(at)
    }
  }

  /** Translate and run against the session's registered views (batch or
    * streaming — the plan is identical either way). */
  def sql(spark: SparkSession, q: String, tsCol: String = "ts"): DataFrame =
    spark.sql(translate(q, tsCol))
}
