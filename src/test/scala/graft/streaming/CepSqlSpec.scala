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
}
