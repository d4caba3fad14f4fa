package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The engine's SQL-string entry point (SURVEY §3.2 EP3'): one call gives a
  * session the full graft surface — every test table as a view plus the
  * custom function registry — after which the whole capability set is
  * reachable from `spark.sql(...)`:
  *
  * {{{
  *   GraftSession.init(spark, "/data/sf0.1")
  *   spark.sql("SELECT window.start, count(*) FROM events " +
  *             "GROUP BY window(ts, '1 hour'), event_type")
  *   spark.sql("SELECT vec_id, cosine_sim(embedding, q.qv) ... ")
  * }}}
  *
  * The reference exposed this via a forked SQL parser inside
  * StreamSQLContext; on Spark 4 the stock parser already covers the
  * relational + window surface, so the only injection needed is functions
  * (see [[graft.plans.GraftExtensions]] for the spark.sql.extensions path).
  */
object GraftSession {
  /** Register all tables under `sfDir` as temp views + graft functions. */
  def init(spark: SparkSession, sfDir: String): Map[String, DataFrame] = {
    functions.GraftFunctions.register(spark)
    Tables.load(spark, sfDir)
  }

  /** Convenience: run a declared query by key. */
  def run(spark: SparkSession, sfDir: String, key: String): DataFrame =
    SparkEntry.queries(key)(spark, sfDir)
}
