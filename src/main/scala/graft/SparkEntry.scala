package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §0.2 and §2.
  *
  * `queries` is the declared operator inventory (SURVEY §2's key roster);
  * `oracleSql` carries the DuckDB-equivalent SQL for every key whose
  * semantics are batch-SQL-expressible and engine-portable. Keys present in
  * `queries` but absent from `oracleSql` get the driver's rows-only check
  * (sketches / engine-specific hashing — see SURVEY §7.5).
  */
object SparkEntry {
  /** Flagship: event-time tumbling-window aggregation (SURVEY §2.9 C1) —
    * the reference's continuous-SQL core, expressed as a Spark plan that
    * runs identically in batch and Structured Streaming. */
  def entry(spark: SparkSession): DataFrame =
    Core.queries("q_window_tumbling")(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Core.queries ++ Relational.queries ++ RelationalExt.queries ++
      Stats.queries ++ Scalar.queries ++ Cep.queries ++ TextOps.queries ++
      VectorOps.queries ++ Analytics.queries ++ PipelineOps.queries

  def oracleSql: Map[String, String] =
    Core.oracles ++ Relational.oracles ++ RelationalExt.oracles ++
      Stats.oracles ++ Scalar.oracles ++ Cep.oracles ++ TextOps.oracles ++
      VectorOps.oracles ++ Analytics.oracles ++ PipelineOps.oracles
}
