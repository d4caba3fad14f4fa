package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Runtime continuous-query management (SURVEY §2.9 C7 / §3.1 EP3).
  *
  * The reference runs a query service where SQL strings are submitted and
  * cancelled against a shared StreamingContext at runtime [SURVEY §3.1 R].
  * Structured Streaming's StreamingQueryManager already is that facility;
  * this wrapper pins graft's conventions (named queries, memory/parquet
  * sinks, explicit trigger) and gives the reference's submit/cancel/list
  * verbs a direct home.
  */
object ContinuousQueries {
  /** Submit a continuous query writing to an in-memory sink (results
    * readable as `SELECT * FROM <name>`) — the reference's "register and
    * query continuously" loop. Complete mode suits windowed aggregates. */
  def submitMemory(df: DataFrame, name: String,
      outputMode: String = "complete"): StreamingQuery =
    df.writeStream.queryName(name).format("memory")
      .outputMode(outputMode)
      .trigger(Trigger.ProcessingTime(0))
      .start()

  /** Drain everything currently available, then stop (Trigger.AvailableNow)
    * — the backfill/catch-up mode: process a large backlog with streaming
    * semantics (state, exactly-once) but batch-job lifecycle. */
  def submitBackfill(df: DataFrame, name: String, path: String,
      checkpoint: String): StreamingQuery =
    df.writeStream.queryName(name).format("parquet")
      .option("path", path).option("checkpointLocation", checkpoint)
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()

  /** Submit an append-mode file sink (the INSERT INTO <external> path). */
  def submitParquet(df: DataFrame, name: String, path: String,
      checkpoint: String): StreamingQuery =
    df.writeStream.queryName(name).format("parquet")
      .option("path", path).option("checkpointLocation", checkpoint)
      .outputMode("append")
      .start()

  /** EP3 — the reference's query-service loop: a SQL STRING (reference
    * dialect or plain Spark SQL) in, a named continuous query out.
    * The text is rewritten by [[CepSql.translate]] (no-op for plain SQL),
    * resolved against the session's registered views — any view created
    * from a streaming DataFrame yields a streaming plan — and started
    * against an in-memory sink readable as `SELECT * FROM <name>`.
    * Cancel with [[cancel]], enumerate with [[list]]; many submitted
    * queries share one session/scheduler, exactly like the reference's
    * daemon sharing one StreamingContext. */
  def submitSql(spark: SparkSession, sqlText: String, name: String,
      outputMode: String = "complete", tsCol: String = "ts"): StreamingQuery = {
    val df = CepSql.sql(spark, sqlText, tsCol)
    require(df.isStreaming,
      s"'$name' resolved to a batch plan — register the source views " +
        "from readStream/MemoryStream before submitting, or run the " +
        "statement through spark.sql directly for a one-shot answer")
    submitMemory(df, name, outputMode)
  }

  def list(spark: SparkSession): Seq[StreamingQuery] =
    spark.streams.active.toSeq

  def cancel(spark: SparkSession, name: String): Boolean =
    spark.streams.active.find(_.name == name) match {
      case Some(q) => q.stop(); true
      case None => false
    }

  def awaitAll(spark: SparkSession): Unit =
    spark.streams.active.foreach(_.processAllAvailable())
}

/** State-store configuration for unbounded streams (SURVEY §2.9 C8): the
  * idiomatic replacement for the reference's sharded-Redis window state.
  * RocksDB keeps state off-heap and disk-backed, so window state scales
  * past executor memory — the exact property the reference used Redis for,
  * without an external service. */
object StreamingConf {
  val rocksDb: Map[String, String] = Map(
    "spark.sql.streaming.stateStore.providerClass" ->
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled" ->
      "true")

  def applyTo(spark: SparkSession): Unit =
    rocksDb.foreach { case (k, v) => spark.conf.set(k, v) }
}
