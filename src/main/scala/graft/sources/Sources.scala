package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Stream sources and sinks (SURVEY §2.1 S2–S5).
  *
  * The reference ships Kafka and socket sources with a per-source
  * "message to row" converter declared in DDL, and INSERT INTO external
  * sinks [SURVEY §2.1 R]. Structured Streaming's DataSource V2 gives all
  * of these as formats; what graft adds is the converter convention
  * (payload → typed row via an explicit schema, mirroring the reference's
  * `MessageToRowConverter`) and the sink verbs.
  *
  * NOTE: the Kafka builders compile against core Spark but require the
  * `spark-sql-kafka-0-10` connector on the deployment classpath (not
  * bundled in this container — file/rate/socket sources are the testable
  * paths here; `SourcesSpec` drives the file source end-to-end). The
  * connector-shaped path itself (DDL registration, offsets, schema from
  * options, delimited converter) IS tested in-process via
  * [[GraftEventsSource]] (`format("graft-events")`,
  * GraftEventsSourceSpec), and the sink half via [[GraftEventsSink]]
  * (exactly-once INSERT INTO a broker topic, GraftEventsSinkSpec).
  */
object Sources {
  /** File-drop stream: new files under `path` become micro-batches —
    * the zero-infrastructure stream source (and the 100 TB-friendly one:
    * readers scale with executors, no broker bottleneck). */
  def fileStream(spark: SparkSession, path: String, schema: StructType,
      format: String = "parquet"): DataFrame =
    spark.readStream.schema(schema).format(format).load(path)

  /** Synthetic rate source (tests/demos). */
  def rateStream(spark: SparkSession, rowsPerSecond: Int): DataFrame =
    spark.readStream.format("rate")
      .option("rowsPerSecond", rowsPerSecond).load()

  /** Socket text source (the reference's test source; driver-side, test
    * use only — it is not fault-tolerant by design). */
  def socketStream(spark: SparkSession, host: String, port: Int): DataFrame =
    spark.readStream.format("socket")
      .option("host", host).option("port", port).load()

  /** Delimited-text payload → typed rows (the reference's delimited
    * `MessageToRowConverter` form): split the `value` column on
    * `delimiter`, cast field i to schema column i. Composes with ANY
    * single-column text stream — socket, file text, or a Kafka value. */
  def delimitedToRows(lines: DataFrame, schema: StructType,
      delimiter: String = ","): DataFrame = {
    val parts = split(col("value").cast("string"),
      java.util.regex.Pattern.quote(delimiter))
    lines.select(schema.fields.zipWithIndex.map { case (f, i) =>
      parts.getItem(i).cast(f.dataType).as(f.name) }: _*)
  }

  /** JSON-text payload → typed rows; same contract as [[delimitedToRows]]
    * for JSON-encoded lines (the `from_json` converter without Kafka). */
  def jsonToRows(lines: DataFrame, schema: StructType): DataFrame =
    lines.select(from_json(col("value").cast("string"), schema).as("m"))
      .select(col("m.*"))

  /** Kafka topic → typed rows: JSON payloads parsed against `schema`
    * (the graft form of the reference's MessageToRowConverter). Requires
    * the Kafka connector jar at deployment. */
  def kafkaJsonStream(spark: SparkSession, bootstrap: String, topic: String,
      schema: StructType): DataFrame =
    spark.readStream.format("kafka")
      .option("kafka.bootstrap.servers", bootstrap)
      .option("subscribe", topic)
      .load()
      .select(from_json(col("value").cast("string"), schema).as("m"))
      .select(col("m.*"))

  /** Kafka sink: rows serialized as JSON values (INSERT INTO kafka). */
  def toKafka(df: DataFrame, bootstrap: String, topic: String,
      checkpoint: String) =
    df.select(to_json(struct(df.columns.map(col): _*)).as("value"))
      .writeStream.format("kafka")
      .option("kafka.bootstrap.servers", bootstrap)
      .option("topic", topic)
      .option("checkpointLocation", checkpoint)

  /** The reference's `INSERT INTO <table>` from a continuous query:
    * idempotent-per-batch append into any catalog/path table. */
  def insertInto(df: DataFrame, table: String, checkpoint: String) =
    df.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        batch.write.mode("append").saveAsTable(table)
      }
}
