package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Row, SQLContext}
import org.apache.spark.sql.catalyst.{CatalystTypeConverters, InternalRow}
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.sources.{BaseRelation, DataSourceRegister, RelationProvider, SchemaRelationProvider, TableScan}
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** In-process append-only "broker" backing [[GraftEventsSource]]: a topic
  * is a growing list of string payloads with dense offsets — the minimal
  * Kafka shape (append, offset, replayable range reads) without a broker
  * process. Test/e2e harness for the connector path (same idea as Spark's
  * own `MemoryStream`/`rate`, single-JVM by design: in `local[*]` the
  * executors share this JVM, which is exactly the environment the
  * in-process source exists for).
  */
object GraftEventsBroker {
  private val topics =
    new java.util.concurrent.ConcurrentHashMap[String,
      java.util.concurrent.CopyOnWriteArrayList[String]]()

  private def list(topic: String) =
    topics.computeIfAbsent(topic,
      _ => new java.util.concurrent.CopyOnWriteArrayList[String]())

  /** Append payloads; returns the topic's new end offset. */
  def append(topic: String, payloads: String*): Long = {
    val l = list(topic)
    l.addAll(payloads.asJava)
    l.size().toLong
  }

  def size(topic: String): Long = list(topic).size().toLong

  /** Snapshot of offsets [from, until) — offsets are dense and immutable
    * once written, so a range read is replayable (the property micro-batch
    * recovery depends on). */
  def range(topic: String, from: Long, until: Long): IndexedSeq[String] = {
    val l = list(topic)
    (from until math.min(until, l.size().toLong))
      .map(i => l.get(i.toInt))
  }

  def clear(topic: String): Unit = topics.remove(topic)
}

/** The reference's DDL-registered stream source, Spark-native
  * (SURVEY §2.1 S2/S4; VERDICT r5 §next-6): one provider class serving
  *
  *  - `CREATE TEMPORARY VIEW t USING `graft-events` OPTIONS (topic 't',
  *    fields 'a LONG, ts TIMESTAMP, ...')` — the reference's
  *    `CREATE TEMPORARY TABLE … USING … OPTIONS(...)` registration path
  *    (V1 relation interfaces, which that DDL resolves);
  *  - `spark.read.format("graft-events")` — DataSource-V2 batch scan;
  *  - `spark.readStream.format("graft-events")` — DataSource-V2
  *    micro-batch stream with real offset bookkeeping: initial/latest
  *    offset, per-batch range planning, checkpointed offset JSON — the
  *    same connector surface the Kafka source implements, exercised
  *    without the connector jar.
  *
  * Options: `topic` (required); `fields` — a DDL string declaring the
  * typed row schema, payloads parsed by the delimited converter (the
  * reference's `MessageToRowConverter` convention, `delimiter` option,
  * default ','); omit `fields` for the raw Kafka shape
  * `(offset LONG, value STRING)`; `numPartitions` — read parallelism
  * (default 4). Empty delimited cells parse as NULL.
  *
  * Scale note: this source is the in-process stand-in for a real broker —
  * partition planning splits the offset range evenly, so the read path
  * (planInputPartitions → PartitionReaderFactory → per-partition readers)
  * is shaped exactly like a distributed connector even though the backing
  * store is one JVM's memory.
  */
class GraftEventsSource extends TableProvider with RelationProvider
    with SchemaRelationProvider with DataSourceRegister {

  override def shortName(): String = "graft-events"

  override def supportsExternalMetadata(): Boolean = true

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    GraftEventsSource.schemaFor(Option(options.get("fields")))

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    val opts = properties.asScala.toMap
    new GraftEventsTable(schema, GraftEventsSource.config(opts, schema))
  }

  // ---- V1 relation path (CREATE TEMPORARY VIEW ... USING ... OPTIONS) ----

  override def createRelation(sqlContext: SQLContext,
      parameters: Map[String, String]): BaseRelation =
    createRelation(sqlContext, parameters,
      GraftEventsSource.schemaFor(parameters.get("fields")))

  override def createRelation(ctx: SQLContext,
      parameters: Map[String, String], schema: StructType): BaseRelation = {
    val cfg = GraftEventsSource.config(parameters, schema)
    new BaseRelation with TableScan {
      override val sqlContext: SQLContext = ctx
      override def schema: StructType = cfg.schema
      override def buildScan(): RDD[Row] = {
        val rows = GraftEventsBroker
          .range(cfg.topic, 0L, GraftEventsBroker.size(cfg.topic))
          .zipWithIndex
          .map { case (p, i) => GraftEventsSource.parse(cfg, p, i.toLong) }
        ctx.sparkContext.parallelize(rows, cfg.numPartitions)
      }
    }
  }
}

object GraftEventsSource {
  /** Raw Kafka shape when no typed `fields` are declared. */
  val rawSchema: StructType = StructType(Seq(
    StructField("offset", LongType, nullable = false),
    StructField("value", StringType, nullable = true)))

  def schemaFor(fields: Option[String]): StructType =
    fields.map(StructType.fromDDL).getOrElse(rawSchema)

  /** Everything a partition reader needs, serializable. `typed` = parse
    * delimited payloads against the schema; otherwise raw (offset, value). */
  case class Config(schema: StructType, topic: String, typed: Boolean,
      delimiter: String, numPartitions: Int) extends Serializable

  def config(options: Map[String, String], schema: StructType): Config = {
    val opts = options.map { case (k, v) => k.toLowerCase -> v }
    val topic = opts.getOrElse("topic",
      throw new IllegalArgumentException(
        "graft-events requires a 'topic' option"))
    // typed (delimited-converter) mode whenever a row schema was declared
    // — via the `fields` option OR an explicit DDL column list
    // (`CREATE TEMPORARY VIEW t (a LONG, …) USING graft-events`); only
    // the exact raw shape takes the (offset, value) pass-through
    Config(schema, topic,
      typed = opts.contains("fields") || schema != rawSchema,
      delimiter = opts.getOrElse("delimiter", ","),
      numPartitions = opts.getOrElse("numpartitions", "4").toInt)
  }

  /** Delimited payload → external Row (the MessageToRowConverter step).
    * External values (String/Timestamp/…) feed the V1 path directly and
    * the V2 path through a catalyst converter — one parser, both paths. */
  def parse(cfg: Config, payload: String, offset: Long): Row = {
    if (!cfg.typed) return Row(offset, payload)
    val parts = payload.split(java.util.regex.Pattern.quote(cfg.delimiter),
      -1)
    val vals = cfg.schema.fields.zipWithIndex.map { case (f, i) =>
      val s = if (i < parts.length) parts(i) else null
      if (s == null || s.isEmpty) null
      else f.dataType match {
        case org.apache.spark.sql.types.LongType => s.trim.toLong
        case org.apache.spark.sql.types.IntegerType => s.trim.toInt
        case org.apache.spark.sql.types.DoubleType => s.trim.toDouble
        case org.apache.spark.sql.types.FloatType => s.trim.toFloat
        case org.apache.spark.sql.types.BooleanType => s.trim.toBoolean
        case org.apache.spark.sql.types.TimestampType =>
          java.sql.Timestamp.valueOf(s.trim)
        case org.apache.spark.sql.types.StringType => s
        case dt => throw new IllegalArgumentException(
          s"graft-events delimited converter: unsupported type $dt " +
            s"for field ${f.name}")
      }
    }
    Row.fromSeq(vals.toIndexedSeq)
  }

  /** Split [start, end) into at most n contiguous chunks. */
  def chunks(start: Long, end: Long, n: Int): Seq[(Long, Long)] = {
    val total = math.max(0L, end - start)
    if (total == 0L) Seq.empty
    else {
      val per = math.max(1L, (total + n - 1) / n)
      (start until end by per).map(a => (a, math.min(a + per, end)))
    }
  }
}

private[sources] case class GraftOffset(n: Long) extends Offset {
  override def json(): String = n.toString
}

private[sources] case class GraftRange(from: Long, until: Long)
    extends InputPartition

private[sources] class GraftEventsTable(schema0: StructType,
    cfg: GraftEventsSource.Config) extends Table with SupportsRead {
  override def name(): String = s"graft-events:${cfg.topic}"
  override def schema(): StructType = schema0
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ,
      TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap)
      : ScanBuilder = new ScanBuilder {
    override def build(): Scan = new GraftScan(schema0, cfg)
  }
}

private[sources] class GraftScan(schema: StructType,
    cfg: GraftEventsSource.Config) extends Scan {
  override def readSchema(): StructType = schema

  override def toBatch: Batch = new Batch {
    override def planInputPartitions(): Array[InputPartition] =
      GraftEventsSource
        .chunks(0L, GraftEventsBroker.size(cfg.topic), cfg.numPartitions)
        .map { case (a, b) => GraftRange(a, b): InputPartition }.toArray
    override def createReaderFactory(): PartitionReaderFactory =
      new GraftReaderFactory(cfg)
  }

  override def toMicroBatchStream(checkpointLocation: String)
      : MicroBatchStream = new MicroBatchStream {
    override def initialOffset(): Offset = GraftOffset(0L)
    override def latestOffset(): Offset =
      GraftOffset(GraftEventsBroker.size(cfg.topic))
    override def deserializeOffset(json: String): Offset =
      GraftOffset(json.trim.toLong)
    override def planInputPartitions(start: Offset, end: Offset)
        : Array[InputPartition] =
      GraftEventsSource.chunks(start.asInstanceOf[GraftOffset].n,
          end.asInstanceOf[GraftOffset].n, cfg.numPartitions)
        .map { case (a, b) => GraftRange(a, b): InputPartition }.toArray
    override def createReaderFactory(): PartitionReaderFactory =
      new GraftReaderFactory(cfg)
    override def commit(end: Offset): Unit = () // broker data is immutable
    override def stop(): Unit = ()
  }
}

private[sources] class GraftReaderFactory(cfg: GraftEventsSource.Config)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition)
      : PartitionReader[InternalRow] = {
    val GraftRange(from, until) = partition
    new PartitionReader[InternalRow] {
      private val toCatalyst =
        CatalystTypeConverters.createToCatalystConverter(cfg.schema)
      // snapshot the partition's offset range once — broker entries are
      // immutable once written, so this is the replayable range read
      private val payloads = GraftEventsBroker.range(cfg.topic, from, until)
      private var i = -1
      override def next(): Boolean = { i += 1; i < payloads.length }
      override def get(): InternalRow =
        toCatalyst(GraftEventsSource.parse(cfg, payloads(i), from + i))
          .asInstanceOf[InternalRow]
      override def close(): Unit = ()
    }
  }
}
