package graft.sources

import java.sql.Timestamp

import graft.SparkSpec

/** The in-process DataSource-V2 connector: the reference's
  * `CREATE TEMPORARY TABLE … USING … OPTIONS(...)` DDL registration, plus
  * Kafka-shaped micro-batch streaming (offsets, schema from options,
  * delimited converter) — the connector surface proven without a broker. */
class GraftEventsSourceSpec extends SparkSpec {
  import spark.implicits._

  private def pay(id: Long, t: String, uid: Long, typ: String, v: Double) =
    s"$id,$t,$uid,$typ,$v"
  private val fields =
    "event_id LONG, ts TIMESTAMP, user_id LONG, event_type STRING, value DOUBLE"

  test("DDL: CREATE TEMPORARY VIEW USING graft-events with typed fields") {
    val topic = s"ddl_${System.nanoTime()}"
    GraftEventsBroker.append(topic,
      pay(1, "2026-01-01 00:10:00", 7, "click", 1.5),
      pay(2, "2026-01-01 00:20:00", 8, "view", 2.5),
      s"3,2026-01-01 00:30:00,9,click,") // empty trailing cell -> NULL
    try {
      spark.sql(
        s"""CREATE TEMPORARY VIEW ddl_events
            USING `graft-events`
            OPTIONS (topic '$topic', fields '$fields')""")
      val rows = spark.sql(
        "SELECT event_id, user_id, event_type, value FROM ddl_events " +
          "ORDER BY event_id").collect()
      assert(rows.map(_.getLong(0)).toSeq === Seq(1L, 2L, 3L))
      assert(rows.map(_.getString(2)).toSeq === Seq("click", "view", "click"))
      assert(rows(2).isNullAt(3), "empty delimited cell parses as NULL")
      // timestamps really are TIMESTAMP-typed
      val ts = spark.sql("SELECT ts FROM ddl_events WHERE event_id = 1")
        .as[Timestamp].head()
      assert(ts === Timestamp.valueOf("2026-01-01 00:10:00"))
    } finally {
      spark.catalog.dropTempView("ddl_events")
      GraftEventsBroker.clear(topic)
    }
  }

  test("DDL with an explicit column list (no fields option) parses typed") {
    val topic = s"ddlcols_${System.nanoTime()}"
    GraftEventsBroker.append(topic, "5,hello", "6,world")
    try {
      spark.sql(
        s"""CREATE TEMPORARY VIEW ddl_cols (n LONG, s STRING)
            USING `graft-events`
            OPTIONS (topic '$topic')""")
      val rows = spark.sql("SELECT n, s FROM ddl_cols ORDER BY n")
        .as[(Long, String)].collect().toSeq
      assert(rows === Seq((5L, "hello"), (6L, "world")),
        "an explicit DDL column list engages the delimited converter")
    } finally {
      spark.catalog.dropTempView("ddl_cols")
      GraftEventsBroker.clear(topic)
    }
  }

  test("batch read: V2 scan, raw shape without fields, typed with") {
    val topic = s"batch_${System.nanoTime()}"
    GraftEventsBroker.append(topic, "a,b", "c,d")
    try {
      val raw = spark.read.format("graft-events")
        .option("topic", topic).load()
      assert(raw.columns.toSeq === Seq("offset", "value"))
      assert(raw.orderBy("offset").as[(Long, String)].collect().toSeq ===
        Seq((0L, "a,b"), (1L, "c,d")))
      val typed = spark.read.format("graft-events")
        .option("topic", topic).option("fields", "x STRING, y STRING").load()
      assert(typed.collect().map(_.toSeq).toSet ===
        Set(Seq("a", "b"), Seq("c", "d")))
    } finally GraftEventsBroker.clear(topic)
  }

  test("micro-batch stream: offsets advance per batch; results == batch") {
    val topic = s"stream_${System.nanoTime()}"
    val out = s"graft_events_sink_${System.nanoTime()}"
    GraftEventsBroker.append(topic,
      pay(1, "2026-01-01 00:10:00", 7, "click", 1.0),
      pay(2, "2026-01-01 00:20:00", 7, "click", 2.0))
    val q = spark.readStream.format("graft-events")
      .option("topic", topic).option("fields", fields)
      .load()
      .groupBy("event_type")
      .agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("cnt"))
      .writeStream.queryName(out).format("memory").outputMode("complete")
      .start()
    try {
      q.processAllAvailable()
      assert(spark.table(out).as[(String, Long)].collect().toSet ===
        Set(("click", 2L)))
      // append AFTER the first batch: only the new offset range is read
      GraftEventsBroker.append(topic,
        pay(3, "2026-01-01 00:30:00", 8, "view", 3.0),
        pay(4, "2026-01-01 00:40:00", 8, "click", 4.0))
      q.processAllAvailable()
      assert(spark.table(out).as[(String, Long)].collect().toSet ===
        Set(("click", 3L), ("view", 1L)))
      // the committed offset in the progress log reached the broker's end
      val last = q.lastProgress.sources.head
      assert(last.endOffset === "4")
    } finally {
      q.stop()
      GraftEventsBroker.clear(topic)
    }
  }

  test("restart from checkpoint resumes at the committed offset") {
    // the recovery contract: after a stop, a NEW query over the same
    // checkpoint must re-enter through deserializeOffset and read ONLY
    // offsets not yet committed — each payload lands exactly once
    val topic = s"restart_${System.nanoTime()}"
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft_events_ckpt").toString
    val outDir = java.nio.file.Files
      .createTempDirectory("graft_events_out").toString
    def start() = spark.readStream.format("graft-events")
      .option("topic", topic).option("fields", fields).load()
      .writeStream.format("parquet")
      .option("checkpointLocation", ckpt).option("path", outDir)
      .outputMode("append").start()
    GraftEventsBroker.append(topic,
      pay(1, "2026-01-01 00:10:00", 7, "click", 1.0),
      pay(2, "2026-01-01 00:20:00", 7, "view", 2.0))
    val q1 = start()
    try { q1.processAllAvailable() } finally q1.stop()
    GraftEventsBroker.append(topic,
      pay(3, "2026-01-01 00:30:00", 8, "click", 3.0))
    val q2 = start()
    try { q2.processAllAvailable() } finally q2.stop()
    try {
      val out = spark.read.parquet(outDir)
      assert(out.count() === 3, "each broker offset lands exactly once " +
        "across the restart — no reprocessing, no loss")
      assert(out.select("event_id").as[Long].collect().sorted.toSeq ===
        Seq(1L, 2L, 3L))
    } finally GraftEventsBroker.clear(topic)
  }

  test("connector composes with the engine core: windowed agg == batch") {
    // the reference's actual loop: DDL-shaped source -> event-time window
    // aggregation -> sink; streamed result must equal the batch run of
    // the same plan over the same payloads
    val topic = s"core_${System.nanoTime()}"
    val out = s"graft_events_win_${System.nanoTime()}"
    GraftEventsBroker.append(topic,
      pay(1, "2026-01-01 00:10:00", 7, "click", 1.0),
      pay(2, "2026-01-01 00:50:00", 7, "click", 2.0),
      pay(3, "2026-01-01 01:10:00", 8, "view", 3.0))
    def plan(df: org.apache.spark.sql.DataFrame) =
      graft.streaming.StreamOps.tumblingCounts(df, "1 hour")
    val q = plan(spark.readStream.format("graft-events")
        .option("topic", topic).option("fields", fields).load())
      .writeStream.queryName(out).format("memory").outputMode("complete")
      .start()
    try {
      q.processAllAvailable()
      val got = spark.table(out).collect().map(_.toSeq).toSet
      val want = plan(spark.read.format("graft-events")
          .option("topic", topic).option("fields", fields).load())
        .collect().map(_.toSeq).toSet
      assert(got === want && got.nonEmpty)
    } finally {
      q.stop()
      GraftEventsBroker.clear(topic)
    }
  }

  test("stream via DDL-registered view == programmatic stream") {
    // the reference flow end-to-end: DDL registers the stream table, SQL
    // text runs against it continuously (here: the readStream equivalent,
    // since a temp VIEW from DDL is batch; the STREAM registration is the
    // format() call — both resolve the same provider by short name)
    val topic = s"e2e_${System.nanoTime()}"
    GraftEventsBroker.append(topic, pay(1, "2026-01-01 01:00:00", 1, "a", 1.0))
    try {
      val streamed = spark.readStream.format("graft-events")
        .option("topic", topic).option("fields", fields).load()
      assert(streamed.isStreaming)
      assert(streamed.schema ===
        org.apache.spark.sql.types.StructType.fromDDL(fields))
      val batch = spark.read.format("graft-events")
        .option("topic", topic).option("fields", fields).load()
      assert(!batch.isStreaming && batch.schema === streamed.schema)
    } finally GraftEventsBroker.clear(topic)
  }
}
