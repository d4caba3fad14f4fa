package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.{GraftSession, SparkSpec, Tables}
import graft.streaming.StreamOps

class SourcesSpec extends SparkSpec {
  import spark.implicits._

  test("file stream source: dropped parquet files become micro-batches") {
    val dir = Files.createTempDirectory("graft_filestream").toFile
    val out = s"file_stream_sink_${System.nanoTime()}"
    val events = Tables.table(spark, sf, "events")
      .select("event_id", "ts", "user_id", "event_type", "value")
    val schema = events.schema
    val q = StreamOps.tumblingCounts(
        Sources.fileStream(spark, dir.getAbsolutePath, schema), "1 hour")
      .writeStream.queryName(out).format("memory").outputMode("complete")
      .start()
    // drop the table into the directory as two file batches
    val (h1, h2) = (events.filter(col("event_id") % 2 === 0),
      events.filter(col("event_id") % 2 === 1))
    h1.write.mode("append").parquet(dir.getAbsolutePath)
    q.processAllAvailable()
    h2.write.mode("append").parquet(dir.getAbsolutePath)
    q.processAllAvailable()
    q.stop()
    val got = spark.table(out).collect().map(_.toSeq).toSet
    val want = StreamOps.tumblingCounts(events, "1 hour")
      .collect().map(_.toSeq).toSet
    assert(got == want && got.nonEmpty)
  }

  test("rate source: streams synthetic rows") {
    val q = Sources.rateStream(spark, 500)
      .writeStream.queryName("rate_smoke").format("memory")
      .outputMode("append").start()
    q.processAllAvailable()
    Thread.sleep(1200)
    q.processAllAvailable()
    q.stop()
    assert(spark.table("rate_smoke").count() > 0)
  }

  test("message→row converters: delimited and JSON payloads type up") {
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "event_id BIGINT, event_type STRING, value DOUBLE")
    val lines = Seq("1,click,2.5", "2,view,0.25").toDF("value")
    val got = Sources.delimitedToRows(lines, schema)
      .as[(Long, String, Double)].collect().toSet
    assert(got === Set((1L, "click", 2.5), (2L, "view", 0.25)))
    // pipe delimiter (regex metachar) must be treated literally
    val piped = Seq("3|error|1.5").toDF("value")
    assert(Sources.delimitedToRows(piped, schema, "|")
      .as[(Long, String, Double)].head() === ((3L, "error", 1.5)))
    val js = Seq("""{"event_id":4,"event_type":"signup","value":9.0}""")
      .toDF("value")
    assert(Sources.jsonToRows(js, schema)
      .as[(Long, String, Double)].head() === ((4L, "signup", 9.0)))
    // and the converter composes with a STREAMING text relation
    implicit val sq = spark.sqlContext
    val stream = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[String]
    val q = Sources.delimitedToRows(stream.toDF().toDF("value"), schema)
      .writeStream.queryName("conv_stream").format("memory")
      .outputMode("append").start()
    stream.addData("5,click,1.0")
    q.processAllAvailable(); q.stop()
    assert(spark.table("conv_stream").as[(Long, String, Double)]
      .collect().toSet === Set((5L, "click", 1.0)))
  }

  test("streaming DF registered as temp view is SQL-queryable (S4)") {
    // the reference's registerDStreamAsTable: attach a name to a live
    // stream, then run SQL against it continuously
    implicit val sq = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val stream = MemoryStream[graft.streaming.CepEvent]
    stream.toDF().createOrReplaceTempView("live_events")
    val q = spark.sql(
      """SELECT window.start AS ws, event_type, count(*) AS cnt
         FROM live_events GROUP BY window(ts, '1 hour'), event_type""")
      .writeStream.queryName("s4_view").format("memory")
      .outputMode("complete").start()
    stream.addData(graft.streaming.CepEvent(1,
      java.sql.Timestamp.valueOf("2024-01-01 10:10:00"), 1, "click", 1.0))
    q.processAllAvailable()
    q.stop()
    assert(spark.table("s4_view").count() == 1)
  }

  test("backfill: AvailableNow drains the backlog then terminates") {
    val in = java.nio.file.Files.createTempDirectory("graft_bf_in")
    val out = java.nio.file.Files.createTempDirectory("graft_bf_out")
    val ck = java.nio.file.Files.createTempDirectory("graft_bf_ck")
    val events = Tables.table(spark, sf, "events")
      .select("event_id", "ts", "user_id", "event_type", "value")
    events.write.mode("append").parquet(in.toString)
    val q = graft.streaming.ContinuousQueries.submitBackfill(
      Sources.fileStream(spark, in.toString, events.schema),
      "backfill_test", out.toString, ck.toString)
    q.awaitTermination(60000)
    assert(!q.isActive, "AvailableNow must self-terminate after draining")
    assert(spark.read.parquet(out.toString).count() == events.count())
  }

  test("insertInto sink: continuous query appends into a catalog table") {
    implicit val sq = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val stream = MemoryStream[graft.streaming.CepEvent]
    val ckpt = java.nio.file.Files.createTempDirectory("graft_ins_ckpt")
    spark.sql("DROP TABLE IF EXISTS ins_target")
    val q = Sources.insertInto(stream.toDF(), "ins_target",
      ckpt.toString).start()
    stream.addData(graft.streaming.CepEvent(1,
      java.sql.Timestamp.valueOf("2024-01-01 10:00:00"), 1, "click", 1.0))
    q.processAllAvailable()
    stream.addData(graft.streaming.CepEvent(2,
      java.sql.Timestamp.valueOf("2024-01-01 10:01:00"), 1, "view", 2.0))
    q.processAllAvailable()
    q.stop()
    try assert(spark.table("ins_target").count() == 2)
    finally spark.sql("DROP TABLE IF EXISTS ins_target")
  }

  test("batch format matrix: ORC / CSV / JSON round-trip the events " +
      "table losslessly (r8)") {
    // parquet is the primary format everywhere else; the engine must
    // also read the other ubiquitous lake formats. Write-then-read with
    // an EXPLICIT schema (schema inference is a scale anti-pattern:
    // it double-scans the data) and compare full contents.
    val e = Tables.table(spark, sf, "events")
      .select("event_id", "ts", "user_id", "event_type", "value")
    val want = e.collect().map(_.toSeq).toSet
    val base = Files.createTempDirectory("graft_fmt").toString
    val schema = e.schema
    for (fmt <- Seq("orc", "csv", "json")) {
      val dir = s"$base/$fmt"
      // the TEXT formats need an explicit micros timestamp format —
      // their defaults are millis-only and silently truncate
      val tsFmt = "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX"
      val w = e.write.mode("overwrite")
      (if (fmt == "orc") w
       else w.option("timestampFormat", tsFmt).option("header", "true"))
        .format(fmt).save(dir)
      val r = spark.read.schema(schema)
      val got = (if (fmt == "orc") r
        else r.option("timestampFormat", tsFmt).option("header", "true"))
        .format(fmt).load(dir)
        .collect().map(_.toSeq).toSet
      assert(got === want, s"$fmt round-trip lost rows or precision")
    }
  }

  test("GraftSession.init exposes the full SQL surface (views + functions)") {
    GraftSession.init(spark, sf)
    val windowed = spark.sql(
      """SELECT window.start AS ws, event_type, count(*) AS cnt
         FROM events GROUP BY window(ts, '1 hour'), event_type""")
    assert(windowed.count() > 0)
    val sim = spark.sql(
      """SELECT e.vec_id, cosine_sim(e.embedding, q.embedding) AS cs
         FROM embeddings e JOIN embeddings q ON q.vec_id = 0
         WHERE e.vec_id <> 0 ORDER BY cs DESC, e.vec_id LIMIT 5""")
    val top = sim.as[(Long, Double)].collect()
    assert(top.length == 5 && top.forall(t => t._2 <= 1.0 && t._2 >= -1.0))
    // parity with the declared query key through the DataFrame surface
    val viaKey = GraftSession.run(spark, sf, "q_cosine_topk")
      .limit(5).as[(Long, Double)].collect()
    assert(top.map(_._1).toSeq == viaKey.map(_._1).toSeq)
  }
}
