package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

class StreamJoinSpec extends SparkSpec {
  import spark.implicits._

  test("stream-stream interval join == batch q_join_interval") {
    implicit val sq = spark.sqlContext
    val signups = MemoryStream[CepEvent]
    val purchases = MemoryStream[CepEvent]
    val l = signups.toDF().select(col("event_id").as("sid"), col("user_id"),
      col("ts").as("s_ts"))
    val r = purchases.toDF().select(col("event_id").as("pid"),
      col("user_id"), col("ts").as("p_ts"))
    val joined = StreamOps.streamStreamIntervalJoin(
        l, r, Seq("user_id"), "s_ts", "p_ts", "30 MINUTES", "10 minutes")
      .select(col("sid"), col("pid"))
    val name = "ssj_test"
    val q = joined.writeStream.queryName(name).format("memory")
      .outputMode("append").start()
    val ev = Tables.table(spark, sf, "events")
      .select("event_id", "ts", "user_id", "event_type", "value")
      .as[CepEvent].orderBy("ts", "event_id").collect()
    ev.grouped(300).foreach { chunk =>
      signups.addData(chunk.filter(_.event_type == "signup").toSeq)
      purchases.addData(chunk.filter(_.event_type == "purchase").toSeq)
      q.processAllAvailable()
    }
    q.stop()
    val got = spark.table(name).as[(Long, Long)].collect().toSet
    val want = graft.SparkEntry.queries("q_join_interval")(spark, sf)
      .select("sid", "pid").as[(Long, Long)].collect().toSet
    assert(got == want && got.nonEmpty)
  }

  test("stream-stream LEFT OUTER interval join == batch left join (r6)") {
    // outer emission is watermark-driven: an unmatched signup emits its
    // null-padded row only once the watermark proves no on-time purchase
    // can still arrive — a far-future sentinel on BOTH streams closes
    // every pending row, then the replay must equal the batch left join
    implicit val sq = spark.sqlContext
    val signups = MemoryStream[CepEvent]
    val purchases = MemoryStream[CepEvent]
    def shape(df: org.apache.spark.sql.DataFrame, idAs: String,
        tsAs: String) =
      df.select(col("event_id").as(idAs), col("user_id"),
        col("ts").as(tsAs))
    val joined = StreamOps.streamStreamIntervalJoin(
        shape(signups.toDF(), "sid", "s_ts"),
        shape(purchases.toDF(), "pid", "p_ts"),
        Seq("user_id"), "s_ts", "p_ts", "30 MINUTES", "10 minutes",
        "left_outer")
      .select(col("sid"), col("pid"))
    val name = "ssj_outer_test"
    val q = joined.writeStream.queryName(name).format("memory")
      .outputMode("append").start()
    val ev = Tables.table(spark, sf, "events")
      .select("event_id", "ts", "user_id", "event_type", "value")
      .as[CepEvent].orderBy("ts", "event_id").collect()
    ev.grouped(300).foreach { chunk =>
      signups.addData(chunk.filter(_.event_type == "signup").toSeq)
      purchases.addData(chunk.filter(_.event_type == "purchase").toSeq)
      q.processAllAvailable()
    }
    val flush = CepEvent(-1L, Timestamp.valueOf("2030-01-01 00:00:00"),
      -1L, "flush", 0.0)
    signups.addData(flush); purchases.addData(flush)
    q.processAllAvailable()
    q.stop()
    val got = spark.table(name).filter(col("sid") =!= -1L)
      .select(col("sid"), col("pid")).collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1)))
      .toSet
    // batch recomputation: every signup, left-joined to qualifying
    // purchases under the identical condition
    val e = Tables.table(spark, sf, "events")
    val bl = e.filter(col("event_type") === "signup")
      .select(col("event_id").as("sid"), col("user_id"),
        col("ts").as("s_ts"))
    val br = e.filter(col("event_type") === "purchase")
      .select(col("event_id").as("pid"), col("user_id").as("uid_r"),
        col("ts").as("p_ts"))
    val want = bl.join(br,
        col("user_id") === col("uid_r") && col("p_ts") > col("s_ts") &&
          col("p_ts") <= col("s_ts") + expr("INTERVAL 30 MINUTES"),
        "left")
      .select(col("sid"), col("pid")).collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1)))
      .toSet
    assert(got == want && got.nonEmpty)
    assert(got.exists(_._2 == -1L), "unmatched signups must emit nulls")
  }

  test("stream-stream FULL OUTER interval join == batch full join (r8)") {
    // both null directions are watermark-driven: unmatched signups AND
    // unmatched purchases emit their null-padded rows once the
    // watermark proves no partner can still arrive
    implicit val sq = spark.sqlContext
    val signups = MemoryStream[CepEvent]
    val purchases = MemoryStream[CepEvent]
    def shape(df: org.apache.spark.sql.DataFrame, idAs: String,
        tsAs: String) =
      df.select(col("event_id").as(idAs), col("user_id"),
        col("ts").as(tsAs))
    val joined = StreamOps.streamStreamIntervalJoin(
        shape(signups.toDF(), "sid", "s_ts"),
        shape(purchases.toDF(), "pid", "p_ts"),
        Seq("user_id"), "s_ts", "p_ts", "30 MINUTES", "10 minutes",
        "full_outer")
      .select(col("sid"), col("pid"))
    val name = "ssj_full_test"
    val q = joined.writeStream.queryName(name).format("memory")
      .outputMode("append").start()
    val ev = Tables.table(spark, sf, "events")
      .select("event_id", "ts", "user_id", "event_type", "value")
      .as[CepEvent].orderBy("ts", "event_id").collect()
    ev.grouped(300).foreach { chunk =>
      signups.addData(chunk.filter(_.event_type == "signup").toSeq)
      purchases.addData(chunk.filter(_.event_type == "purchase").toSeq)
      q.processAllAvailable()
    }
    val flush = CepEvent(-1L, Timestamp.valueOf("2030-01-01 00:00:00"),
      -1L, "flush", 0.0)
    signups.addData(flush); purchases.addData(flush)
    q.processAllAvailable()
    q.stop()
    def nn(r: org.apache.spark.sql.Row, i: Int): Long =
      if (r.isNullAt(i)) -999L else r.getLong(i)
    val got = spark.table(name)
      .filter(coalesce(col("sid"), lit(0L)) =!= -1L &&
        coalesce(col("pid"), lit(0L)) =!= -1L)
      .select(col("sid"), col("pid")).collect()
      .map(r => (nn(r, 0), nn(r, 1))).toSet
    val e = Tables.table(spark, sf, "events")
    val bl = e.filter(col("event_type") === "signup")
      .select(col("event_id").as("sid"), col("user_id"),
        col("ts").as("s_ts"))
    val br = e.filter(col("event_type") === "purchase")
      .select(col("event_id").as("pid"), col("user_id").as("uid_r"),
        col("ts").as("p_ts"))
    val want = bl.join(br,
        col("user_id") === col("uid_r") && col("p_ts") > col("s_ts") &&
          col("p_ts") <= col("s_ts") + expr("INTERVAL 30 MINUTES"),
        "full")
      .select(col("sid"), col("pid")).collect()
      .map(r => (nn(r, 0), nn(r, 1))).toSet
    assert(got == want && got.nonEmpty)
    assert(got.exists(_._2 == -999L), "unmatched signups must emit nulls")
    assert(got.exists(_._1 == -999L), "unmatched purchases must emit nulls")
  }

  test("stream-static enrichment join (stream x dimension table)") {
    implicit val sq = spark.sqlContext
    val dim = Tables.table(spark, sf, "customer")
      .select(col("c_custkey").as("user_key"), col("c_mktsegment"))
    val stream = MemoryStream[CepEvent]
    val enriched = stream.toDF()
      .join(dim, col("user_id") + 1 === col("user_key"), "left")
      .select(col("event_id"), col("user_id"), col("c_mktsegment"))
    val q = enriched.writeStream.queryName("enrich_test").format("memory")
      .outputMode("append").start()
    val evs = Tables.table(spark, sf, "events")
      .select("event_id", "ts", "user_id", "event_type", "value")
      .as[CepEvent].orderBy("event_id").limit(100).collect()
    stream.addData(evs.toSeq)
    q.processAllAvailable()
    q.stop()
    val got = spark.table("enrich_test")
    assert(got.count() == 100)
    // every event with a matching dim key is enriched (user_id+1 maps
    // into c_custkey space at sf0.001: custkeys 1..150, users 0..14)
    assert(got.filter(col("c_mktsegment").isNull).count() == 0)
    val seg = dim.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    got.collect().foreach { r =>
      assert(r.getString(2) == seg(r.getLong(1) + 1))
    }
  }

  test("RocksDB state store provider works for stateful streaming") {
    // isolated session state: conf change must not leak to other suites
    val s2 = spark.newSession()
    StreamingConf.applyTo(s2)
    assert(s2.conf.get("spark.sql.streaming.stateStore.providerClass")
      .contains("RocksDBStateStoreProvider"))
    implicit val sq = s2.sqlContext
    import s2.implicits._
    val stream = MemoryStream[CepEvent]
    val q = StreamOps.tumblingCounts(stream.toDF(), "1 hour")
      .writeStream.queryName("rocks_test").format("memory")
      .outputMode("complete").start()
    def ev(id: Long, t: String, ty: String) =
      CepEvent(id, Timestamp.valueOf(t), 1L, ty, 1.0)
    stream.addData(ev(1, "2024-01-01 10:05:00", "click"),
      ev(2, "2024-01-01 10:15:00", "click"))
    q.processAllAvailable()
    stream.addData(ev(3, "2024-01-01 10:25:00", "click"))
    q.processAllAvailable() // incremental update hits RocksDB state
    val cnt = s2.table("rocks_test")
      .filter(col("event_type") === "click").select("cnt")
      .as[Long].collect().max
    q.stop()
    assert(cnt == 3, "state must accumulate across micro-batches in RocksDB")
  }
}
