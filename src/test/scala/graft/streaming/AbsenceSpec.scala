package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.{SparkSpec, Tables}

class AbsenceSpec extends SparkSpec {

  test("streaming absence detection == batch q_cep_absence (flushed set)") {
    val s2 = spark.newSession()
    StreamingConf.applyTo(s2)
    implicit val sq = s2.sqlContext
    import s2.implicits._
    val stream = MemoryStream[CepEvent]
    val name = "absence"
    val q = AbsenceDetector.detect(stream.toDS(), "signup", "purchase",
        30L * 60 * 1000, "0 seconds")
      .writeStream.queryName(name).format("memory").outputMode("append")
      .start()
    val data = Tables.table(spark, sf, "events")
      .select("event_id", "ts", "user_id", "event_type", "value")
      .as(org.apache.spark.sql.Encoders.product[CepEvent])
      .orderBy("ts", "event_id").collect()
    data.grouped(math.max(1, data.length / 5)).foreach { c =>
      stream.addData(c.toSeq); q.processAllAvailable()
    }
    // sentinels far in the future push the watermark past every deadline;
    // the second round forces the follow-up micro-batch in which the
    // watermark-crossing timers for the other keys actually fire
    stream.addData(CepEvent(-1L, Timestamp.valueOf("2030-01-01 00:00:00"),
      -1L, "flush", 0.0))
    q.processAllAvailable()
    stream.addData(CepEvent(-2L, Timestamp.valueOf("2030-01-02 00:00:00"),
      -1L, "flush", 0.0))
    q.processAllAvailable()
    q.stop()
    val got = s2.table(name).select("user_id", "sid", "s_ts")
      .collect().map(_.toSeq).toSet
    val want = graft.SparkEntry.queries("q_cep_absence")(spark, sf)
      .select("user_id", "sid", "s_ts")
      .collect().map(_.toSeq).toSet
    assert(got == want && got.nonEmpty)
  }
}
