package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.{SparkSpec, Tables}

class CepTwsSpec extends SparkSpec {

  test("transformWithState CEP == flatMapGroupsWithState CEP == batch") {
    // transformWithState needs multi-column-family state -> RocksDB
    val s2 = spark.newSession()
    StreamingConf.applyTo(s2)
    implicit val sq = s2.sqlContext
    import s2.implicits._
    val stream = MemoryStream[CepEvent]
    val name = "tws_cep"
    val q = CepSequenceTws.detect(stream.toDS(), "signup", "purchase",
        30L * 60 * 1000, "10 minutes")
      .writeStream.queryName(name).format("memory").outputMode("append")
      .start()
    val data = Tables.table(spark, sf, "events")
      .select("event_id", "ts", "user_id", "event_type", "value")
      .as(org.apache.spark.sql.Encoders.product[CepEvent])
      .orderBy("ts", "event_id").collect()
    data.grouped(math.max(1, data.length / 5)).foreach { c =>
      stream.addData(c.toSeq); q.processAllAvailable()
    }
    q.stop()
    val got = s2.table(name)
      .select("user_id", "sid", "pid", "s_ts", "p_ts")
      .collect().map(_.toSeq).toSet
    val want = graft.SparkEntry.queries("q_cep_seq")(spark, sf)
      .collect().map(_.toSeq).toSet
    assert(got == want && got.nonEmpty)
  }
}
