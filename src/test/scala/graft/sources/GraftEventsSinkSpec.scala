package graft.sources

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The write half of the in-process connector: continuous INSERT INTO a
  * broker topic, exactly-once across batch replays — the reference's
  * Kafka-sink contract without the connector jar. */
class GraftEventsSinkSpec extends SparkSpec {
  import spark.implicits._

  private def pay(id: Long, t: String, uid: Long, typ: String, v: Double) =
    s"$id,$t,$uid,$typ,$v"
  private val fields =
    "event_id LONG, ts TIMESTAMP, user_id LONG, event_type STRING, value DOUBLE"

  test("a replayed batchId is skipped whole (exactly-once gate)") {
    val topic = s"sink_gate_${System.nanoTime()}"
    try {
      assert(GraftEventsSink.applyBatch(topic, "w", 0L, Seq("a", "b")))
      assert(!GraftEventsSink.applyBatch(topic, "w", 0L, Seq("a", "b")),
        "replay of batch 0 must not double-append")
      assert(GraftEventsSink.applyBatch(topic, "w", 1L, Seq("c")))
      assert(!GraftEventsSink.applyBatch(topic, "w", 0L, Seq("a")),
        "an older batchId after a newer one is also a replay")
      assert(GraftEventsBroker.range(topic, 0L,
        GraftEventsBroker.size(topic)) === Seq("a", "b", "c"))
      // an independent writer key appends regardless (its own mark)
      assert(GraftEventsSink.applyBatch(topic, "w2", 0L, Seq("d")))
    } finally {
      GraftEventsBroker.clear(topic)
      GraftEventsSink.reset(topic, "w")
      GraftEventsSink.reset(topic, "w2")
    }
  }

  test("broker round-trip: source topic -> continuous query -> sink topic") {
    // the reference's full loop in-process: events stream FROM one topic
    // through a projection TO another; the sink topic then reads back
    // (raw shape) byte-equal to the JSON of the transformed input
    val in = s"sink_in_${System.nanoTime()}"
    val outT = s"sink_out_${System.nanoTime()}"
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft_sink_ckpt").toString
    GraftEventsBroker.append(in,
      pay(1, "2026-01-01 00:10:00", 7, "click", 1.5),
      pay(2, "2026-01-01 00:20:00", 8, "view", 2.5))
    val src = spark.readStream.format("graft-events")
      .option("topic", in).option("fields", fields).load()
      .select(col("event_id"), col("user_id"),
        upper(col("event_type")).as("event_type"))
    val q = GraftEventsSink.toTopic(src, outT, s"rt_${System.nanoTime()}",
      ckpt, orderCols = Seq("event_id")).start()
    try {
      q.processAllAvailable()
      // late arrivals flow through the same continuous query
      GraftEventsBroker.append(in,
        pay(3, "2026-01-01 00:30:00", 7, "error", 3.5))
      q.processAllAvailable()
      val got = spark.read.format("graft-events")
        .option("topic", outT).load() // raw (offset, value) shape
        .orderBy("offset").select("value").as[String].collect().toSeq
      assert(got === Seq(
        """{"event_id":1,"user_id":7,"event_type":"CLICK"}""",
        """{"event_id":2,"user_id":8,"event_type":"VIEW"}""",
        """{"event_id":3,"user_id":7,"event_type":"ERROR"}"""))
    } finally {
      q.stop()
      GraftEventsBroker.clear(in)
      GraftEventsBroker.clear(outT)
    }
  }

  test("restart over the same checkpoint does not duplicate sink rows") {
    val in = s"sink_restart_in_${System.nanoTime()}"
    val outT = s"sink_restart_out_${System.nanoTime()}"
    val key = s"wk_${System.nanoTime()}"
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft_sink_ckpt2").toString
    def start() = {
      val src = spark.readStream.format("graft-events")
        .option("topic", in).option("fields", fields).load()
        .select("event_id", "event_type")
      GraftEventsSink.toTopic(src, outT, key, ckpt,
        orderCols = Seq("event_id")).start()
    }
    GraftEventsBroker.append(in,
      pay(1, "2026-01-01 00:10:00", 7, "click", 1.0),
      pay(2, "2026-01-01 00:20:00", 7, "view", 2.0))
    val q1 = start()
    try q1.processAllAvailable() finally q1.stop()
    GraftEventsBroker.append(in,
      pay(3, "2026-01-01 00:30:00", 8, "click", 3.0))
    val q2 = start()
    try q2.processAllAvailable() finally q2.stop()
    try {
      val vals = GraftEventsBroker.range(outT, 0L,
        GraftEventsBroker.size(outT))
      assert(vals.size === 3,
        s"each input lands exactly once across the restart: $vals")
      assert(vals.count(_.contains("\"event_id\":1")) === 1)
      assert(vals.count(_.contains("\"event_id\":3")) === 1)
    } finally {
      GraftEventsBroker.clear(in)
      GraftEventsBroker.clear(outT)
      GraftEventsSink.reset(outT, key)
    }
  }

  test("maxBatchRows guard fails a too-large batch loudly (r7)") {
    val in = s"sink_guard_in_${System.nanoTime()}"
    val outT = s"sink_guard_out_${System.nanoTime()}"
    val key = s"wk_${System.nanoTime()}"
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft_sink_ckpt3").toString
    GraftEventsBroker.append(in,
      pay(1, "2026-01-01 00:10:00", 7, "click", 1.0),
      pay(2, "2026-01-01 00:20:00", 7, "view", 2.0),
      pay(3, "2026-01-01 00:30:00", 7, "view", 3.0))
    val src = spark.readStream.format("graft-events")
      .option("topic", in).option("fields", fields).load()
      .select("event_id", "event_type")
    val q = GraftEventsSink.toTopic(src, outT, key, ckpt,
      orderCols = Seq("event_id"), maxBatchRows = 2L).start()
    try {
      val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        q.processAllAvailable()
      }
      def chain(t: Throwable): Seq[String] =
        if (t == null) Nil else String.valueOf(t.getMessage) +: chain(t.getCause)
      assert(chain(e).exists(_.contains("maxBatchRows")),
        s"the failure must name the guard: ${chain(e)}")
      assert(GraftEventsBroker.size(outT) === 0L,
        "a guarded batch must not partially append")
    } finally {
      if (q.isActive) q.stop()
      GraftEventsBroker.clear(in)
      GraftEventsBroker.clear(outT)
      GraftEventsSink.reset(outT, key)
    }
  }
}
