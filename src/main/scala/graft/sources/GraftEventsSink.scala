package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter

/** The write half of the in-process connector (SURVEY §2.1 S5): the
  * reference's `INSERT INTO <kafka sink>` from a continuous query,
  * against the same [[GraftEventsBroker]] the `graft-events` SOURCE
  * reads — so a full broker round-trip (topic in → continuous query →
  * topic out) runs in-process, no connector jar.
  *
  * EXACTLY-ONCE: Structured Streaming replays the last micro-batch
  * after a restart (foreachBatch is at-least-once by contract). The
  * sink makes the append idempotent with a per-(topic, writerKey)
  * high-water BATCH mark: a replayed batchId ≤ the mark is skipped
  * whole. A batch's payloads land in one atomic `addAll` (the broker's
  * CopyOnWriteArrayList), so a batch is either fully applied or not at
  * all — the two together give exactly-once topic contents. SCOPE: the
  * mark lives in a JVM-static map, like the broker itself — the
  * guarantee covers SAME-JVM restarts (stop/start a query, new query
  * over an existing checkpoint). Cross-process durability would need
  * the mark persisted alongside the checkpoint; transactional Kafka
  * producers get that from the broker side, this test/DDL-coverage
  * infra deliberately does not.
  *
  * Rows are serialized as JSON objects (the Kafka-sink value
  * convention, [[Sources.toKafka]]); `orderCols` fixes the intra-batch
  * offset order (a replayed-then-skipped batch must not depend on
  * partition arrival order). Driver-side collect per batch is the
  * in-process analogue of the driver-coordinated transactional commit —
  * the broker is explicitly single-JVM (see [[GraftEventsBroker]]), so
  * every batch ROW lands on the driver. That shape must never be
  * pointed at a real high-volume stream: `maxBatchRows` (default
  * 1 000 000) fails the query loudly before a large batch can silently
  * OOM the driver or turn the sink into a scale bottleneck.
  */
object GraftEventsSink {
  private val committed =
    new java.util.concurrent.ConcurrentHashMap[(String, String),
      java.lang.Long]()

  /** Apply one micro-batch to `topic` idempotently; returns true if the
    * batch was appended, false if it was a replay and skipped. */
  private[sources] def applyBatch(topic: String, writerKey: String,
      batchId: Long, payloads: Seq[String]): Boolean = {
    val k = (topic, writerKey)
    var applied = false
    committed.compute(k, (_, last) => {
      val high: Long = if (last == null) -1L else last.longValue()
      if (batchId > high) {
        GraftEventsBroker.append(topic, payloads: _*)
        applied = true
        java.lang.Long.valueOf(batchId)
      } else last
    })
    applied
  }

  /** Continuous `INSERT INTO topic`: start with `.start()`, stop via the
    * returned query. `writerKey` identifies this writer across restarts
    * (pair it 1:1 with the checkpoint dir, like a Kafka transactional id).
    * `maxBatchRows` is the driver-collect guard described above: a batch
    * larger than it fails the query loudly instead of collecting. */
  def toTopic(df: DataFrame, topic: String, writerKey: String,
      checkpoint: String, orderCols: Seq[String] = Nil,
      maxBatchRows: Long = 1000000L)
      : DataStreamWriter[org.apache.spark.sql.Row] =
    df.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val rows = batch.count()
        if (rows > maxBatchRows)
          throw new IllegalStateException(
            s"GraftEventsSink batch $batchId has $rows rows > " +
              s"maxBatchRows=$maxBatchRows — this sink collects each " +
              "batch to the driver (in-process broker); route large " +
              "streams to a distributed sink (parquet/Kafka connector) " +
              "or raise the guard deliberately")
        val ordered =
          if (orderCols.nonEmpty) batch.orderBy(orderCols.map(col): _*)
          else batch
        val payloads = ordered
          .select(to_json(struct(ordered.columns.map(col): _*)).as("v"))
          .collect().map(_.getString(0)).toSeq
        applyBatch(topic, writerKey, batchId, payloads)
        () // discard: foreachBatch wants Unit
      }

  /** Forget a writer's high-water mark. PUBLIC because the mark is
    * process-global and outlives the checkpoint: if you delete (or
    * repoint) a query's checkpoint dir to reprocess from scratch but
    * keep the same `writerKey`, the new query's batchIds restart at 0
    * and EVERY batch would be skipped as a replay — call reset for that
    * (topic, writerKey) whenever you discard its checkpoint. */
  def reset(topic: String, writerKey: String): Unit =
    committed.remove((topic, writerKey))
}
