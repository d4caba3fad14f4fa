package graft.tools

import org.apache.spark.sql.SparkSession

import graft.Tables
import graft.streaming.StreamOps

/** Dev probe: micro-batch streaming throughput of the engine core —
  * replay the sf0.1 events table through the tumbling-window aggregation
  * (the reference's continuous-SQL shape) via MemoryStream and report
  * events/second end-to-end (ingest → stateful agg → memory sink). */
object StreamThroughputProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val chunks = args.drop(1).headOption.map(_.toInt).getOrElse(20)
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val data = Tables.table(spark, dir, "events")
      .select("event_id", "ts", "user_id", "event_type", "value")
      .as[graft.streaming.CepEvent].orderBy("ts", "event_id").collect()
    val stream = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[graft.streaming.CepEvent]
    val q = StreamOps.tumblingCounts(stream.toDF(), "1 hour")
      .writeStream.queryName("tp").format("memory")
      .outputMode("complete").start()
    // warm one micro-batch, then time the remaining replay
    require(data.length >= 2 && chunks >= 2,
      s"need >= 2 events and >= 2 chunks (got ${data.length} / $chunks)")
    val groups = data.grouped(math.max(1, data.length / chunks)).toSeq
    stream.addData(groups.head.toSeq); q.processAllAvailable()
    val n = groups.tail.map(_.length).sum
    val t0 = System.nanoTime()
    groups.tail.foreach { c => stream.addData(c.toSeq)
      q.processAllAvailable() }
    val secs = (System.nanoTime() - t0) / 1e9
    q.stop()
    println(f"events=$n batches=${groups.length - 1} wall=$secs%.2fs " +
      f"rate=${n / secs}%.0f events/s")
    spark.stop()
  }
}
