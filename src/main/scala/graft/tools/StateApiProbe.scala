package graft.tools

import org.apache.spark.sql.SparkSession

import graft.Tables
import graft.streaming.{CepEvent, CepSequence, CepSequenceTws, StreamingConf}

/** Dev probe: the same 2-step CEP replay through both stateful APIs —
  * flatMapGroupsWithState (HDFS-backed store) vs transformWithState
  * (RocksDB, the reference's external-state analogue) — same matches,
  * measured wall per replay. */
object StateApiProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val chunks = args.drop(1).headOption.map(_.toInt).getOrElse(10)
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val data = Tables.table(spark, dir, "events")
      .select("event_id", "ts", "user_id", "event_type", "value")
      .as[CepEvent].orderBy("ts", "event_id").collect()

    def replay(name: String, useTws: Boolean): (Double, Long) = {
      val s2 = spark.newSession()
      if (useTws) StreamingConf.applyTo(s2) // RocksDB provider
      implicit val sq = s2.sqlContext
      import s2.implicits._
      val stream = org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[CepEvent]
      val ds = stream.toDS()
      val out =
        if (useTws) CepSequenceTws.detect(ds, "signup", "purchase",
          30L * 60 * 1000, "10 minutes")
        else CepSequence.detect(ds, "signup", "purchase", 30L * 60 * 1000)
      val q = out.writeStream.queryName(name).format("memory")
        .outputMode("append").start()
      val groups = data.grouped(math.max(1, data.length / chunks)).toSeq
      stream.addData(groups.head.toSeq); q.processAllAvailable() // warm
      val t0 = System.nanoTime()
      groups.tail.foreach { c => stream.addData(c.toSeq)
        q.processAllAvailable() }
      val secs = (System.nanoTime() - t0) / 1e9
      q.processAllAvailable()
      val n = s2.table(name).count()
      q.stop()
      (secs, n)
    }
    val (tF, nF) = replay("fmgws", useTws = false)
    val (tT, nT) = replay("tws", useTws = true)
    println(f"fMGWS(HDFS-store)=$tF%.2fs matches=$nF  " +
      f"transformWithState(RocksDB)=$tT%.2fs matches=$nT  " +
      f"(${chunks - 1} timed batches, $dir)")
    spark.stop()
  }
}
