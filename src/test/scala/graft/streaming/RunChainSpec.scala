package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.{SparkSpec, Tables}

/** Streaming quantified chains must reproduce the batch generalized-chain
  * rewrite exactly on replay. Maximal runs are only closed by a
  * following event (batch closes them at end-of-data), so the replay
  * appends one non-class flush event per key. */
class RunChainSpec extends SparkSpec {
  import spark.implicits._

  private def us(t: Timestamp): Long =
    t.getTime / 1000 * 1000000L + t.getNanos / 1000

  private lazy val eventsDs: Dataset[CepEvent] =
    Tables.table(spark, sf, "events")
      .select("event_id", "ts", "user_id", "event_type", "value")
      .as[CepEvent]

  private def replay(steps: Seq[(Set[String], Option[Int])],
      withinMs: Long, maxs: Seq[Option[Int]] = Nil)
      : Set[(Long, Seq[Long], Seq[Long])] = {
    implicit val sq = spark.sqlContext
    val stream = MemoryStream[CepEvent]
    val name = s"runchain_${System.nanoTime}"
    val caps = if (maxs.isEmpty) steps.map(_ => None) else maxs
    val q = RunChainDetector.detect(stream.toDS(), steps, withinMs, caps)
      .writeStream.queryName(name).format("memory").outputMode("append")
      .start()
    val data = eventsDs.orderBy("ts", "event_id").collect()
    data.grouped(250).foreach { c =>
      stream.addData(c.toSeq)
      q.processAllAvailable()
    }
    // per-key flush: closes each key's final open run (= end-of-data)
    val flush = data.map(_.user_id).distinct.zipWithIndex.map {
      case (u, i) => CepEvent(-1000L - i,
        Timestamp.valueOf("2031-01-01 00:00:00"), u, "zz_flush", 0.0)
    }
    stream.addData(flush.toSeq)
    q.processAllAvailable()
    q.stop()
    spark.table(name).collect().map { r =>
      (r.getLong(0), r.getSeq[Long](1),
        r.getSeq[Timestamp](2).map(us))
    }.toSet
  }

  test("mid-chain {m,}: replay == batch q_pattern_mid_times rewrite") {
    Tables.load(spark, sf)
    val batch = CepSql.sql(spark,
      """SELECT * FROM events
         MATCH PATTERN (signup THEN click{2,} THEN purchase WITHIN '24' HOURS)
         PARTITION BY user_id""")
      .collect()
      .map(r => (r.getLong(0),
        Seq(r.getLong(1), r.getLong(2), r.getLong(3)),
        Seq(us(r.getTimestamp(4)), us(r.getTimestamp(5)),
          us(r.getTimestamp(6))))).toSet
    assert(batch.nonEmpty, "fixture must exercise the quantified chain")
    val streamed = replay(
      Seq((Set("signup"), None), (Set("click"), Some(2)),
        (Set("purchase"), None)),
      24L * 3600 * 1000)
    assert(streamed === batch)
  }

  test("quantified head of a 3-step chain: replay == batch rewrite") {
    Tables.load(spark, sf)
    val batch = CepSql.sql(spark,
      """SELECT * FROM events
         MATCH PATTERN (click{2,} THEN purchase THEN view WITHIN '24' HOURS)
         PARTITION BY user_id""")
      .collect()
      .map(r => (r.getLong(0),
        Seq(r.getLong(1), r.getLong(2), r.getLong(3)),
        Seq(us(r.getTimestamp(4)), us(r.getTimestamp(5)),
          us(r.getTimestamp(6))))).toSet
    assert(batch.nonEmpty)
    val streamed = replay(
      Seq((Set("click"), Some(2)), (Set("purchase"), None),
        (Set("view"), None)),
      24L * 3600 * 1000)
    assert(streamed === batch)
  }

  test("bounded mid-chain {m,n}: replay == batch rewrite (r7)") {
    Tables.load(spark, sf)
    val batch = CepSql.sql(spark,
      """SELECT * FROM events
         MATCH PATTERN (signup THEN click{2,3} THEN purchase WITHIN '24' HOURS)
         PARTITION BY user_id""")
      .collect()
      .map(r => (r.getLong(0),
        Seq(r.getLong(1), r.getLong(2), r.getLong(3)),
        Seq(us(r.getTimestamp(4)), us(r.getTimestamp(5)),
          us(r.getTimestamp(6))))).toSet
    assert(batch.nonEmpty, "fixture must exercise the bounded chain")
    assert(batch.forall { case (_, vals, _) =>
      vals(1) >= 2 && vals(1) <= 3 }, "run lengths must respect the cap")
    val streamed = replay(
      Seq((Set("signup"), None), (Set("click"), Some(2)),
        (Set("purchase"), None)),
      24L * 3600 * 1000,
      maxs = Seq(None, Some(3), None))
    assert(streamed === batch)
  }

  test("alternation inside a quantified step: replay == batch rewrite") {
    Tables.load(spark, sf)
    val batch = CepSql.sql(spark,
      """SELECT * FROM events
         MATCH PATTERN (signup THEN click|view{2,} THEN purchase WITHIN '24' HOURS)
         PARTITION BY user_id""")
      .collect()
      .map(r => (r.getLong(0),
        Seq(r.getLong(1), r.getLong(2), r.getLong(3)),
        Seq(us(r.getTimestamp(4)), us(r.getTimestamp(5)),
          us(r.getTimestamp(6))))).toSet
    assert(batch.nonEmpty)
    val streamed = replay(
      Seq((Set("signup"), None), (Set("click", "view"), Some(2)),
        (Set("purchase"), None)),
      24L * 3600 * 1000)
    assert(streamed === batch)
  }
}
