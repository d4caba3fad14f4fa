package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.{SparkSpec, Tables}

/** Streaming measured chains must reproduce the batch span-join rewrite
  * exactly on replay — ids AND the measure value, for every supported
  * aggregate, on the full fixture (the micro-fixture dispatch case lives
  * in SubmitSqlSpec; this is the real-data law). */
class MeasureChainSpec extends SparkSpec {
  import spark.implicits._

  private lazy val eventsDs: Dataset[CepEvent] =
    Tables.table(spark, sf, "events")
      .select("event_id", "ts", "user_id", "event_type", "value")
      .as[CepEvent]

  private def replay(fn: String): Map[Seq[Long], Double] = {
    implicit val sq = spark.sqlContext
    val stream = MemoryStream[CepEvent]
    val name = s"measure_${fn}_${System.nanoTime}"
    val q = PatternMatch.detectMeasure(stream.toDS(),
      Seq((e: CepEvent) => e.event_type == "signup",
        (e: CepEvent) => e.event_type == "purchase"),
      12L * 3600 * 1000, fn)
      .writeStream.queryName(name).format("memory").outputMode("append")
      .start()
    val data = eventsDs.orderBy("ts", "event_id").collect()
    data.grouped(250).foreach { c =>
      stream.addData(c.toSeq)
      q.processAllAvailable()
    }
    q.stop()
    val rows = spark.table(name).collect()
      .map(r => r.getSeq[Long](1) -> r.getDouble(4))
    val m = rows.toMap
    assert(rows.length === m.size,
      "duplicate emissions must not hide behind the map collapse")
    m
  }

  test("measured replay == batch span join for every aggregate (r7)") {
    Tables.load(spark, sf)
    def batch(fnTxt: String): Map[Seq[Long], Double] =
      CepSql.sql(spark,
        s"""SELECT * FROM events
           |MATCH PATTERN (signup THEN purchase WITHIN '12' HOURS)
           |PARTITION BY user_id
           |MEASURES $fnTxt""".stripMargin)
        .collect()
        .map(r => Seq(r.getLong(1), r.getLong(2)) ->
          r.get(5).toString.toDouble).toMap
    val cases = Seq("COUNT" -> "COUNT(*)", "SUM" -> "SUM(value)",
      "AVG" -> "AVG(value)", "MIN" -> "MIN(value)", "MAX" -> "MAX(value)")
    cases.foreach { case (fn, fnTxt) =>
      val want = batch(fnTxt)
      assert(want.nonEmpty, s"$fn: fixture must produce matches")
      val got = replay(fn)
      assert(got.keySet === want.keySet, s"$fn: match sets differ")
      want.foreach { case (ids, w) =>
        assert(math.abs(got(ids) - w) < 1e-9, s"$fn@$ids: ${got(ids)} vs $w")
      }
    }
  }
}
