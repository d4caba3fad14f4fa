package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec

/** EP3 — the reference's daemon loop: SQL strings submitted against a
  * running engine, enumerable and cancellable at runtime, many queries
  * sharing one scheduler. */
class SubmitSqlSpec extends SparkSpec {
  import spark.implicits._

  private def ev(id: Long, t: String, typ: String) =
    CepEvent(id, Timestamp.valueOf(t), id % 3, typ, 1.0)

  test("submitSql: two SQL strings run concurrently; one cancels") {
    implicit val sq = spark.sqlContext
    val stream = MemoryStream[CepEvent]
    stream.toDF().createOrReplaceTempView("live_events")

    // reference-dialect text — the translator injects window(ts, ...)
    val q1 = ContinuousQueries.submitSql(spark,
      """SELECT event_type, COUNT(*) AS cnt FROM live_events
         OVER (WINDOW '3600' SECONDS)
         GROUP BY event_type""", "svc_win")
    // plain Spark SQL passes through the same entry point untouched
    val q2 = ContinuousQueries.submitSql(spark,
      "SELECT user_id, COUNT(*) AS n FROM live_events GROUP BY user_id",
      "svc_agg")
    try {
      assert(ContinuousQueries.list(spark).map(_.name)
        .count(Set("svc_win", "svc_agg")) === 2)

      stream.addData(ev(1, "2026-01-01 00:10:00", "click"),
        ev(2, "2026-01-01 00:20:00", "click"),
        ev(3, "2026-01-01 01:10:00", "view"))
      q1.processAllAvailable(); q2.processAllAvailable()

      val win = spark.table("svc_win").collect()
        .map(r => (r.getString(0), r.getLong(1))).toSet
      assert(win === Set(("click", 2L), ("view", 1L)))
      assert(spark.table("svc_agg").count() === 3) // users 0,1,2

      // runtime cancel of ONE query; the other keeps consuming
      assert(ContinuousQueries.cancel(spark, "svc_win"))
      assert(!ContinuousQueries.cancel(spark, "svc_win")) // already gone
      stream.addData(ev(4, "2026-01-01 02:10:00", "click"))
      q2.processAllAvailable()
      assert(ContinuousQueries.list(spark).map(_.name).contains("svc_agg"))
      assert(spark.table("svc_agg")
        .filter($"user_id" === 1L).head().getLong(1) === 2L) // ids 1,4
    } finally {
      Seq(q1, q2).foreach(q => if (q.isActive) q.stop())
      spark.catalog.dropTempView("live_events")
    }
  }

  test("submitSql rejects batch-resolving statements loudly") {
    graft.Tables.load(spark, sf) // batch views
    val e = intercept[IllegalArgumentException] {
      ContinuousQueries.submitSql(spark,
        "SELECT count(*) AS c FROM events", "svc_batch")
    }
    assert(e.getMessage.contains("batch plan"))
  }
}
