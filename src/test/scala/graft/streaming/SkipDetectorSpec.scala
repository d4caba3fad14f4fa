package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.{SparkSpec, Tables}
import graft.operators.SkipMatch

/** Streaming AFTER MATCH SKIP PAST LAST ROW must reproduce the batch
  * operator exactly — greedy matching is order-dependent, so this is the
  * hardest replay-equivalence claim in the CEP surface: one late event
  * can change every later match of its key, and the detector may only
  * emit what the watermark has made immutable. */
class SkipDetectorSpec extends SparkSpec {
  import spark.implicits._

  private lazy val eventsDs: Dataset[CepEvent] =
    Tables.table(spark, sf, "events")
      .select("event_id", "ts", "user_id", "event_type", "value")
      .as[CepEvent]

  private val steps = Seq(Set("signup"), Set("purchase"))
  private val withinMs = 30L * 60 * 1000

  private lazy val batchWant: Seq[Seq[Any]] =
    SkipMatch.matchChain(Tables.table(spark, sf, "events"),
        steps.map(_.toSeq), withinMs)
      .collect().map(_.toSeq).toSeq

  /** Far-future pattern-type sentinel (unmatchable key): advances the
    * watermark so every real window finalizes. */
  private val sentinel = CepEvent(-1L,
    Timestamp.valueOf("2031-01-01 00:00:00"), -1L, "signup", 0.0)

  private def run(feed: MemoryStream[CepEvent] => Unit, lateness: String,
      name: String): DataFrame = {
    implicit val sq = spark.sqlContext
    val stream = MemoryStream[CepEvent]
    val q = SkipDetector.detect(stream.toDS(), steps, withinMs,
        Some(lateness))
      .writeStream.queryName(name).format("memory").outputMode("append")
      .start()
    feed(stream)
    q.processAllAvailable()
    stream.addData(sentinel)
    q.processAllAvailable()
    q.stop()
    spark.table(name).filter($"user_id" =!= -1L)
  }

  test("in-order replay == batch operator") {
    val data = eventsDs.orderBy("ts", "event_id").collect()
    val got = run(s => data.grouped(200).foreach { c =>
      s.addData(c.toSeq)
    }, "0 seconds", s"skip_inorder_${System.nanoTime}")
    assert(got.collect().map(_.toSeq).toSeq.sortBy(_.toString) ===
      batchWant.sortBy(_.toString))
    assert(batchWant.nonEmpty)
  }

  test("fully shuffled replay (lateness covers the span) == batch operator") {
    // with a lateness bound wider than the dataset span nothing is ever
    // late — the detector must buffer, reorder, and only finalize behind
    // the watermark; the end state must be identical to batch
    val rnd = new scala.util.Random(7)
    val data = rnd.shuffle(eventsDs.collect().toSeq)
    val got = run(s => data.grouped(97).foreach { c =>
      s.addData(c)
    }, "60 days", s"skip_shuffled_${System.nanoTime}")
    assert(got.collect().map(_.toSeq).toSeq.sortBy(_.toString) ===
      batchWant.sortBy(_.toString))
  }

  test("conditioned replay == batch operator with conds (r8)") {
    // DEFINE-lite on the pick step: a purchase at or below 50 is
    // invisible to step 2 (the batch matchChain mask is type AND cond),
    // which shifts greedy consumption — parity must hold exactly
    val conds = Seq(None, Some(("value", ">", 50.0)))
    val want = SkipMatch.matchChain(Tables.table(spark, sf, "events"),
        steps.map(_.toSeq), withinMs, conds = conds)
      .collect().map(_.toSeq).toSeq
    assert(want.nonEmpty, "fixture must produce conditioned matches")
    assert(want.length != batchWant.length,
      "the condition must bite on the fixture")
    implicit val sq = spark.sqlContext
    val stream = MemoryStream[CepEvent]
    val name = s"skip_cond_${System.nanoTime}"
    val q = SkipDetector.detectWhere(stream.toDS(),
        Seq((e: CepEvent) => e.event_type == "signup",
          (e: CepEvent) => e.event_type == "purchase" && e.value > 50),
        withinMs, Some("0 seconds"))
      .writeStream.queryName(name).format("memory").outputMode("append")
      .start()
    eventsDs.orderBy("ts", "event_id").collect().grouped(200).foreach { c =>
      stream.addData(c.toSeq)
      q.processAllAvailable()
    }
    stream.addData(sentinel)
    q.processAllAvailable()
    q.stop()
    val got = spark.table(name).filter($"user_id" =!= -1L)
    assert(got.collect().map(_.toSeq).toSeq.sortBy(_.toString) ===
      want.sortBy(_.toString))
  }

  test("exact-boundary pick is immutable: Spark drops late rows at ts <= wm") {
    // The inclusive finalization horizon (commit picks with ts <= wm)
    // is safe ONLY because Spark's stateful late-row predicate drops
    // rows at ts <= watermark (LessThanOrEqual — verified against the
    // 4.1.2 bytecode, see SkipMatch.greedyScan's scaladoc). This test
    // pins that contract end-to-end: an equal-ts smaller-id purchase
    // fed AFTER the watermark reached its ts must be DROPPED by Spark,
    // never displacing the already-committable pick. If a Spark upgrade
    // ever starts admitting rows at ts == wm, this test fails and the
    // horizon must become exclusive (ADVICE r7 investigation, r8).
    implicit val sq = spark.sqlContext
    val stream = MemoryStream[CepEvent]
    val name = s"skip_boundary_${System.nanoTime}"
    val q = SkipDetector.detect(stream.toDS(), steps, withinMs,
        Some("0 seconds"))
      .writeStream.queryName(name).format("memory").outputMode("append")
      .start()
    try {
      // batch 1: anchor + a purchase at what will become the watermark
      stream.addData(
        CepEvent(10, Timestamp.valueOf("2026-01-01 00:00:00"), 7, "signup", 0),
        CepEvent(20, Timestamp.valueOf("2026-01-01 00:10:00"), 7, "purchase", 0))
      q.processAllAvailable()
      // batch 2 runs with wm = 00:10 == pick 20's ts: (10, 20) is final
      // under the inclusive horizon and must commit NOW. The driver
      // event must itself be admissible (ts STRICTLY above the
      // watermark — an equal-ts row is dropped and the handler would
      // never even run, which is itself the semantics under test).
      stream.addData(
        CepEvent(30, Timestamp.valueOf("2026-01-01 00:20:00"), 7, "signup", 0))
      q.processAllAvailable()
      val afterB2 = spark.table(name).select("id_1", "id_2").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(afterB2 === Set((10L, 20L)),
        "a pick at ts == watermark is immutable (late rows at <= wm are " +
          "dropped) and must commit without waiting for another tick")
      // an equal-ts smaller-id purchase arrives late: Spark must drop it
      // (ts 00:10 <= wm 00:10) — the committed match must stand alone
      stream.addData(
        CepEvent(15, Timestamp.valueOf("2026-01-01 00:10:00"), 7, "purchase", 0))
      q.processAllAvailable()
      stream.addData(sentinel)
      q.processAllAvailable()
      val got = spark.table(name).filter($"user_id" =!= -1L)
        .select("id_1", "id_2").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      // oracle over the ADMITTED rows {10, 20, 30}: (10, 20); anchor 30
      // has no purchase strictly after 00:20 → fails. Row 15 was late.
      assert(got === Set((10L, 20L)))
    } finally {
      if (q.isActive) q.stop()
    }
  }

  test("matches emit incrementally behind the watermark, not only at shutdown") {
    implicit val sq = spark.sqlContext
    val stream = MemoryStream[CepEvent]
    val name = s"skip_incr_${System.nanoTime}"
    val q = SkipDetector.detect(stream.toDS(), steps, withinMs,
        Some("0 seconds"))
      .writeStream.queryName(name).format("memory").outputMode("append")
      .start()
    try {
      stream.addData(
        CepEvent(1, Timestamp.valueOf("2026-01-01 00:00:00"), 7, "signup", 0),
        CepEvent(2, Timestamp.valueOf("2026-01-01 00:10:00"), 7, "purchase", 0),
        CepEvent(3, Timestamp.valueOf("2026-01-01 00:15:00"), 7, "signup", 0))
      q.processAllAvailable()
      // next batch runs with watermark 00:15, which is past anchor 1 and
      // pick 2 → match (1,2) is immutable and must commit; anchor 3's
      // window (→ 00:45) is still open and must block. The 02:00
      // purchase is outside anchor 3's window (a non-completion) and
      // advances the watermark to 02:00 for the step after.
      stream.addData(
        CepEvent(4, Timestamp.valueOf("2026-01-01 02:00:00"), 7, "purchase", 0))
      q.processAllAvailable()
      val got = spark.table(name).select("id_1", "id_2").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got === Set((1L, 2L)),
        "the finalized first match must emit; the open anchor must not")
      // watermark now 02:00 → anchor 3's window is provably failed; a
      // later signup+purchase pair must still match (non-overlap resumes)
      stream.addData(
        CepEvent(5, Timestamp.valueOf("2026-01-01 03:00:00"), 7, "signup", 0),
        CepEvent(6, Timestamp.valueOf("2026-01-01 03:05:00"), 7, "purchase", 0),
        CepEvent(7, Timestamp.valueOf("2026-01-01 04:00:00"), 7, "signup", 0))
      q.processAllAvailable()
      val got2 = spark.table(name).select("id_1", "id_2").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got2 === Set((1L, 2L), (5L, 6L)))
    } finally {
      if (q.isActive) q.stop()
    }
  }
}
