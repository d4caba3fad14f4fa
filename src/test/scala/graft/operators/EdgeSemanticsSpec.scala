package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Boundary semantics, pinned with crafted rows — these are the contracts
  * the oracle comparisons rely on and the exact edges a migrating user
  * will hit (window inclusivity, tie-breaks, session gap equality). */
class EdgeSemanticsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("interval join: (leftTs, leftTs+w] — exclusive start, inclusive end") {
    val a = Seq((1L, 7L, ts("2024-01-01 10:00:00")))
      .toDF("sid", "user_id", "s_ts")
    val b = Seq(
      (10L, 7L, ts("2024-01-01 10:00:00")),   // == s_ts   → excluded
      (11L, 7L, ts("2024-01-01 10:30:00")),   // == s_ts+w → included
      (12L, 7L, ts("2024-01-01 10:30:00.000001"))) // just past → excluded
      .toDF("pid", "user_id", "p_ts")
    val got = TemporalJoins.intervalJoin(a, b, Seq("user_id"),
        "s_ts", "p_ts", "30 MINUTES")
      .select("pid").as[Long].collect().toSet
    assert(got == Set(11L))
  }

  test("reserved scratch columns are rejected, not silently overwritten") {
    val l = Seq((1L, 7L, ts("2024-01-01 10:00:00")))
      .toDF("sid", "user_id", "s_ts")
    val r = Seq((10L, 7L, ts("2024-01-01 10:10:00")))
      .toDF("pid", "user_id", "p_ts")
    // banded interval join reserves __b on both sides
    intercept[IllegalArgumentException] {
      TemporalJoins.intervalJoinBanded(l.withColumn("__b", lit(9)), r,
        Seq("user_id"), "s_ts", "p_ts", "30 minutes", "30 minutes")
    }
    // carry as-of reserves __ts/__side/__carry on both sides
    intercept[IllegalArgumentException] {
      TemporalJoins.asofJoinBackwardCarry(l, r.withColumn("__side", lit(9)),
        Seq("user_id"), "s_ts", "p_ts", "pid")
    }
    // theta as-of reserves __rn and the renamed left id
    intercept[IllegalArgumentException] {
      TemporalJoins.asofJoinBackward(l.withColumn("__rn", lit(9)), r,
        Seq("user_id"), "sid", "s_ts", "p_ts", "pid")
    }
  }

  test("as-of join: <= boundary matches; equal-ts ties break by max id") {
    val err = Seq((1L, 7L, ts("2024-01-01 10:00:00")))
      .toDF("err_id", "user_id", "err_ts")
    val clk = Seq(
      (20L, 7L, ts("2024-01-01 10:00:00")),  // == err_ts, eligible
      (21L, 7L, ts("2024-01-01 10:00:00")),  // tie: higher id wins
      (19L, 7L, ts("2024-01-01 09:00:00")))
      .toDF("click_id", "user_id", "click_ts")
    val got = TemporalJoins.asofJoinBackward(err, clk, Seq("user_id"),
        "err_id", "err_ts", "click_ts", "click_id")
      .select("click_id").as[Option[Long]].collect()
    assert(got.toSeq == Seq(Some(21L)))
  }

  test("as-of carry variant: hot key produces NO join pairs") {
    // one user owning every row — the theta plan would materialize
    // n_left × n_right = 4M pairs before its top-1 window; the carry
    // plan materializes ZERO pairs (no Join node at all) and stays
    // one-shuffle-one-sort regardless of key skew
    val n = 2000
    val lefts = (0 until n).map(i =>
      (i.toLong, 7L, ts(f"2024-01-01 ${i / 3600}%02d:${i / 60 % 60}%02d:${i % 60}%02d.5")))
      .toDF("err_id", "user_id", "err_ts")
    val rights = (0 until n).map(i =>
      (i.toLong + 100000, 7L, ts(f"2024-01-01 ${i / 3600}%02d:${i / 60 % 60}%02d:${i % 60}%02d")))
      .toDF("click_id", "user_id", "click_ts")
    val got = TemporalJoins.asofJoinBackwardCarry(lefts, rights,
      Seq("user_id"), "err_ts", "click_ts", "click_id")
    assert(!got.queryExecution.executedPlan.toString.contains("Join"),
      "carry as-of must not contain any join operator")
    // each left row at second i + 0.5s matches exactly the right row at
    // second i (the latest ≤ it)
    val rows = got.select("err_id", "click_id").as[(Long, Long)]
      .collect().toMap
    assert(rows.size === n)
    (0 until n).foreach(i => assert(rows(i.toLong) === i.toLong + 100000))
    // theta variant agrees (sampled — full product is the slow path)
    val sampleL = lefts.filter($"err_id" < 50)
    val theta = TemporalJoins.asofJoinBackward(sampleL, rights,
        Seq("user_id"), "err_id", "err_ts", "click_ts", "click_id")
      .select("err_id", "click_id").as[(Long, Long)].collect().toMap
    theta.foreach { case (l, r) => assert(rows(l) === r) }
  }

  test("as-of carry variant: NULL keys never match (SQL equi semantics)") {
    val lefts = Seq(
      (1L, Some(7L), ts("2024-01-01 10:00:00")),
      (2L, None: Option[Long], ts("2024-01-01 10:00:00")))
      .toDF("err_id", "user_id", "err_ts")
    val rights = Seq(
      (10L, Some(7L), ts("2024-01-01 09:00:00")),
      (11L, None: Option[Long], ts("2024-01-01 09:00:00")))
      .toDF("click_id", "user_id", "click_ts")
    val got = TemporalJoins.asofJoinBackwardCarry(lefts, rights,
        Seq("user_id"), "err_ts", "click_ts", "click_id")
      .select("err_id", "click_id").collect()
      .map(r => (r.getLong(0), Option(r.get(1)))).toMap
    assert(got(1L) === Some(10L))
    // the theta form's equi condition drops NULL = NULL; carry must too
    assert(got(2L) === None,
      "null-key left row must stay unmatched, not absorb null-key rights")
  }

  test("as-of carry variant: NULL rightTs rows are never carried") {
    val lefts = Seq((1L, 7L, ts("2024-01-01 10:00:00")))
      .toDF("err_id", "user_id", "err_ts")
    val rights = Seq(
      (99L, 7L, None: Option[Timestamp]),     // null ts — ineligible
      (10L, 7L, Some(ts("2024-01-01 09:00:00"))))
      .toDF("click_id", "user_id", "click_ts")
    val got = TemporalJoins.asofJoinBackwardCarry(lefts, rights,
        Seq("user_id"), "err_ts", "click_ts", "click_id")
      .select("click_id").head()
    assert(got.getLong(0) === 10L,
      "theta's rightTs <= leftTs is never true for NULL; carry must agree")
    // and with ONLY a null-ts right row, the left row stays unmatched
    val gotNone = TemporalJoins.asofJoinBackwardCarry(lefts,
        rights.filter($"click_id" === 99L),
        Seq("user_id"), "err_ts", "click_ts", "click_id")
      .select("click_id").head()
    assert(gotNone.isNullAt(0))
  }

  test("banded interval join is session-timezone-independent") {
    val a = Seq((1L, 7L, ts("2024-01-01 10:00:00")))
      .toDF("sid", "user_id", "s_ts")
    val b = Seq(
      (11L, 7L, ts("2024-01-01 10:07:00")),   // inside window
      (12L, 7L, ts("2024-01-01 10:30:00")),   // == s_ts+w → included
      (13L, 7L, ts("2024-01-01 10:31:00")))   // outside
      .toDF("pid", "user_id", "p_ts")
    def run(): Set[Long] = TemporalJoins.intervalJoinBanded(a, b,
        Seq("user_id"), "s_ts", "p_ts", "30 MINUTES", "10 MINUTES")
      .select("pid").as[Long].collect().toSet
    val inUtc = run()
    val tzKey = "spark.sql.session.timeZone"
    val old = spark.conf.get(tzKey)
    try {
      spark.conf.set(tzKey, "Asia/Tokyo") // +09:00, no DST
      assert(run() === inUtc, "bucket widths must not depend on session tz")
      assert(inUtc === Set(11L, 12L))
    } finally spark.conf.set(tzKey, old)
  }

  test("forward as-of: >= boundary matches; equal-ts ties break by MIN id") {
    val err = Seq((1L, 7L, ts("2024-01-01 10:00:00")))
      .toDF("err_id", "user_id", "err_ts")
    val clk = Seq(
      (20L, 7L, ts("2024-01-01 10:00:00")),  // == err_ts, eligible
      (19L, 7L, ts("2024-01-01 10:00:00")),  // tie: LOWER id wins (first)
      (18L, 7L, ts("2024-01-01 09:00:00")),  // before -> ineligible
      (25L, 7L, ts("2024-01-01 11:00:00")))  // later -> not the earliest
      .toDF("click_id", "user_id", "click_ts")
    val got = TemporalJoins.asofJoinForward(err, clk, Seq("user_id"),
        "err_id", "err_ts", "click_ts", "click_id")
      .select("click_id").as[Option[Long]].collect()
    assert(got.toSeq == Seq(Some(19L)))
    // no eligible future row -> kept with nulls
    val none = TemporalJoins.asofJoinForward(err,
        clk.filter($"click_ts" < ts("2024-01-01 10:00:00")), Seq("user_id"),
        "err_id", "err_ts", "click_ts", "click_id")
      .select("click_id").as[Option[Long]].collect()
    assert(none.toSeq == Seq(None))
  }

  test("as-of join keeps unmatched left rows with nulls") {
    val err = Seq((1L, 7L, ts("2024-01-01 10:00:00")))
      .toDF("err_id", "user_id", "err_ts")
    val clk = Seq((20L, 7L, ts("2024-01-01 11:00:00"))) // after → no match
      .toDF("click_id", "user_id", "click_ts")
    val got = TemporalJoins.asofJoinBackward(err, clk, Seq("user_id"),
        "err_id", "err_ts", "click_ts", "click_id")
      .select("click_id").as[Option[Long]].collect()
    assert(got.toSeq == Seq(None))
  }

  test("interval join with a composite key") {
    val a = Seq((1L, 7L, "x", ts("2024-01-01 10:00:00")),
      (2L, 7L, "y", ts("2024-01-01 10:00:00")))
      .toDF("sid", "k1", "k2", "s_ts")
    val b = Seq((10L, 7L, "x", ts("2024-01-01 10:10:00")),
      (11L, 7L, "y", ts("2024-01-01 10:10:00")),
      (12L, 8L, "x", ts("2024-01-01 10:10:00")))
      .toDF("pid", "k1", "k2", "p_ts")
    val got = TemporalJoins.intervalJoin(a, b, Seq("k1", "k2"),
        "s_ts", "p_ts", "30 MINUTES")
      .select("sid", "pid").as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 10L), (2L, 11L)),
      "both key columns must participate in the match")
  }

  test("session window: gap == 5 min starts a NEW session; < 5 min merges") {
    def sessions(t2: String): Long = {
      val df = Seq((1L, ts("2024-01-01 10:00:00")), (1L, ts(t2)))
        .toDF("user_id", "ts")
      df.groupBy(session_window(col("ts"), "5 minutes"), col("user_id"))
        .count().count()
    }
    // pinned Spark semantics: the merge bound is INCLUSIVE — an event at
    // exactly prev_ts + gap still extends the session (the oracle for
    // q_window_session uses `> gap` for new-session accordingly)
    assert(sessions("2024-01-01 10:05:00") == 1,
      "gap exactly == 5 min merges (inclusive bound)")
    assert(sessions("2024-01-01 10:05:00.000001") == 2,
      "gap just over 5 min starts a new session")
  }

  test("tumbling window boundary: event at hh:00 belongs to the new hour") {
    val df = Seq((1L, ts("2024-01-01 11:00:00"))).toDF("user_id", "ts")
    val ws = df.groupBy(window(col("ts"), "1 hour")).count()
      .select(col("window.start")).as[Timestamp].head()
    assert(ws == ts("2024-01-01 11:00:00"))
  }
}
