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
      : Set[(Long, Seq[Long], Seq[Long])] =
    replayWhere(steps.map { case (cls, mt) =>
      ((e: CepEvent) => cls.contains(e.event_type), mt)
    }, withinMs, maxs)

  private def replayWhere(steps: Seq[(CepEvent => Boolean, Option[Int])],
      withinMs: Long, maxs: Seq[Option[Int]] = Nil,
      lazySteps: Seq[Boolean] = Nil)
      : Set[(Long, Seq[Long], Seq[Long])] = {
    implicit val sq = spark.sqlContext
    val stream = MemoryStream[CepEvent]
    val name = s"runchain_${System.nanoTime}"
    val caps = if (maxs.isEmpty) steps.map(_ => None) else maxs
    val q = RunChainDetector.detectWhere(stream.toDS(), steps, withinMs,
      caps, lazySteps)
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

  test("reluctant mid-chain {m,}?: replay == batch lazy rewrite (r8)") {
    Tables.load(spark, sf)
    val batch = CepSql.sql(spark,
      """SELECT * FROM events
         MATCH PATTERN (signup THEN click{2,}? THEN purchase WITHIN '48' HOURS)
         PARTITION BY user_id""")
      .collect()
      .map(r => (r.getLong(0),
        Seq(r.getLong(1), r.getLong(2), r.getLong(3)),
        Seq(us(r.getTimestamp(4)), us(r.getTimestamp(5)),
          us(r.getTimestamp(6))))).toSet
    assert(batch.nonEmpty, "fixture must exercise the lazy chain")
    val streamed = replayWhere(
      Seq(((e: CepEvent) => e.event_type == "signup", None),
        ((e: CepEvent) => e.event_type == "click", Some(2)),
        ((e: CepEvent) => e.event_type == "purchase", None)),
      48L * 3600 * 1000, lazySteps = Seq(false, true, false))
    assert(streamed === batch)
    // (lazy vs greedy divergence is pinned in CepSqlSpec's {3,}? test —
    // at this sf every matched {2,} run happens to be exactly 2 long,
    // so the two coincide here)
  }

  test("reluctant head {m,}?: replay == batch lazy run truncation (r8)") {
    Tables.load(spark, sf)
    // batch 2-step legacy output: (user_id, run_len, run_start, run_end,
    // b_ts); the chain detector emits step_vals = [len, purchase_id],
    // step_ts = [lazy run end, purchase ts] — compare on the common
    // projection (the streamed purchase is the FIRST after the lazy run
    // end, which is exactly min(b.ts))
    val batch = CepSql.sql(spark,
      """SELECT * FROM events
         MATCH PATTERN (click{3,}? THEN purchase WITHIN '12' HOURS)
         PARTITION BY user_id""")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), us(r.getTimestamp(3)),
        us(r.getTimestamp(4)))).toSet
    assert(batch.nonEmpty)
    val streamed = replayWhere(
      Seq(((e: CepEvent) => e.event_type == "click", Some(3)),
        ((e: CepEvent) => e.event_type == "purchase", None)),
      12L * 3600 * 1000, lazySteps = Seq(true, false))
      .map(m => (m._1, m._2.head, m._3.head, m._3.last))
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

  test("conditioned quantified step: replay == batch rewrite (r8)") {
    // DEFINE-lite on the {m,} step: a click with value <= 20 BREAKS the
    // run (batch's gaps-and-islands indicator is type AND condition), so
    // batch and streaming must agree on the resulting split runs. The
    // parquet fixture is too sparse at test scale to split a run, so the
    // SAME crafted rows feed both engines: user 1's cheap click splits
    // an otherwise-4-run into 1+2 (the 2-suffix matches); user 2's split
    // leaves two 1-runs (no match); user 3's run holds intact.
    import spark.implicits._
    def ev(id: Long, t: String, u: Long, typ: String, v: Double) =
      CepEvent(id, Timestamp.valueOf(t), u, typ, v)
    val rows = Seq(
      ev(1, "2026-01-01 00:00:00", 1, "signup", 0),
      ev(2, "2026-01-01 00:05:00", 1, "click", 50),
      ev(3, "2026-01-01 00:06:00", 1, "click", 5),
      ev(4, "2026-01-01 00:07:00", 1, "click", 50),
      ev(5, "2026-01-01 00:08:00", 1, "click", 50),
      ev(6, "2026-01-01 00:20:00", 1, "purchase", 0),
      ev(11, "2026-01-01 00:00:00", 2, "signup", 0),
      ev(12, "2026-01-01 00:05:00", 2, "click", 50),
      ev(13, "2026-01-01 00:06:00", 2, "click", 5),
      ev(14, "2026-01-01 00:07:00", 2, "click", 50),
      ev(15, "2026-01-01 00:20:00", 2, "purchase", 0),
      ev(21, "2026-01-01 00:00:00", 3, "signup", 0),
      ev(22, "2026-01-01 00:05:00", 3, "click", 30),
      ev(23, "2026-01-01 00:06:00", 3, "click", 40),
      ev(24, "2026-01-01 00:20:00", 3, "purchase", 0))
    rows.toDS().createOrReplaceTempView("cond_events")
    val pattern =
      """SELECT * FROM cond_events
         MATCH PATTERN (signup THEN click(value > 20){2,} THEN purchase
         WITHIN '24' HOURS)
         PARTITION BY user_id"""
    val batch = CepSql.sql(spark, pattern).collect()
      .map(r => (r.getLong(0),
        Seq(r.getLong(1), r.getLong(2), r.getLong(3)),
        Seq(us(r.getTimestamp(4)), us(r.getTimestamp(5)),
          us(r.getTimestamp(6))))).toSet
    // users 1 (split run, 2-suffix) and 3 (intact run) — NOT user 2
    assert(batch.map(_._1) === Set(1L, 3L),
      s"batch must see the split-run semantics: $batch")
    val steps = Seq(
      ((e: CepEvent) => e.event_type == "signup", None),
      ((e: CepEvent) => e.event_type == "click" && e.value > 20,
        Some(2): Option[Int]),
      ((e: CepEvent) => e.event_type == "purchase", None))
    // replay the same rows (not the parquet fixture)
    implicit val sq = spark.sqlContext
    val stream = MemoryStream[CepEvent]
    val q = RunChainDetector.detectWhere(stream.toDS(), steps,
        24L * 3600 * 1000, steps.map(_ => None))
      .writeStream.queryName("cond_chain").format("memory")
      .outputMode("append").start()
    rows.sortBy(e => (us(e.ts), e.event_id)).grouped(4).foreach { c =>
      stream.addData(c.toSeq); q.processAllAvailable()
    }
    stream.addData(Seq(1L, 2L, 3L).map(u => ev(-u,
      "2031-01-01 00:00:00", u, "zz_flush", 0)))
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("cond_chain").collect().map { r =>
      (r.getLong(0), r.getSeq[Long](1), r.getSeq[Timestamp](2).map(us))
    }.toSet
    assert(streamed === batch)
    spark.catalog.dropTempView("cond_events")
  }

  test("absence after a RELUCTANT chain: replay == batch lazy anti-join " +
      "(r8)") {
    // signup THEN click{2,}? THEN NOT purchase — the lazy prefix
    // completes at the 2nd click and the absence verdict windows from
    // ts_1; detectAbsent's pending/cancel discipline must compose with
    // the lazy completion trigger unchanged
    Tables.load(spark, sf)
    val batch = CepSql.sql(spark,
      """SELECT * FROM events
         MATCH PATTERN (signup THEN click{2,}? THEN NOT purchase
         WITHIN '48' HOURS)
         PARTITION BY user_id""")
      .collect()
      .map(r => (r.getLong(0), Seq(r.getLong(1), r.getLong(2)),
        Seq(us(r.getTimestamp(3)), us(r.getTimestamp(4))))).toSet
    assert(batch.nonEmpty, "fixture must produce lazy absences")
    implicit val sq = spark.sqlContext
    val stream = MemoryStream[CepEvent]
    val name = s"runchain_lzabs_${System.nanoTime}"
    val q = RunChainDetector.detectAbsent(stream.toDS(),
        Seq(((e: CepEvent) => e.event_type == "signup", None),
          ((e: CepEvent) => e.event_type == "click", Some(2))),
        48L * 3600 * 1000, Seq(None, None),
        (e: CepEvent) => e.event_type == "purchase", "0 seconds",
        Seq(false, true))
      .writeStream.queryName(name).format("memory")
      .outputMode("append").start()
    val data = eventsDs.orderBy("ts", "event_id").collect()
    data.grouped(250).foreach { c =>
      stream.addData(c.toSeq); q.processAllAvailable()
    }
    // advance the watermark far past every window so verdicts emit
    val wmFlush = data.map(_.user_id).distinct.zipWithIndex.map {
      case (u, i) => CepEvent(-2000L - i,
        Timestamp.valueOf("2031-01-01 00:00:00"), u, "zz_flush", 0.0)
    }
    stream.addData(wmFlush.toSeq); q.processAllAvailable()
    stream.addData(CepEvent(-9999L,
      Timestamp.valueOf("2031-06-01 00:00:00"), 0, "zz_flush2", 0.0))
    q.processAllAvailable(); q.stop()
    val got = spark.table(name).collect().map { r =>
      (r.getLong(0), r.getSeq[Long](1).toSeq,
        r.getSeq[Timestamp](2).map(us).toSeq)
    }.toSet
    assert(got === batch)
  }

  test("absence after a quantified chain: replay == batch q_pattern_qabs (r8)") {
    // the q_pattern_qabs statement (oracle-checked in batch) replayed
    // through detectAbsent must produce the identical absence set
    Tables.load(spark, sf)
    val batch = CepSql.sql(spark,
      """SELECT * FROM events
         MATCH PATTERN (signup THEN click{2,} THEN NOT purchase
         WITHIN '24' HOURS)
         PARTITION BY user_id""")
      .collect()
      .map(r => (r.getLong(0), Seq(r.getLong(1), r.getLong(2)),
        Seq(us(r.getTimestamp(3)), us(r.getTimestamp(4))))).toSet
    assert(batch.nonEmpty, "fixture must produce unconverted prefixes")

    implicit val sq = spark.sqlContext
    val stream = MemoryStream[CepEvent]
    val name = s"runchain_abs_${System.nanoTime}"
    val q = RunChainDetector.detectAbsent(stream.toDS(),
        Seq(((e: CepEvent) => e.event_type == "signup", None),
          ((e: CepEvent) => e.event_type == "click", Some(2): Option[Int])),
        24L * 3600 * 1000, Seq(None, None),
        (e: CepEvent) => e.event_type == "purchase", "0 seconds")
      .writeStream.queryName(name).format("memory").outputMode("append")
      .start()
    val data = eventsDs.orderBy("ts", "event_id").collect()
    data.grouped(250).foreach { c =>
      stream.addData(c.toSeq)
      q.processAllAvailable()
    }
    // two far-future rounds: the first closes every run and advances
    // the watermark, the second fires the verdict timers it armed
    stream.addData(CepEvent(-1L,
      Timestamp.valueOf("2031-01-01 00:00:00"), -1L, "zz_flush", 0.0))
    q.processAllAvailable()
    stream.addData(CepEvent(-2L,
      Timestamp.valueOf("2031-01-02 00:00:00"), -1L, "zz_flush", 0.0))
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table(name)
      .filter(org.apache.spark.sql.functions.col("user_id") =!= -1L)
      .collect().map { r =>
        (r.getLong(0), r.getSeq[Long](1),
          r.getSeq[Timestamp](2).map(us))
      }.toSet
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

  test("measured quantified chains: replay == batch span rewrite (r8)") {
    // SUM(value) + COUNT(*) over head-quantified and mid-quantified
    // chains: the streaming accumulators (pre-fold on run-closing
    // completions, seed-at-run-start for the head tracker) must equal
    // the batch span join with the recovered run-boundary rows. The
    // flush event closes final runs but must NOT leak into any span.
    Tables.load(spark, sf)
    def law(pattern: String, steps: Seq[(Set[String], Option[Int])],
        withinMs: Long): Unit = {
      val batchRows = CepSql.sql(spark, pattern).collect()
      val nc = batchRows.head.length
      val k = steps.length
      val batch = batchRows.map { r =>
        (r.getLong(0), (1 to k).map(r.getLong).toList) ->
          ((r.getDouble(nc - 2), r.getLong(nc - 1)))
      }.toMap
      assert(batch.nonEmpty, s"fixture must produce matches: $pattern")
      implicit val sq = spark.sqlContext
      val stream = MemoryStream[CepEvent]
      val name = s"runchain_meas_${System.nanoTime}"
      val q = RunChainDetector.detectMeasures(stream.toDS(),
          steps.map { case (cls, mt) =>
            ((e: CepEvent) => cls.contains(e.event_type), mt) },
          withinMs, steps.map(_ => None),
          Seq(CepSql.SpanAgg("SUM", "value", "sv"),
            CepSql.SpanAgg("COUNT", "*", "cn")))
        .writeStream.queryName(name).format("memory")
        .outputMode("append").start()
      val data = eventsDs.orderBy("ts", "event_id").collect()
      data.grouped(250).foreach { c =>
        stream.addData(c.toSeq)
        q.processAllAvailable()
      }
      val flush = data.map(_.user_id).distinct.zipWithIndex.map {
        case (u, i) => CepEvent(-1000L - i,
          Timestamp.valueOf("2031-01-01 00:00:00"), u, "zz_flush", 7777.0)
      }
      stream.addData(flush.toSeq)
      q.processAllAvailable()
      q.stop()
      val got = spark.table(name).collect().map { r =>
        val v = r.getSeq[Double](5)
        (r.getLong(0), r.getSeq[Long](1).toList) ->
          ((v(0), v(1).toLong))
      }.toMap
      assert(got.keySet === batch.keySet, s"match sets differ: $pattern")
      batch.foreach { case (kk, (sv, cn)) =>
        assert(got(kk)._2 === cn, s"count@$kk: $pattern")
        assert(math.abs(got(kk)._1 - sv) < 1e-6,
          s"sum@$kk: ${got(kk)._1} vs $sv: $pattern")
        assert(math.abs(got(kk)._1 - 7777.0) > 1.0 ||
          math.abs(sv - 7777.0) < 1e-6,
          s"flush value leaked into the span@$kk")
      }
    }
    law("""SELECT * FROM events
           MATCH PATTERN (click{2,} THEN purchase WITHIN '2' HOURS)
           PARTITION BY user_id
           MEASURES SUM(value) AS sv, COUNT(*) AS cn""",
      Seq((Set("click"), Some(2)), (Set("purchase"), None)),
      2L * 3600 * 1000)
    law("""SELECT * FROM events
           MATCH PATTERN (signup THEN click{2,} THEN purchase
           WITHIN '24' HOURS)
           PARTITION BY user_id
           MEASURES SUM(value) AS sv, COUNT(*) AS cn""",
      Seq((Set("signup"), None), (Set("click"), Some(2)),
        (Set("purchase"), None)),
      24L * 3600 * 1000)
  }

  test("consumed lazy island still folds into the span (same-microsecond " +
      "tie, r8 review fix)") {
    // signup and the first click island share a microsecond, so the
    // island's runStart > prevTs check fails → consumed. Its clicks lie
    // BETWEEN the match's boundary rows and must still fold into the
    // span accumulators (the batch span join counts every event).
    import spark.implicits._
    implicit val sq = spark.sqlContext
    def ev(id: Long, t: String, typ: String, v: Double) =
      CepEvent(id, Timestamp.valueOf(t), 7L, typ, v)
    val data = Seq(
      ev(1, "2026-01-01 10:00:00", "signup", 1.0),
      ev(2, "2026-01-01 10:00:00", "click", 2.0),  // same us as signup
      ev(3, "2026-01-01 10:00:00", "click", 3.0),  // island consumed
      ev(4, "2026-01-01 10:01:00", "view", 4.0),   // breaker
      ev(5, "2026-01-01 10:02:00", "click", 5.0),  // qualifying island
      ev(6, "2026-01-01 10:03:00", "click", 6.0),  // lazy run end (m=2)
      ev(7, "2026-01-01 10:04:00", "purchase", 7.0))
    val stream = MemoryStream[CepEvent]
    val name = s"runchain_tie_${System.nanoTime}"
    val q = RunChainDetector.detectMeasures(stream.toDS(),
        Seq(((e: CepEvent) => e.event_type == "signup", None),
          ((e: CepEvent) => e.event_type == "click", Some(2)),
          ((e: CepEvent) => e.event_type == "purchase", None)),
        12L * 3600 * 1000, Seq(None, None, None),
        Seq(CepSql.SpanAgg("SUM", "value", "sv"),
          CepSql.SpanAgg("COUNT", "*", "cn")),
        Seq(false, true, false))
      .writeStream.queryName(name).format("memory")
      .outputMode("append").start()
    data.grouped(2).foreach { c =>
      stream.addData(c.toSeq); q.processAllAvailable()
    }
    q.stop()
    val got = spark.table(name).collect()
    assert(got.length === 1)
    val v = got.head.getSeq[Double](5)
    // span = all 7 rows (incl. the CONSUMED island's clicks 2 and 3)
    assert(v(1).toLong === 7L, s"span count: ${v(1)}")
    assert(math.abs(v(0) - 28.0) < 1e-9, s"span sum: ${v(0)}")
    // and the matched run is the SECOND island (ids 5,6 → lazy len 2)
    assert(got.head.getSeq[Long](1) === Seq(1L, 2L, 7L))
  }

  test("measures over RELUCTANT runs stream: replay == batch lazy span " +
      "(r8)") {
    // click{2,}? THEN purchase with SUM(value)+COUNT(*): the lazy span
    // runs from the island's FIRST row to the purchase — the island's
    // post-truncation events still lie BETWEEN matched rows and belong
    // to the span, and the lazy completion folds POST (its m-th event
    // is a span row). Must equal the batch lazy rewrite exactly.
    Tables.load(spark, sf)
    val pattern =
      """SELECT * FROM events
         MATCH PATTERN (click{2,}? THEN purchase WITHIN '2' HOURS)
         PARTITION BY user_id
         MEASURES SUM(value) AS sv, COUNT(*) AS cn"""
    val batchRows = CepSql.sql(spark, pattern).collect()
    assert(batchRows.nonEmpty)
    val batch = batchRows.map { r =>
      (r.getLong(0), List(r.getLong(1), r.getLong(2))) ->
        ((r.getDouble(5), r.getLong(6)))
    }.toMap
    implicit val sq = spark.sqlContext
    val stream = MemoryStream[CepEvent]
    val name = s"runchain_lzm_${System.nanoTime}"
    val q = RunChainDetector.detectMeasures(stream.toDS(),
        Seq(((e: CepEvent) => e.event_type == "click", Some(2)),
          ((e: CepEvent) => e.event_type == "purchase", None)),
        2L * 3600 * 1000, Seq(None, None),
        Seq(CepSql.SpanAgg("SUM", "value", "sv"),
          CepSql.SpanAgg("COUNT", "*", "cn")),
        Seq(true, false))
      .writeStream.queryName(name).format("memory")
      .outputMode("append").start()
    val data = eventsDs.orderBy("ts", "event_id").collect()
    data.grouped(250).foreach { c =>
      stream.addData(c.toSeq); q.processAllAvailable()
    }
    // lazy completions never need a run-closing flush, but the chain's
    // final PURCHASE may still be pending? No — an unquantified last
    // step completes on its own event; no flush required at all.
    q.processAllAvailable(); q.stop()
    val got = spark.table(name).collect().map { r =>
      val v = r.getSeq[Double](5)
      (r.getLong(0), r.getSeq[Long](1).toList) -> ((v(0), v(1).toLong))
    }.toMap
    assert(got.keySet === batch.keySet, "lazy measured match sets differ")
    batch.foreach { case (k, (sv, cn)) =>
      assert(got(k)._2 === cn, s"count@$k")
      assert(math.abs(got(k)._1 - sv) < 1e-6, s"sum@$k")
    }
  }

  test("boundary refs on a RELUCTANT run compose: LAST stops at the " +
      "m-th event (r8)") {
    // LAST(click.event_id) over click{2,}? — the lazy run's last row is
    // its m-th event, NOT the island's maximal end; the bnd slot stops
    // refreshing once the step advances, which must equal the batch
    // lazy runsSub's FILTERed run_end_id
    Tables.load(spark, sf)
    val pattern =
      """SELECT * FROM events
         MATCH PATTERN (click{2,}? THEN purchase WITHIN '2' HOURS)
         PARTITION BY user_id
         MEASURES FIRST(click.value) AS v0, LAST(click.event_id) AS id1,
           COUNT(*) AS cn"""
    val batchRows = CepSql.sql(spark, pattern).collect()
    assert(batchRows.nonEmpty)
    val batch = batchRows.map { r =>
      (r.getLong(0), List(r.getLong(1), r.getLong(2))) ->
        ((r.getDouble(5), r.getLong(6), r.getLong(7)))
    }.toMap
    implicit val sq = spark.sqlContext
    val stream = MemoryStream[CepEvent]
    val name = s"runchain_lzb_${System.nanoTime}"
    val q = RunChainDetector.detectMeasures(stream.toDS(),
        Seq(((e: CepEvent) => e.event_type == "click", Some(2)),
          ((e: CepEvent) => e.event_type == "purchase", None)),
        2L * 3600 * 1000, Seq(None, None),
        Seq(CepSql.BoundRef("FIRST", "click", "value", 1, "v0"),
          CepSql.BoundRef("LAST", "click", "event_id", 1, "id1"),
          CepSql.SpanAgg("COUNT", "*", "cn")),
        Seq(true, false))
      .writeStream.queryName(name).format("memory")
      .outputMode("append").start()
    val data = eventsDs.orderBy("ts", "event_id").collect()
    data.grouped(250).foreach { c =>
      stream.addData(c.toSeq); q.processAllAvailable()
    }
    q.stop()
    val got = spark.table(name).collect().map { r =>
      val v = r.getSeq[Double](5)
      (r.getLong(0), r.getSeq[Long](1).toList) ->
        ((v(0), v(1).toLong, v(2).toLong))
    }.toMap
    assert(got.keySet === batch.keySet)
    batch.foreach { case (k, (v0, id1, cn)) =>
      assert(math.abs(got(k)._1 - v0) < 1e-9, s"FIRST@$k")
      assert(got(k)._2 === id1, s"LAST must stop at the m-th event@$k")
      assert(got(k)._3 === cn, s"span@$k")
    }
  }

  test("MATCH_NUMBER on quantified chains streams: held-release replay " +
      "== batch q_pattern_qmeasure numbering (r9)") {
    // the oracle-gated key's exact shape: click{2,} THEN purchase with
    // COUNT(*) + MATCH_NUMBER. The streaming numbering must equal the
    // batch (ts_1, rsid_1) row_number — not emission order — which the
    // held-release discipline guarantees (a match takes its number only
    // once the watermark closes its window and no earlier-ordered
    // partial is open).
    Tables.load(spark, sf)
    val batchRows = CepSql.sql(spark,
      """SELECT * FROM events
         MATCH PATTERN (click{2,} THEN purchase WITHIN '12' HOURS)
         PARTITION BY user_id
         MEASURES COUNT(*) AS span_n, MATCH_NUMBER() AS mno""").collect()
    assert(batchRows.nonEmpty)
    val batch = batchRows.map { r =>
      (r.getLong(0), List(r.getLong(1), r.getLong(2))) ->
        ((r.getLong(5), r.getLong(6)))
    }.toMap
    assert(batch.values.exists(_._2 > 1L),
      "some key must have several matches or the numbering law is vacuous")
    implicit val sq = spark.sqlContext
    val stream = MemoryStream[CepEvent]
    val name = s"runchain_mn_${System.nanoTime}"
    val q = RunChainDetector.detectMeasures(
        stream.toDS().withWatermark("ts", "0 seconds").as[CepEvent],
        Seq(((e: CepEvent) => e.event_type == "click", Some(2)),
          ((e: CepEvent) => e.event_type == "purchase", None)),
        12L * 3600 * 1000, Seq(None, None),
        Seq(CepSql.SpanAgg("COUNT", "*", "span_n"),
          CepSql.MatchNum("mno")))
      .writeStream.queryName(name).format("memory")
      .outputMode("append").start()
    val data = eventsDs.orderBy("ts", "event_id").collect()
    data.grouped(250).foreach { c =>
      stream.addData(c.toSeq); q.processAllAvailable()
    }
    val flush = data.map(_.user_id).distinct.zipWithIndex.map {
      case (u, i) => CepEvent(-7000L - i,
        Timestamp.valueOf("2031-01-01 00:00:00"), u, "zz_flush", 0.0)
    }
    stream.addData(flush.toSeq); q.processAllAvailable()
    // one more batch so the advanced watermark fires pending timers
    stream.addData(CepEvent(-9999L,
      Timestamp.valueOf("2031-01-02 00:00:00"), -1L, "zz_flush", 0.0))
    q.processAllAvailable(); q.stop()
    val got = spark.table(name).collect().map { r =>
      val v = r.getSeq[Double](5)
      (r.getLong(0), r.getSeq[Long](1).toList) ->
        ((v(0).toLong, v(1).toLong))
    }.toMap
    assert(got.keySet === batch.keySet, "match sets differ")
    val diffs = batch.collect {
      case (k, v) if got(k) != v => (k, v, got(k)) }
    assert(diffs.isEmpty,
      s"${diffs.size} (span, number) diverge, e.g. ${diffs.take(3)}")
  }

  test("class refs on unquantified steps of a quantified chain stream: " +
      "replay == batch matched-row joins (r9)") {
    // signup.value (head row) and purchase.event_id (tail row) captured
    // into the slot vector at each step's advance — must equal the
    // batch rewrite's per-step events joins exactly
    Tables.load(spark, sf)
    val pattern =
      """SELECT * FROM events
         MATCH PATTERN (signup THEN click{2,} THEN purchase
         WITHIN '48' HOURS)
         PARTITION BY user_id
         MEASURES signup.value AS sv, purchase.event_id AS pid,
           COUNT(*) AS cn"""
    val batchRows = CepSql.sql(spark, pattern).collect()
    assert(batchRows.nonEmpty)
    // batch cols: user_id, id_1, len_2, id_3, ts_1..ts_3, sv, pid, cn
    val batch = batchRows.map { r =>
      (r.getLong(0), Seq(r.getLong(1), r.getLong(2), r.getLong(3))) ->
        ((r.getDouble(7), r.getLong(8), r.getLong(9)))
    }.toMap
    implicit val sq = spark.sqlContext
    val stream = MemoryStream[CepEvent]
    val name = s"runchain_cref_${System.nanoTime}"
    val q = RunChainDetector.detectMeasures(stream.toDS(),
        Seq(((e: CepEvent) => e.event_type == "signup", None),
          ((e: CepEvent) => e.event_type == "click", Some(2)),
          ((e: CepEvent) => e.event_type == "purchase", None)),
        48L * 3600 * 1000, Seq(None, None, None),
        Seq(CepSql.ClassRef("signup", "value", 1, "sv"),
          CepSql.ClassRef("purchase", "event_id", 3, "pid"),
          CepSql.SpanAgg("COUNT", "*", "cn")))
      .writeStream.queryName(name).format("memory")
      .outputMode("append").start()
    val data = eventsDs.orderBy("ts", "event_id").collect()
    data.grouped(250).foreach { c =>
      stream.addData(c.toSeq); q.processAllAvailable()
    }
    val flush = data.map(_.user_id).distinct.zipWithIndex.map {
      case (u, i) => CepEvent(-2500L - i,
        Timestamp.valueOf("2031-01-01 00:00:00"), u, "zz_flush", 0.0)
    }
    stream.addData(flush.toSeq); q.processAllAvailable(); q.stop()
    val got = spark.table(name).collect().map { r =>
      val v = r.getSeq[Double](5)
      (r.getLong(0), r.getSeq[Long](1).toSeq) ->
        ((v(0), v(1).toLong, v(2).toLong))
    }.toMap
    assert(got.keySet === batch.keySet)
    val diffs = batch.collect {
      case (k, v) if got(k) != v => (k, v, got(k)) }
    assert(diffs.isEmpty, s"${diffs.size} diverge, e.g. ${diffs.take(3)}")
  }

  test("timestamp boundary refs stream: replay == batch run_start/" +
      "run_end (r9)") {
    // FIRST(click.ts) / LAST(click.ts) ride the Double slot as exact
    // event micros (2026-era micros < 2^53) — replay must equal the
    // batch rewrite's run_start / run_end columns micro-for-micro
    Tables.load(spark, sf)
    val pattern =
      """SELECT * FROM events
         MATCH PATTERN (signup THEN click{2,} THEN purchase
         WITHIN '48' HOURS)
         PARTITION BY user_id
         MEASURES FIRST(click.ts) AS t0, LAST(click.ts) AS t1,
           COUNT(*) AS cn"""
    val batchRows = CepSql.sql(spark, pattern).collect()
    assert(batchRows.nonEmpty)
    def usOf(t: Timestamp): Long = t.getTime / 1000 * 1000000L +
      t.getNanos / 1000
    // batch cols: user_id, id_1, len_2, id_3, ts_1..ts_3, t0, t1, cn
    val batch = batchRows.map { r =>
      (r.getLong(0), Seq(r.getLong(1), r.getLong(2), r.getLong(3))) ->
        ((usOf(r.getTimestamp(7)), usOf(r.getTimestamp(8)), r.getLong(9)))
    }.toMap
    implicit val sq = spark.sqlContext
    val stream = MemoryStream[CepEvent]
    val name = s"runchain_tsb_${System.nanoTime}"
    val q = RunChainDetector.detectMeasures(stream.toDS(),
        Seq(((e: CepEvent) => e.event_type == "signup", None),
          ((e: CepEvent) => e.event_type == "click", Some(2)),
          ((e: CepEvent) => e.event_type == "purchase", None)),
        48L * 3600 * 1000, Seq(None, None, None),
        Seq(CepSql.BoundRef("FIRST", "click", "ts", 2, "t0"),
          CepSql.BoundRef("LAST", "click", "ts", 2, "t1"),
          CepSql.SpanAgg("COUNT", "*", "cn")))
      .writeStream.queryName(name).format("memory")
      .outputMode("append").start()
    val data = eventsDs.orderBy("ts", "event_id").collect()
    data.grouped(250).foreach { c =>
      stream.addData(c.toSeq); q.processAllAvailable()
    }
    val flush = data.map(_.user_id).distinct.zipWithIndex.map {
      case (u, i) => CepEvent(-2000L - i,
        Timestamp.valueOf("2031-01-01 00:00:00"), u, "zz_flush", 0.0)
    }
    stream.addData(flush.toSeq); q.processAllAvailable(); q.stop()
    val got = spark.table(name).collect().map { r =>
      val v = r.getSeq[Double](5)
      (r.getLong(0), r.getSeq[Long](1).toSeq) ->
        ((v(0).toLong, v(1).toLong, v(2).toLong))
    }.toMap
    assert(got.keySet === batch.keySet)
    batch.foreach { case (kk, (t0, t1, cn)) =>
      assert(got(kk)._1 === t0, s"FIRST ts (run_start)@$kk")
      assert(got(kk)._2 === t1, s"LAST ts (run_end)@$kk")
      assert(got(kk)._3 === cn, s"span count@$kk")
    }
  }

  test("FIRST/LAST boundary refs stream: replay == batch runs re-join " +
      "(r8)") {
    // FIRST(click.value) + LAST(click.event_id): the partial's bnd
    // slots (seeded at run open, LAST refreshed per run event) must
    // equal the batch rewrite's boundary-row joins; a failed run's
    // stale slots must be overwritten by the accepted run
    Tables.load(spark, sf)
    val pattern =
      """SELECT * FROM events
         MATCH PATTERN (signup THEN click{2,} THEN purchase
         WITHIN '48' HOURS)
         PARTITION BY user_id
         MEASURES FIRST(click.value) AS v0, LAST(click.event_id) AS id1,
           COUNT(*) AS cn"""
    val batchRows = CepSql.sql(spark, pattern).collect()
    assert(batchRows.nonEmpty)
    // batch cols: user_id, id_1, len_2, id_3, ts_1..ts_3, v0, id1, cn
    val batch = batchRows.map { r =>
      (r.getLong(0), Seq(r.getLong(1), r.getLong(2), r.getLong(3))) ->
        ((r.getDouble(7), r.getLong(8), r.getLong(9)))
    }.toMap
    implicit val sq = spark.sqlContext
    val stream = MemoryStream[CepEvent]
    val name = s"runchain_bnd_${System.nanoTime}"
    val q = RunChainDetector.detectMeasures(stream.toDS(),
        Seq(((e: CepEvent) => e.event_type == "signup", None),
          ((e: CepEvent) => e.event_type == "click", Some(2)),
          ((e: CepEvent) => e.event_type == "purchase", None)),
        48L * 3600 * 1000, Seq(None, None, None),
        Seq(CepSql.BoundRef("FIRST", "click", "value", 2, "v0"),
          CepSql.BoundRef("LAST", "click", "event_id", 2, "id1"),
          CepSql.SpanAgg("COUNT", "*", "cn")))
      .writeStream.queryName(name).format("memory")
      .outputMode("append").start()
    val data = eventsDs.orderBy("ts", "event_id").collect()
    data.grouped(250).foreach { c =>
      stream.addData(c.toSeq); q.processAllAvailable()
    }
    val flush = data.map(_.user_id).distinct.zipWithIndex.map {
      case (u, i) => CepEvent(-1000L - i,
        Timestamp.valueOf("2031-01-01 00:00:00"), u, "zz_flush", 7777.0)
    }
    stream.addData(flush.toSeq); q.processAllAvailable(); q.stop()
    val got = spark.table(name).collect().map { r =>
      val v = r.getSeq[Double](5)
      (r.getLong(0), r.getSeq[Long](1).toSeq) ->
        ((v(0), v(1).toLong, v(2).toLong))
    }.toMap
    assert(got.keySet === batch.keySet)
    batch.foreach { case (kk, (v0, id1, cn)) =>
      assert(math.abs(got(kk)._1 - v0) < 1e-9, s"FIRST value@$kk")
      assert(got(kk)._2 === id1, s"LAST id@$kk")
      assert(got(kk)._3 === cn, s"span count@$kk")
    }
  }
}
