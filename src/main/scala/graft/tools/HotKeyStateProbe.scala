package graft.tools

import java.sql.Timestamp

import org.apache.spark.sql.SparkSession

import graft.streaming._

/** Dev probe (r10): detector STATE ceiling under a pathological hot key —
  * 100k events, ALL on one user. The join-side hot-key story is measured
  * (HotKeyProbe); this is the detector side: state must be ∝ the OPEN
  * window content (anchors/runs whose within-window still straddles the
  * watermark), never ∝ total events processed. Method: replay the same
  * event mix at two spacings (1 s and 10 s between events) — the denser
  * replay holds 10× more anchors inside the fixed 2 h window, so
  * watermark-bounded state must measure ~10× larger, while TOTAL events
  * are identical (100k each). Peak state rows / memory come from the
  * streaming progress metrics (numRowsTotal counts KEYS — one here;
  * memoryUsedBytes tracks the key's partial/tracker lists). Numbers land
  * in SCALE.md. */
object HotKeyStateProbe {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(100000)
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    implicit val sq = spark.sqlContext

    val t0 = Timestamp.valueOf("2026-01-01 00:00:00").getTime
    // one user; a signup every 10 events anchors a chain partial, rare
    // purchases complete some of them, clicks fill the runs
    def mkEvents(spacingMs: Long): Seq[CepEvent] = (0 until n).map { i =>
      val ty =
        if (i % 10 == 0) "signup"
        else if (i % 1000 == 999) "purchase"
        else "click"
      CepEvent(i.toLong, new Timestamp(t0 + i * spacingMs), 7L, ty, 1.0)
    }

    // optional arm filter (args 2+): run only tags containing a token
    val only = args.drop(1).toSeq
    def replay(tag: String, events: Seq[CepEvent],
        op: org.apache.spark.sql.Dataset[CepEvent]
          => org.apache.spark.sql.DataFrame,
        mode: String = "append"): Unit = {
      if (only.nonEmpty && !only.exists(tag.contains)) return
      val stream = org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[CepEvent]
      val q = op(stream.toDS()).writeStream.queryName(s"hk_$tag")
        .format("memory").outputMode(mode).start()
      var peakRows = 0L
      var peakMem = 0L
      val groups = events.grouped(2000).toSeq
      stream.addData(groups.head); q.processAllAvailable() // warm
      val t1 = System.nanoTime()
      groups.tail.foreach { c =>
        stream.addData(c); q.processAllAvailable()
        Option(q.lastProgress).foreach(_.stateOperators.foreach { so =>
          peakRows = math.max(peakRows, so.numRowsTotal)
          peakMem = math.max(peakMem, so.memoryUsedBytes)
        })
      }
      val secs = (System.nanoTime() - t1) / 1e9
      val nEv = groups.tail.map(_.length).sum
      val matches = spark.table(s"hk_$tag").count()
      q.stop()
      println(f"$tag%-16s events=$nEv (ONE key) wall=$secs%6.2fs " +
        f"rate=${nEv / secs}%7.0f ev/s matches=$matches%7d " +
        f"peakStateRows=$peakRows peakStateKB=${peakMem / 1024}%6d")
    }

    // never-completing variant: no purchases at all, so every anchor
    // lives until the watermark closes its window — state is EXACTLY
    // the in-window anchor count (n_window / 10), which the two
    // spacings set to 720 (1 s) vs 72 (10 s): the 10× state ratio at
    // identical total events is the bound made visible
    def mkNoPurchase(spacingMs: Long): Seq[CepEvent] =
      (0 until n).map { i =>
        val ty = if (i % 10 == 0) "signup" else "click"
        CepEvent(i.toLong, new Timestamp(t0 + i * spacingMs), 7L, ty, 1.0)
      }

    for ((spacing, lbl) <- Seq((1000L, "1s"), (10000L, "10s"))) {
      val evs = mkEvents(spacing)
      replay(s"runchain_$lbl", evs, ds =>
        RunChainDetector.detectWhere(
          ds.withWatermark("ts", "0 seconds").as[CepEvent],
          Seq(((e: CepEvent) => e.event_type == "signup", None),
            ((e: CepEvent) => e.event_type == "click", Some(2)),
            ((e: CepEvent) => e.event_type == "purchase", None)),
          2L * 3600 * 1000, Seq(None, None, None),
          Seq(false, false, false)).toDF())
      replay(s"nocomplete_$lbl", mkNoPurchase(spacing), ds =>
        RunChainDetector.detectWhere(
          ds.withWatermark("ts", "0 seconds").as[CepEvent],
          Seq(((e: CepEvent) => e.event_type == "signup", None),
            ((e: CepEvent) => e.event_type == "click", Some(2)),
            ((e: CepEvent) => e.event_type == "purchase", None)),
          2L * 3600 * 1000, Seq(None, None, None),
          Seq(false, false, false)).toDF())
      replay(s"skip_$lbl", evs, ds =>
        SkipDetector.detect(ds, Seq(Set("signup"), Set("purchase")),
          2L * 3600 * 1000, Some("0 seconds")))
      // r11: overlap detector — EVERY click anchors (the worst anchor
      // rate possible). With m=2 the frequent island breaks resolve
      // anchors almost immediately (state stays ~KB); with m=20 —
      // unreachable, since signups break every island at length <= 9 —
      // every anchor lives to its window deadline, so live anchors
      // must equal the IN-WINDOW click count (10× between the
      // spacings at identical total events), never the event count
      replay(s"overlap_$lbl", evs, ds =>
        OverlapRunDetector.detectWhere(ds,
          (e: CepEvent) => e.event_type == "click",
          (e: CepEvent) => e.event_type == "click",
          2, None, 2L * 3600 * 1000, Some("0 seconds")).toDF())
      replay(s"overlap_noq_$lbl", evs, ds =>
        OverlapRunDetector.detectWhere(ds,
          (e: CepEvent) => e.event_type == "click",
          (e: CepEvent) => e.event_type == "click",
          20, None, 2L * 3600 * 1000, Some("0 seconds")).toDF())
      // r11 session 2: overlap ABSENCE pendings — every click anchors,
      // islands close at each signup (rate 1/10), so anchors convert to
      // pendings fast and each pending lives to its 2 h deadline
      // (purchases are absent for most): peak state must track the
      // IN-WINDOW pending count (∝ density at fixed totals), the same
      // window-bound law as live anchors — never events processed
      replay(s"overlap_abs_$lbl", evs, ds =>
        OverlapRunDetector.detectAbsentWhere(ds,
          (e: CepEvent) => e.event_type == "click",
          (e: CepEvent) => e.event_type == "click",
          2, None,
          (e: CepEvent) => e.event_type == "purchase",
          2L * 3600 * 1000, "0 seconds").toDF())
      // r12: CHAINED-tail pendings — the 4-step overlap form. Same
      // anchor/island mix; pendings must additionally hold matched
      // mid-tail rows (purchase then a never-arriving 'refund'), so a
      // pending lives to its deadline carrying its tail vector: peak
      // state must stay the IN-WINDOW pending count (the two spacings'
      // 10× ratio), with only a constant per-pending size increase vs
      // the 3-step absence arm above
      replay(s"overlap_chain4_$lbl", evs, ds =>
        OverlapRunDetector.detectChainWhere(ds,
          (e: CepEvent) => e.event_type == "click",
          (e: CepEvent) => e.event_type == "click",
          2, None,
          Seq((e: CepEvent) => e.event_type == "purchase",
            (e: CepEvent) => e.event_type == "refund"),
          absent = true, 2L * 3600 * 1000, Some("0 seconds")).toDF())
      // r13: QUANTIFIED tail after the overlap head — pendings wait for
      // purchase{1,} ISLANDS (closing at the next non-purchase event),
      // and the detector's new state class is the per-quantified-step
      // island quad (CONSTANT: one (stage, count, start, end) per step)
      // on top of the window-bound pendings — so peak state must stay
      // the in-window pending census (the 10× density law), with no
      // island-tracker growth
      replay(s"overlap_qtail_$lbl", evs, ds =>
        OverlapRunDetector.detectChainWhere(ds,
          (e: CepEvent) => e.event_type == "click",
          (e: CepEvent) => e.event_type == "click",
          2, None,
          Seq((e: CepEvent) => e.event_type == "purchase"),
          absent = false, 2L * 3600 * 1000, Some("0 seconds"),
          tailQuant = Seq(Some((1, None)))).toDF())
      // r13 session 2: MATCH_NUMBER hold buffer — completions hold
      // until no live anchor/pending with a smaller (ts_1, id_1)
      // remains. With m=2 the frequent island closes resolve anchors
      // almost immediately, so the buffer drains at each close: peak
      // state must stay the in-window live-anchor + brief-hold census
      // (window-bound), plus the ONE persistent counter per matched
      // key
      replay(s"overlap_mn_$lbl", evs, ds =>
        OverlapRunDetector.detectMeasures(ds,
          (e: CepEvent) => e.event_type == "click",
          (e: CepEvent) => e.event_type == "click",
          2, None, 2L * 3600 * 1000,
          Seq(CepSql.SpanAgg("COUNT", "*", "c"), CepSql.MatchNum("mn")),
          Some("0 seconds")).toDF())
      // r12: CUSUM marks — state is four longs per key by construction
      // (running drift prefix sums + their minima), so peak state must
      // be CONSTANT (1 row, flat KB) across spacings AND totals — the
      // cdcCompact state class
      replay(s"cusum_$lbl", evs, ds =>
        TimeSeriesOps.cusumMarks(ds, Map(7L -> 1.0)).toDF())
      // r11: CDC compaction — the strongest state claim of the set:
      // per-key state is ONE compacted row by construction, so peak
      // state must be CONSTANT (1 row, flat KB) across spacings AND
      // event totals — the log-depth independence the batch max_by
      // aggregation gets from map-side combine, held in streaming
      replay(s"cdc_$lbl", evs, ds =>
        TimeSeriesOps.cdcCompact(ds).toDF(), mode = "update")
    }
    spark.stop()
  }
}
