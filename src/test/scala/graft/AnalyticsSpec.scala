package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-stream analytics keys (Analytics.scala). The DuckDB oracle gate
  * proves cross-engine value equality; these pin semantic invariants
  * against independent formulations.
  */
class AnalyticsSpec extends SparkSpec {

  private def run(key: String) =
    SparkEntry.queries(key)(spark, sf)

  test("q_resample_ohlc bars bound their own extremes and count all events") {
    val bars = run("q_resample_ohlc").collect()
    bars.foreach { r =>
      val (o, h, l, c) = (r.getAs[Double]("open"), r.getAs[Double]("high"),
        r.getAs[Double]("low"), r.getAs[Double]("close"))
      assert(l <= o && o <= h, s"open outside [low, high]: $r")
      assert(l <= c && c <= h, s"close outside [low, high]: $r")
      assert(r.getAs[Long]("cnt") >= 1L)
    }
    val total = Tables.table(spark, sf, "events").count()
    assert(bars.map(_.getAs[Long]("cnt")).sum === total)
  }

  test("q_resample_ohlc open is the value of the bucket's earliest event") {
    // independent recomputation: per (type, bucket), the row with the
    // smallest (ts, event_id) carries the open
    val e = Tables.table(spark, sf, "events")
      .withColumn("bucket", expr("unix_micros(ts) div 900000000"))
    val w = Window.partitionBy("event_type", "bucket")
      .orderBy(asc("ts"), asc("event_id"))
    val opens = e.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("event_type"), col("bucket"), col("value").as("open2"))
    val bars = run("q_resample_ohlc")
      .withColumn("bucket", expr("unix_micros(bucket_ts) div 900000000"))
    val joined = bars.join(opens, Seq("event_type", "bucket"))
    assert(joined.count() === bars.count())
    assert(joined.filter(col("open") =!= col("open2")).count() === 0L)
  }

  test("q_ewma equals the raw value on each user's first event") {
    val w = Window.partitionBy("user_id").orderBy(asc("ts"), asc("event_id"))
    val firsts = Tables.table(spark, sf, "events")
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("user_id"), col("event_id"), col("value"))
    val got = run("q_ewma").join(firsts, Seq("user_id", "event_id"))
    assert(got.count() > 0)
    got.collect().foreach { r =>
      // num = value, den = 1 → ewma = fround(value, 4)
      val want = math.floor(r.getAs[Double]("value") * 10000 + 0.5) / 10000
      assert(r.getAs[Double]("ewma") === want)
    }
  }

  test("q_ewma stays inside the trailing-16 value envelope") {
    val w = Window.partitionBy("user_id").orderBy(asc("ts"), asc("event_id"))
      .rowsBetween(-15, 0)
    val env = Tables.table(spark, sf, "events")
      .withColumn("lo", min("value").over(w))
      .withColumn("hi", max("value").over(w))
      .select("user_id", "event_id", "lo", "hi")
    run("q_ewma").join(env, Seq("user_id", "event_id")).collect()
      .foreach { r =>
        val x = r.getAs[Double]("ewma")
        assert(x >= r.getAs[Double]("lo") - 1e-4 &&
          x <= r.getAs[Double]("hi") + 1e-4, s"ewma outside envelope: $r")
      }
  }

  test("q_rolling_median sits inside the trailing-15 envelope; first row " +
      "equals its value") {
    val w = Window.partitionBy("user_id").orderBy(asc("ts"), asc("event_id"))
      .rowsBetween(-14, 0)
    val env = Tables.table(spark, sf, "events")
      .withColumn("lo", min("value").over(w))
      .withColumn("hi", max("value").over(w))
      .withColumn("rn", row_number().over(
        Window.partitionBy("user_id").orderBy(asc("ts"), asc("event_id"))))
      .select("user_id", "event_id", "lo", "hi", "rn", "value")
    run("q_rolling_median").join(env, Seq("user_id", "event_id"))
      .collect().foreach { r =>
        val m = r.getAs[Double]("med")
        assert(m >= r.getAs[Double]("lo") - 1e-4 &&
          m <= r.getAs[Double]("hi") + 1e-4)
        if (r.getAs[Int]("rn") == 1) {
          val want = math.floor(r.getAs[Double]("value") * 1e4 + 0.5) / 1e4
          assert(m === want, "singleton frame: median is the value itself")
        }
      }
  }

  test("q_zscore: anomalies are rare, flag agrees with the rounded score") {
    val rows = run("q_zscore").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Boolean]("is_anomaly") ===
        (math.abs(r.getAs[Double]("z")) > 2.0))
    }
    val frac = rows.count(_.getAs[Boolean]("is_anomaly")).toDouble /
      rows.length
    // Chebyshev bounds P(|z|>2) <= 1/4 for ANY distribution; flag it if
    // over — that means the window stats are being computed wrong
    assert(frac < 0.25, s"anomaly fraction $frac fails the Chebyshev bound")
  }

  test("q_funnel_gap stages are monotone and never exceed q_funnel") {
    def stages(key: String) =
      SparkEntry.queries(key)(spark, sf).collect()
        .map(r => r.getString(0).take(1) -> r.getAs[Long]("users")).toMap
    val gap = stages("q_funnel_gap")
    val unb = stages("q_funnel")
    // funnel property: each stage loses (or keeps) users
    assert(gap("1") >= gap("2") && gap("2") >= gap("3"))
    // the bounded-gap funnel can only be tighter than the unbounded one
    assert(gap("1") === unb("1"))
    assert(gap("2") <= unb("2") && gap("3") <= unb("3"))
  }

  test("q_growth_wow: counts conserve, ratio reproduces lag division") {
    val rows = run("q_growth_wow").collect()
    val total = Tables.table(spark, sf, "events").count()
    assert(rows.map(_.getAs[Long]("cnt")).sum === total)
    rows.filter(!_.isNullAt(3)).foreach { r =>
      val want = r.getAs[Long]("cnt").toDouble / r.getAs[Long]("prev_cnt")
      assert(r.getAs[Double]("wow") === want)
    }
    // first week of each type has no predecessor
    rows.groupBy(_.getString(0)).foreach { case (_, rs) =>
      assert(rs.minBy(_.getAs[Long]("week")).isNullAt(3))
    }
  }

  test("q_burst_detect: every burst exceeds 3x its type's active-hour " +
      "mean, recomputed independently") {
    val rows = SparkEntry.queries("q_burst_detect")(spark, sf).collect()
    // independent recomputation of the per-type hourly distribution
    val hourly = Tables.table(spark, sf, "events")
      .withColumn("hr", expr("unix_micros(ts) div 3600000000"))
      .groupBy("event_type", "hr").agg(count(lit(1)).as("cnt"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2))
    val byType = hourly.groupBy(_._1._1).view
      .mapValues(v => (v.map(_._2).sum, v.size)).toMap
    val want = hourly.filter { case ((t, _), c) =>
      val (tot, act) = byType(t); c * act > 3 * tot
    }
    assert(rows.length === want.size)
    rows.foreach { r =>
      val (tot, act) = byType(r.getString(0))
      assert(r.getAs[Long]("cnt") * act > 3 * tot)
    }
    // (no bursts exist at sf0.001 — set equality is the law here; the
    // oracle gate proves the non-empty case at sf0.01, 4 bursts)
  }

  test("q_gap_fill: observed hours match the hourly mean; gaps carry " +
      "the last observation") {
    val rows = run("q_gap_fill").collect()
    assert(rows.nonEmpty)
    // spine completeness: every type has the same number of hours
    val byType = rows.groupBy(_.getString(0)).view.mapValues(_.length)
    assert(byType.values.toSet.size === 1, "all types share the spine")
    // LOCF: within a type (ordered by hour), an unobserved row's filled
    // value equals the previous row's
    rows.groupBy(_.getString(0)).foreach { case (_, rs) =>
      val ordered = rs.sortBy(_.getTimestamp(1).getTime)
      ordered.zip(ordered.tail).foreach { case (prev, cur) =>
        if (!cur.getBoolean(3) && !prev.isNullAt(2))
          assert(cur.getDouble(2) === prev.getDouble(2),
            s"gap must carry forward: $cur")
      }
    }
    assert(rows.exists(!_.getBoolean(3)), "fixture must contain gaps")
  }

  test("q_twap sits inside the day's value envelope and weights by time") {
    val rows = run("q_twap").collect()
    assert(rows.nonEmpty)
    val env = Tables.table(spark, sf, "events")
      .withColumn("day", to_date(col("ts")))
      .groupBy("user_id", "day")
      .agg(min("value").as("lo"), max("value").as("hi"))
      .collect()
      .map(r => (r.getLong(0), r.getDate(1).toString) ->
        (r.getDouble(2), r.getDouble(3))).toMap
    rows.foreach { r =>
      val (lo, hi) = env((r.getLong(0), r.getDate(1).toString))
      val t = r.getDouble(3)
      assert(t >= lo - 1e-4 && t <= hi + 1e-4, s"TWAP outside envelope: $r")
    }
    // single-event days: TWAP == the value (it holds all day)
    val singles = Tables.table(spark, sf, "events")
      .withColumn("day", to_date(col("ts")))
      .groupBy("user_id", "day")
      .agg(count(lit(1)).as("n"), max("value").as("v"))
      .filter(col("n") === 1).collect()
      .map(r => (r.getLong(0), r.getDate(1).toString) -> r.getDouble(3))
      .toMap
    if (singles.nonEmpty) rows.foreach { r =>
      singles.get((r.getLong(0), r.getDate(1).toString)).foreach { v =>
        val want = math.floor(v * 1e4 + 0.5) / 1e4
        assert(r.getDouble(3) === want)
      }
    }
  }

  test("q_ab_lift: arms partition the users; lift equals the rate " +
      "difference") {
    val r = run("q_ab_lift").collect().head
    val users = Tables.table(spark, sf, "events")
      .select("user_id").distinct().count()
    assert(r.getAs[Long]("n_a") + r.getAs[Long]("n_b") === users)
    assert(r.getAs[Long]("conv_a") <= r.getAs[Long]("n_a"))
    assert(r.getAs[Long]("conv_b") <= r.getAs[Long]("n_b"))
    val lift = r.getAs[Double]("rate_a") - r.getAs[Double]("rate_b")
    assert(math.abs(r.getAs[Double]("lift") - lift) < 2e-4)
    // degenerate experiments yield a NULL z, never a crash
    val za = r.getAs[Any]("z")
    val degenerate =
      r.getAs[Long]("conv_a") + r.getAs[Long]("conv_b") == 0 ||
      r.getAs[Long]("conv_a") + r.getAs[Long]("conv_b") == users
    assert((za == null) === degenerate)
  }

  test("q_dup_stats conserves the corpus: sum(n_docs) == doc count") {
    val rows = SparkEntry.queries("q_dup_stats")(spark, sf).collect()
    val docs = Tables.table(spark, sf, "documents").count()
    assert(rows.map(_.getAs[Long]("n_docs")).sum === docs)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_docs") ===
        r.getAs[Long]("sz") * r.getAs[Long]("n_clusters"))
    }
  }

  test("q_markov_trans rows are a stochastic matrix over observed pairs") {
    val rows = run("q_markov_trans").collect()
    // per-source probabilities sum to exactly 1 (ratio of exact ints)
    rows.groupBy(_.getString(0)).foreach { case (_, rs) =>
      val p = rs.map(_.getAs[Double]("prob")).sum
      assert(math.abs(p - 1.0) < 1e-12)
    }
    // pair count conservation: sum(cnt) = total events - distinct users
    // (each user's last event has no successor)
    val e = Tables.table(spark, sf, "events")
    val want = e.count() - e.select("user_id").distinct().count()
    assert(rows.map(_.getAs[Long]("cnt")).sum === want)
  }

  test("q_profile approx twin stays within HLL error of the exact key " +
      "(r10 scale path)") {
    // the exact key's three countDistincts plan an Expand (×3 rows) —
    // the 100 TB profiler swaps them for approx_count_distinct. Pin
    // that the swap is safe: at rsd = 2% each approx cardinality lands
    // within 5% (2.5σ) of the exact key's n_distinct readout — rsd is
    // a STANDARD DEVIATION, so the bound needs headroom over it (the
    // default 5% rsd measured an 8.3% miss on the value column).
    val exact = run("q_profile").collect()
      .map(r => r.getString(0) -> r.getAs[Long]("n_distinct")).toMap
    val a = Tables.table(spark, sf, "events").agg(
      approx_count_distinct("user_id", 0.02).as("u"),
      approx_count_distinct("event_type", 0.02).as("t"),
      approx_count_distinct("value", 0.02).as("v")).first()
    val approx = Map("user_id" -> a.getLong(0),
      "event_type" -> a.getLong(1), "value" -> a.getLong(2))
    approx.foreach { case (c, ap) =>
      val ex = exact(c)
      assert(math.abs(ap - ex) <= math.max(1L, math.ceil(0.05 * ex).toLong),
        s"$c: approx $ap vs exact $ex exceeds the 5% HLL bound")
    }
    // and the approx plan must NOT Expand (that is the point of the swap)
    val ap = Tables.table(spark, sf, "events").agg(
      approx_count_distinct("user_id", 0.02),
      approx_count_distinct("event_type", 0.02),
      approx_count_distinct("value", 0.02))
      .queryExecution.executedPlan.toString()
    assert(!ap.contains("Expand"), s"approx profiler must not Expand:\n$ap")
  }

  test("q_funnel_ttc: completer count matches q_funnel stage 3; " +
      "percentiles ordered (r10)") {
    val ttc = run("q_funnel_ttc").collect().head
    val stage3 = run("q_funnel").collect()
      .find(_.getString(0) == "3_purchase").get.getAs[Long]("users")
    assert(ttc.getAs[Long]("n_converted") === stage3,
      "every stage-3 completer has exactly one conversion time")
    if (stage3 > 0) {
      assert(ttc.getAs[Double]("p50_us") <= ttc.getAs[Double]("p90_us"))
      assert(ttc.getAs[Double]("p50_us") > 0)
    }
  }
}
