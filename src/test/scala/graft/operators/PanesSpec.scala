package graft.operators

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

class PanesSpec extends SparkSpec {

  test("slidingViaPanes == window() sliding aggregation on events") {
    val e = Tables.table(spark, sf, "events")
    val direct = e
      .groupBy(window(col("ts"), "30 minutes", "10 minutes"))
      .agg(count(lit(1)).as("cnt"), sum("value").as("sum_value"),
        min("value").as("min_value"), max("value").as("max_value"))
      .select(col("window.start").as("ws"), col("cnt"),
        round(col("sum_value"), 2).as("sum_value"),
        col("min_value"), col("max_value"))
    val paned = Panes.slidingViaPanes(e, "ts", "30 minutes", "10 minutes",
        Seq(("value", "count"), ("value", "sum"), ("value", "min"),
          ("value", "max")))
      .select(col("ws"), col("cnt"), round(col("sum_value"), 2)
        .as("sum_value"), col("min_value"), col("max_value"))
    val d = direct.collect().map(_.toSeq).toSet
    val p = paned.collect().map(_.toSeq).toSet
    assert(p == d && p.nonEmpty)
  }

  test("slidingViaPanes with keys == keyed window() aggregation") {
    val e = Tables.table(spark, sf, "events")
    val direct = e
      .groupBy(window(col("ts"), "1 hour", "30 minutes"), col("event_type"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("window.start").as("ws"), col("event_type"), col("cnt"))
    val paned = Panes.slidingViaPanes(e, "ts", "1 hour", "30 minutes",
      Seq(("value", "count")), keys = Seq("event_type"))
    assert(paned.collect().map(_.toSeq).toSet ==
      direct.collect().map(_.toSeq).toSet)
  }

  test("slidingDistinctViaPanes: HLL pane union tracks exact + direct (r6)") {
    val e = Tables.table(spark, sf, "events")
    // exact distinct users per sliding window (the q_sliding_distinct
    // oracle semantics)
    val exact = e
      .groupBy(window(col("ts"), "30 minutes", "10 minutes"))
      .agg(countDistinct("user_id").as("nd"))
      .select(col("window.start").as("ws"), col("nd"))
      .collect().map(r => r.getTimestamp(0) -> r.getLong(1)).toMap
    // direct sketch over the window()-expanded rows
    val direct = e
      .groupBy(window(col("ts"), "30 minutes", "10 minutes"))
      .agg(expr("hll_sketch_estimate(hll_sketch_agg(user_id))").as("est"))
      .select(col("window.start").as("ws"), col("est"))
      .collect().map(r => r.getTimestamp(0) -> r.getLong(1)).toMap
    val paned = Panes.slidingDistinctViaPanes(e, "ts", "30 minutes",
        "10 minutes", "user_id")
      .collect().map(r => r.getTimestamp(0) -> r.getLong(1)).toMap
    assert(paned.keySet == exact.keySet && paned.nonEmpty)
    paned.foreach { case (ws, est) =>
      val ex = exact(ws)
      assert(math.abs(est - ex) <= math.max(1L, ex / 20),
        s"$ws: pane-merged $est vs exact $ex exceeds 5%")
      val dr = direct(ws)
      assert(math.abs(est - dr) <= math.max(1L, dr / 100),
        s"$ws: pane-merged $est vs direct sketch $dr exceeds 1% — " +
          "the union should be register-equivalent")
    }
    // keyed form: per-(window, event_type) distinct users, same bound
    val exactKeyed = e
      .groupBy(window(col("ts"), "30 minutes", "10 minutes"),
        col("event_type"))
      .agg(countDistinct("user_id").as("nd"))
      .select(col("window.start").as("ws"), col("event_type"), col("nd"))
      .collect().map(r => (r.getTimestamp(0), r.getString(1)) -> r.getLong(2))
      .toMap
    val panedKeyed = Panes.slidingDistinctViaPanes(e, "ts", "30 minutes",
        "10 minutes", "user_id", Seq("event_type"))
      .collect().map(r => (r.getTimestamp(0), r.getString(1)) -> r.getLong(2))
      .toMap
    assert(panedKeyed.keySet == exactKeyed.keySet && panedKeyed.nonEmpty)
    panedKeyed.foreach { case (k, est) =>
      val ex = exactKeyed(k)
      assert(math.abs(est - ex) <= math.max(1L, ex / 20),
        s"$k: keyed pane-merged $est vs exact $ex exceeds 5%")
    }
  }

  test("degenerate case: window == slide reduces to tumbling") {
    val e = Tables.table(spark, sf, "events")
    val tumbling = e.groupBy(window(col("ts"), "1 hour"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("window.start").as("ws"), col("cnt"))
    val paned = Panes.slidingViaPanes(e, "ts", "1 hour", "1 hour",
      Seq(("value", "count")))
    assert(paned.collect().map(_.toSeq).toSet ==
      tumbling.collect().map(_.toSeq).toSet)
  }

  test("rejects non-mergeable aggregates and non-dividing slides") {
    val e = Tables.table(spark, sf, "events")
    intercept[IllegalArgumentException] {
      Panes.slidingViaPanes(e, "ts", "30 minutes", "10 minutes",
        Seq(("value", "avg"))).collect()
    }
    intercept[IllegalArgumentException] {
      Panes.slidingViaPanes(e, "ts", "30 minutes", "7 minutes",
        Seq(("value", "count"))).collect()
    }
  }
}
