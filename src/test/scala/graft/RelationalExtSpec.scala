package graft

import org.apache.spark.sql.functions._

import graft.queries.{Cep, RelationalExt, TextOps, VectorOps}

/** Round-3 surface widening: subqueries, LATERAL, GROUPING SETS, window
  * navigation, UNPIVOT, FILTER aggregates, string_agg, CEP quantifier runs,
  * time spine, hash split, embedding centroids. The DuckDB oracle gate
  * proves cross-engine value equality; these tests pin the *semantics*
  * (invariants that would survive a refactor of either formulation).
  */
class RelationalExtSpec extends SparkSpec {

  private def run(key: String) =
    SparkEntry.queries(key)(spark, sf)

  test("q_subquery_exists rows are exactly orders having a qty>45 line") {
    val viaJoin = Tables.table(spark, sf, "orders").join(
      Tables.table(spark, sf, "lineitem")
        .filter(col("l_quantity") > 45).select("l_orderkey").distinct(),
      col("o_orderkey") === col("l_orderkey"))
    assert(run("q_subquery_exists").count() === viaJoin.count())
  }

  test("q_subquery_scalar keeps only rows above 1.5x their customer avg") {
    val rows = run("q_subquery_scalar")
    val avgs = Tables.table(spark, sf, "orders")
      .groupBy("o_custkey").agg(avg("o_totalprice").as("a"))
    val bad = rows.join(avgs, "o_custkey")
      .filter(col("o_totalprice") <= lit(1.5) * col("a")).count()
    assert(bad === 0)
  }

  test("q_lateral returns exactly 3 top orders per segment, sorted") {
    val df = run("q_lateral").collect()
    val bySeg = df.groupBy(_.getString(0))
    assert(bySeg.size === 5 && bySeg.values.forall(_.length === 3))
    bySeg.values.foreach { rows =>
      val prices = rows.map(_.getDouble(2)).toSeq
      assert(prices === prices.sorted.reverse)
    }
  }

  test("q_agg_gsets: grouping sets = union of groupby, rollup level, global") {
    val rows = run("q_agg_gsets").collect()
    val li = Tables.table(spark, sf, "lineitem")
    val nGroup = li.select("l_returnflag", "l_linestatus").distinct().count()
    val nRf = li.select("l_returnflag").distinct().count()
    assert(rows.length === nGroup + nRf + 1)
    val global = rows.filter(r => r.getString(0) == "ALL")
    assert(global.length === 1 && global.head.getLong(3) === li.count())
  }

  test("q_window_nav: fv is the partition max, lv the min, pr/cd in [0,1]") {
    val rows = run("q_window_nav")
    val bad = rows.filter(
      col("fv") < col("o_totalprice") || col("lv") > col("o_totalprice") ||
      col("pr") < 0 || col("pr") > 1 || col("cd") <= 0 || col("cd") > 1)
    assert(bad.count() === 0)
    // nv2 is null exactly for single-row partitions
    val singletons = Tables.table(spark, sf, "orders")
      .groupBy("o_custkey").count().filter(col("count") === 1).count()
    assert(rows.filter(col("nv2").isNull).count() === singletons)
  }

  test("q_unpivot triples the row count and loses no mass") {
    val li = Tables.table(spark, sf, "lineitem")
    val up = run("q_unpivot")
    assert(up.count() === 3 * li.count())
    val wide = li.agg(sum(col("l_quantity") + col("l_extendedprice") +
      col("l_discount"))).head.getDouble(0)
    val long = up.agg(sum("value")).head.getDouble(0)
    assert(math.abs(wide - long) < 1e-6)
  }

  test("q_agg_filter: filtered counts bounded by group count") {
    val bad = run("q_agg_filter").filter(
      col("hi_disc") > col("cnt") || col("big_f") > col("cnt"))
    assert(bad.count() === 0)
  }

  test("q_string_agg emits each (lang) once with sorted source list") {
    val rows = run("q_string_agg").collect()
    assert(rows.map(_.getString(0)).toSeq === Seq("de", "en", "es", "fr", "zh"))
    rows.foreach { r =>
      val srcs = r.getString(1).split(",").toSeq
      assert(srcs === srcs.sorted && srcs.length === r.getLong(2))
    }
  }

  test("q_cep_times: every run has >=3 clicks and no interleaved event") {
    val runs = run("q_cep_times")
    assert(runs.filter(col("run_len") < 3).count() === 0)
    // no event of another type strictly inside any run's [start, end]
    val e = Tables.table(spark, sf, "events")
      .filter(col("event_type") =!= "click")
      .select(col("user_id").as("u2"), col("ts"))
    val interleaved = runs.join(e,
      col("user_id") === col("u2") &&
      col("ts") > col("run_start") && col("ts") < col("run_end")).count()
    assert(interleaved === 0)
  }

  test("q_time_spine is hourly-continuous and preserves total count") {
    val rows = run("q_time_spine").collect()
    val hours = rows.map(_.getTimestamp(0).getTime)
    assert(hours.sliding(2).forall {
      case Array(a, b) => b - a == 3600L * 1000; case _ => true })
    val total = rows.map(_.getLong(1)).sum
    assert(total === Tables.table(spark, sf, "events").count())
  }

  test("q_split_hash is a partition with stable ~12/2/2 proportions") {
    val rows = run("q_split_hash")
    assert(rows.count() === Tables.table(spark, sf, "documents").count())
    val bySplit = rows.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bySplit.keySet === Set("train", "val", "test"))
    val n = bySplit.values.sum.toDouble
    assert(bySplit("train") / n > 0.6) // 12/16 expected, loose bound
    // determinism: re-running yields identical assignment
    val again = run("q_split_hash")
    assert(rows.exceptAll(again).count() === 0)
  }

  test("q_embed_centroid: 64 positions per label, counts sum to table size") {
    val c = run("q_embed_centroid")
    val perLabel = c.groupBy("label").count().collect()
    assert(perLabel.forall(_.getLong(1) === 64))
    val total = c.filter(col("pos") === 0).agg(sum("n")).head.getLong(0)
    assert(total === Tables.table(spark, sf, "embeddings").count())
  }
}
