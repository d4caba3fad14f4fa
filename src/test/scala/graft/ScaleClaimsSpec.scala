package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** SCALE.md makes two load-bearing physical claims beyond PlanShapeSpec:
  * bucketing removes the fact⋈fact shuffle, and a date-partitioned layout
  * prunes time-windowed scans. Both are asserted against real plans here
  * so the 100 TB story is executable, not prose. */
class ScaleClaimsSpec extends SparkSpec {

  test("bucketed fact-fact join runs with zero shuffle exchanges") {
    val wh = Files.createTempDirectory("graft_bucketed").toFile.getAbsolutePath
    val o = Tables.table(spark, sf, "orders")
    val l = Tables.table(spark, sf, "lineitem")
    graft.sources.Layout.writeBucketed(o, "orders_b", s"$wh/orders_b",
      "o_orderkey")
    graft.sources.Layout.writeBucketed(l, "lineitem_b", s"$wh/lineitem_b",
      "l_orderkey")
    try {
      val j = spark.table("orders_b").join(spark.table("lineitem_b"),
        col("o_orderkey") === col("l_orderkey"))
        .groupBy("o_orderpriority").agg(sum("l_quantity"))
      j.collect()
      val p = j.queryExecution.executedPlan.toString()
      val shufflesBeforeAgg = "Exchange hashpartitioning\\((o_orderkey|l_orderkey)".r
        .findAllIn(p).size
      assert(shufflesBeforeAgg == 0,
        s"bucketed join must not shuffle either side:\n$p")
      // sanity: same result as the unbucketed join
      val want = o.join(l, col("o_orderkey") === col("l_orderkey"))
        .groupBy("o_orderpriority").agg(sum("l_quantity"))
        .collect().map(_.toSeq).toSet
      assert(j.collect().map(_.toSeq).toSet == want)
    } finally {
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS lineitem_b")
    }
  }

  test("date-partitioned events layout prunes time-window scans") {
    val dir = Files.createTempDirectory("graft_part").toFile.getAbsolutePath
    graft.sources.Layout.writeDatePartitioned(
      Tables.table(spark, sf, "events"), dir)
    val filtered = graft.sources.Layout.readDatePartitioned(spark, dir)
      .filter(col("date") === "2024-01-05")
    filtered.collect()
    val p = filtered.queryExecution.executedPlan.toString()
    val scanLine = p.linesIterator.find(_.contains("FileScan")).getOrElse("")
    assert(scanLine.contains("PartitionFilters: [") &&
      scanLine.contains("2024-01-05"),
      s"partition filter must reach the scan: $scanLine")
    // pruning is real: the pruned scan reads exactly the one partition
    val allDates = graft.sources.Layout.readDatePartitioned(spark, dir)
    assert(filtered.count() ==
      allDates.filter(col("date") === "2024-01-05").count())
    val prunedFiles = filtered.queryExecution.executedPlan.collectLeaves()
      .head.metrics.get("numFiles").map(_.value).getOrElse(-1L)
    assert(prunedFiles > 0 && prunedFiles <= 4,
      s"expected ~one partition of files, read $prunedFiles")
  }
}
