package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.BloomPrune

/** Dev probe: measure what the bloom runtime prefilter actually removes
  * before the join exchange (the scale-relevant number), plus wall time
  * vs the plain join at this SF. */
object BloomProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).count() // JIT/session warm
    val cust = Tables.table(spark, dir, "customer")
      .filter(col("c_mktsegment") === "BUILDING").select("c_custkey")
    val orders = Tables.table(spark, dir, "orders")
    val total = orders.count()
    val kept = BloomPrune.prefilter(orders, "o_custkey", cust,
      "c_custkey", 200000L).count()
    val trueMatches = orders.join(cust,
      orders("o_custkey") === cust("c_custkey"), "left_semi").count()
    def time(f: => Long): (Double, Long) = {
      val t0 = System.nanoTime(); val n = f
      ((System.nanoTime() - t0) / 1e9, n)
    }
    def agg(pre: org.apache.spark.sql.DataFrame) =
      pre.join(cust, pre("o_custkey") === cust("c_custkey"))
        .groupBy("o_orderpriority").agg(count(lit(1))).count()
    // warm both paths once, then measure
    agg(orders); agg(BloomPrune.prefilter(orders, "o_custkey", cust,
      "c_custkey", 200000L))
    val (tPlain, _) = time(agg(orders))
    val (tBloom, _) = time(agg(BloomPrune.prefilter(orders, "o_custkey",
      cust, "c_custkey", 200000L)))
    println(f"orders=$total kept=$kept true=$trueMatches " +
      f"pruned=${100.0 * (total - kept) / total}%.1f%% " +
      f"fp=${100.0 * (kept - trueMatches) / math.max(1, kept)}%.2f%% " +
      f"plain=${tPlain}%.2fs bloom=${tBloom}%.2fs")
    spark.stop()
  }
}
