package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dev-only A/B probe for the q_window_rank shapes: builtin ntile vs
  * arithmetic ntile vs row_number-only (the BASELINE.md shape). */
object WinProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val orders = spark.read.parquet(s"$dir/orders.parquet")
    orders.count()
    val w = Window.partitionBy("o_custkey")
      .orderBy(desc("o_totalprice"), asc("o_orderkey"))
    val wFull = w.rowsBetween(
      Window.unboundedPreceding, Window.unboundedFollowing)

    def rnOnly() = orders
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= 3)
      .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
      .orderBy("o_custkey", "rn")

    def builtin() = orders
      .withColumn("rn", row_number().over(w).cast("long"))
      .withColumn("rnk", rank().over(w).cast("long"))
      .withColumn("nt", ntile(4).over(w).cast("long"))
      .filter(col("rn") <= 3)
      .select("o_custkey", "o_orderkey", "o_totalprice", "rn", "rnk", "nt")
      .orderBy("o_custkey", "rn")

    def arith() = orders
      .withColumn("rn", row_number().over(w).cast("long"))
      .withColumn("rnk", rank().over(w).cast("long"))
      .withColumn("pc", count(lit(1)).over(wFull))
      // the PRODUCTION formula — probe and query can't drift apart
      .withColumn("nt", graft.queries.arithNtile(col("rn"), col("pc"), 4))
      .filter(col("rn") <= 3)
      .select("o_custkey", "o_orderkey", "o_totalprice", "rn", "rnk", "nt")
      .orderBy("o_custkey", "rn")

    val shapes = Seq("rn_only" -> (() => rnOnly()),
      "builtin" -> (() => builtin()), "arith" -> (() => arith()))
    for ((name, f) <- shapes) {
      f().count() // warm
      val ts = (1 to 5).map { _ =>
        val t0 = System.nanoTime(); f().count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"$name%-8s min ${ts.min}%.3f  med ${ts.sorted.apply(2)}%.3f")
    }
    // cross-check: arithmetic ntile must equal builtin ntile exactly
    val diff = builtin().withColumnRenamed("nt", "nt_b")
      .join(arith().withColumnRenamed("nt", "nt_a"),
        Seq("o_custkey", "o_orderkey"))
      .filter(col("nt_b") =!= col("nt_a")).count()
    println(s"ntile mismatch rows: $diff")
    spark.stop()
  }
}
