package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.Panes
object PaneDistinctProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).count()
    val e = Tables.table(spark, dir, "events")
    def direct() = e.groupBy(window(col("ts"), "6 hours", "10 minutes"))
      .agg(countDistinct("user_id").as("nd")).count()
    def directHll() = e.groupBy(window(col("ts"), "6 hours", "10 minutes"))
      .agg(expr("hll_sketch_estimate(hll_sketch_agg(user_id))").as("nd"))
      .count()
    def paned() = Panes.slidingDistinctViaPanes(e, "ts", "6 hours",
      "10 minutes", "user_id").count()
    def time(f: => Long): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9 }
    direct(); directHll(); paned() // warm
    println(f"exact-expand=${time(direct())}%.2fs hll-expand=${time(directHll())}%.2fs hll-panes=${time(paned())}%.2fs (36-pane overlap, sf0.1)")
    spark.stop()
  }
}
