package graft.tools

import org.apache.spark.sql.SparkSession

/** Dump executed plans for the round-3 SQL-surface queries (dev-only). */
object Probe2 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .appName("probe2").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = "/root/testdata/sf0.001"
    Seq("q_subquery_exists", "q_subquery_in", "q_subquery_scalar",
        "q_lateral").foreach { k =>
      val df = graft.SparkEntry.queries(k)(spark, sf)
      df.collect()
      println(s"===== $k =====")
      println(df.queryExecution.executedPlan.toString().take(3000))
    }
    spark.stop()
  }
}
