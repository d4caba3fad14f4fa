package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev utility: cold/warm per-query timing + optional plan dump.
  * Usage: Prof [--explain] [--sf dir] key... */
object Prof {
  def main(args: Array[String]): Unit = {
    val explain = args.contains("--explain")
    val sfIdx = args.indexOf("--sf")
    val dir = if (sfIdx >= 0) args(sfIdx + 1) else "/root/testdata/sf0.1"
    val keys = args.filterNot(_.startsWith("--")).filterNot(a =>
      sfIdx >= 0 && a == args(sfIdx + 1))
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).count()
    for (q <- keys) {
      val fn = graft.SparkEntry.queries(q)
      if (explain) fn(spark, dir).explain("formatted")
      val t0 = System.nanoTime(); fn(spark, dir).count()
      val t1 = System.nanoTime(); fn(spark, dir).count()
      val t2 = System.nanoTime()
      println(f"$q%-22s cold ${(t1 - t0) / 1e9}%6.2f  warm ${(t2 - t1) / 1e9}%6.2f")
    }
    spark.stop()
  }
}
