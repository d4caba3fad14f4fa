package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch probe for the r8 reluctant-quantifier rewrite (kept as a
  * runnable measurement tool like the other probes here). */
object LazyProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    graft.Tables.load(spark, sf)
    for (h <- Seq("12", "48", "96");
         pat <- Seq("signup THEN click{2,}%s THEN purchase",
                    "view THEN click{2,}%s THEN error",
                    "signup THEN view{2,}%s THEN click")) {
      val txt = s"SELECT * FROM events MATCH PATTERN (${pat} WITHIN '$h' HOURS) PARTITION BY user_id"
      val g = graft.streaming.CepSql.sql(spark, txt.format("")).count()
      val l = graft.streaming.CepSql.sql(spark, txt.format("?")).count()
      println(s"h=$h pat=${pat.format("?")} greedy=$g lazy=$l")
    }
    spark.stop()
  }
}
