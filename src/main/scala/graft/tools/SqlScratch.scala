package graft.tools
import org.apache.spark.sql.SparkSession
/** Throwaway dev REPL-substitute: run one SQL string against the loaded
  * fixture tables and print columns + first rows. */
object SqlScratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.Tables.load(spark, args.headOption.getOrElse("/root/testdata/sf0.001"))
    val df = spark.sql(args(1))
    println(df.columns.mkString(", "))
    df.show(5, truncate = false)
    spark.stop()
  }
}
