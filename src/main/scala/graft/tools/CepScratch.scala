package graft.tools
import org.apache.spark.sql.SparkSession
/** Throwaway dev probe: run one CepSql dialect statement and show it. */
object CepScratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.Tables.load(spark, args(0))
    val df = graft.streaming.CepSql.sql(spark, args(1))
    println(df.columns.mkString(", "))
    println("rows=" + df.count())
    df.show(5, truncate = false)
    spark.stop()
  }
}
