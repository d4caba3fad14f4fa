package graft.tools

import org.apache.spark.sql.SparkSession

/** Targeted Verify (dev-only): dump just the named keys' results to
  * parquet for a quick local DuckDB diff, instead of the full 180+-key
  * graft.Verify board. Usage: VerifyKeys <sfDir> <outDir> <key...> */
object VerifyKeys {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    val keys = args.drop(2)
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    keys.foreach { name =>
      graft.SparkEntry.queries(name)(spark, sfDir)
        .coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
      graft.Caching.releaseAll()
      println(s"[verify-one] wrote $name")
    }
    // refresh the oracle dump too, so check_oracle --skip-verify sees
    // oracles added since the last FULL graft.Verify run
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$outDir/oracle_sql.json"),
      graft.SparkEntry.oracleSql
        .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}"))
    spark.stop()
  }
}
