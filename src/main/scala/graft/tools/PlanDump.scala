package graft.tools
import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession
/** Dump formatted physical plans for the flagship queries into docs/plans/. */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions","4")
      .config("spark.sql.session.timeZone","UTC")
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.001"
    Files.createDirectories(Paths.get("docs/plans"))
    val keys = Seq("q_window_tumbling", "q_join_broadcast", "q_topk",
      "q_agg_groupby", "q_cosine_topk", "q_minhash_band", "q_join_asof",
      "q_join_bloom", "q_topk_group", "q_join_theta", "q_pattern_chain",
      "q_join_overlap", "q_simhash_pairs", "q_sliding_distinct",
      // r9 rewrites: window-free RFM quartiles; subclustered SemDeDup
      "q_rfm", "q_semdedup", "q_join_6way", "q_mad_outlier")
    keys.foreach { k =>
      val df = graft.SparkEntry.queries(k)(spark, dir)
      df.collect() // finalize AQE so the committed plan is the real one
      val txt = s"// $k — final adaptive plan at sf0.001, ${java.time.LocalDate.now}\n" +
        df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
      Files.writeString(Paths.get(s"docs/plans/$k.txt"), txt)
      println(s"wrote docs/plans/$k.txt")
    }
    spark.stop()
  }
}
