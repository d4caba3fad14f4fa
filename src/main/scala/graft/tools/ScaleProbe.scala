package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.Tables
/** 20-40x synthetic scale-up of the heavy operators: measures whether the
  * plan SHAPES survive, using replicated copies of the sf0.1 tables
  * (perf exploration only - correctness stays on driver testdata). */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions","32")
      .config("spark.sql.session.timeZone","UTC")
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    def rep(t: String, k: Int, id: String) = {
      val df = Tables.table(spark, dir, t)
      df.crossJoin(spark.range(k).select(col("id").as("__r")))
        .withColumn(id, col(id) * k + col("__r")).drop("__r")
    }
    def time(tag: String)(f: => Long): Unit = {
      val t0=System.nanoTime(); val n=f
      println(f"$tag%-34s ${(System.nanoTime()-t0)/1e9}%7.1f s  ($n rows)")
    }
    // events x40 = 4M rows (user_id space also scaled to keep density)
    val ev = rep("events", 40, "event_id")
      .withColumn("user_id", col("user_id") + (col("event_id") % 40) * 1000)
      .persist()
    println("events rows: " + ev.count())
    time("tumbling 1h x40")(ev.groupBy(window(col("ts"),"1 hour"),col("event_type")).count().count())
    time("sliding 30m/10m x40")(ev.groupBy(window(col("ts"),"30 minutes","10 minutes"),col("event_type")).count().count())
    time("panes 6h/10m x40")(graft.operators.Panes.slidingViaPanes(ev,"ts","6 hours","10 minutes",Seq(("value","count"),("value","sum"))).count())
    time("expand 6h/10m x40")(ev.groupBy(window(col("ts"),"6 hours","10 minutes")).agg(count(lit(1)),sum("value")).count())
    val err = ev.filter(col("event_type")==="error").select(col("event_id").as("err_id"),col("user_id"),col("ts").as("err_ts"))
    val clk = ev.filter(col("event_type")==="click").select(col("event_id").as("click_id"),col("user_id"),col("ts").as("click_ts"))
    time("asof join x40")(graft.operators.TemporalJoins.asofJoinBackward(err,clk,Seq("user_id"),"err_id","err_ts","click_ts","click_id").count())
    ev.unpersist()
    // documents x20 = 100k docs
    val docs = rep("documents", 20, "doc_id").persist()
    println("docs rows: " + docs.count())
    time("minhashLsh candidates x20")(graft.operators.Dedup.minhashLsh(docs,"doc_id","text").count())
    time("simhash x20")(graft.operators.Dedup.simhash(docs,"doc_id","text").count())
    docs.unpersist()
    spark.stop()
  }
}
