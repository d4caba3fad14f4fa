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
    time("langid corpus classify x20")({
      // same shape as q_lang_id, over the replicated corpus
      import org.apache.spark.sql.expressions.Window
      val tok = docs.select(col("doc_id"), col("lang"), explode(split(col("text")," ")).as("w"))
      val docwords = tok.select("doc_id","w").distinct()
      val langtop = tok.groupBy(col("lang").as("cand"), col("w")).agg(count(lit(1)).as("cnt"))
        .withColumn("rn", row_number().over(Window.partitionBy("cand").orderBy(desc("cnt"), asc("w"))))
        .filter(col("rn") <= 50).select("cand","w")
      docwords.join(langtop, "w").groupBy("doc_id","cand").agg(count(lit(1))).count()
    })
    docs.unpersist()
    // embeddings x20 = 40k vectors: blocked near-dup pairs + brute topk
    val emb = rep("embeddings", 20, "vec_id").persist()
    println("emb rows: " + emb.count())
    time("cosine topk brute x20")(graft.operators.Similarity.topK(spark, emb, "vec_id", "embedding", 0L, 10).count())
    time("blocked neardup pairs x20")({
      graft.functions.GraftFunctions.register(spark)
      val a = emb.select(col("vec_id").as("ia"), col("label"), col("embedding").as("va"))
      val b = emb.select(col("vec_id").as("ib"), col("label").as("lb"), col("embedding").as("vb"))
      a.join(b, col("label")===col("lb") && col("ia")<col("ib"))
        .select(expr("cosine_sim(va, vb)").as("cs")).filter(col("cs") > 0.99).count()
    })
    emb.unpersist()
    // orders x20 = 3M: ranking window at scale
    val ord = rep("orders", 20, "o_orderkey").persist()
    println("orders rows: " + ord.count())
    time("window rank top3 x20")({
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("o_custkey").orderBy(desc("o_totalprice"), asc("o_orderkey"))
      ord.withColumn("rn", row_number().over(w)).filter(col("rn") <= 3).count()
    })
    ord.unpersist()
    spark.stop()
  }
}
