package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming._
import graft.Tables

/** Runtime demo: replay the events table through Structured Streaming,
  * run CEP + windowed continuous queries via ContinuousQueries. */
object StreamDemo {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions","4")
      .config("spark.sql.session.timeZone","UTC")
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val sf = "/root/testdata/sf0.001"
    val ev = Tables.table(spark, sf, "events")
      .select("event_id","ts","user_id","event_type","value").as[CepEvent]
      .orderBy("ts","event_id").collect()

    val s1 = MemoryStream[CepEvent]
    val s2 = MemoryStream[CepEvent]
    ContinuousQueries.submitMemory(
      StreamOps.tumblingCounts(s1.toDF(), "1 hour"), "demo_tumbling")
    val cepQ = CepSequence.detect(s2.toDS(), "signup", "purchase", 30*60*1000L)
      .writeStream.queryName("demo_cep").format("memory").outputMode("append").start()
    println("active queries: " + ContinuousQueries.list(spark).map(_.name).sorted.mkString(","))
    ev.grouped(200).foreach { chunk => s1.addData(chunk.toSeq); s2.addData(chunk.toSeq) }
    ContinuousQueries.awaitAll(spark)
    val tumbling = spark.table("demo_tumbling").count()
    val cep = spark.table("demo_cep").count()
    val batchTumbling = StreamOps.tumblingCounts(Tables.table(spark, sf, "events"), "1 hour").count()
    val batchCep = graft.SparkEntry.queries("q_cep_seq")(spark, sf).count()
    println(s"tumbling stream=$tumbling batch=$batchTumbling  cep stream=$cep batch=$batchCep")
    // probe: cancel unknown + double cancel
    println("cancel bogus -> " + ContinuousQueries.cancel(spark, "nope"))
    println("cancel demo_tumbling -> " + ContinuousQueries.cancel(spark, "demo_tumbling"))
    println("cancel demo_tumbling again -> " + ContinuousQueries.cancel(spark, "demo_tumbling"))
    cepQ.stop()
    println("remaining: " + ContinuousQueries.list(spark).map(_.name).mkString(",") + "<end>")
    spark.stop()
  }
}
