package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** r15 (VERDICT r14 #8): skew audit for the two power-law-keyed
  * exchanges the dedup/posting paths depend on —
  *
  *  1. the band-graph equi self-join key (band, band_sig): a hot band
  *     bucket of size k contributes k² candidate pairs to ONE reducer;
  *  2. q_posting_df's gram exchange key xxhash64(lang, gram): a viral
  *     gram's (key, doc) rows all land on one reducer.
  *
  * The audit is DISTRIBUTIONAL, not timed (load-independent): per key it
  * reports max/percentile occupancy, the largest reducer's share under
  * the bench partition count, and the pair-volume share of the hottest
  * band bucket. Fan-out: `args(0)` replicates every document F times
  * with distinct ids (doc_id*F+r) BEFORE the pipeline — each replica
  * hashes into the same band buckets, so bucket sizes scale ×F exactly
  * like a corpus whose duplicate clusters scale with size (the
  * conservative-for-skew reading: real growth adds mostly NOVEL docs,
  * which spread over new buckets).
  */
object BandSkewProbe {
  def main(args: Array[String]): Unit = {
    val fanout = args.headOption.map(_.toInt).getOrElse(10)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/testdata/sf0.1")
    val parts = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = SparkSession.builder().master(s"local[$parts]")
      .config("spark.sql.shuffle.partitions", parts.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val docs0 = graft.Tables.table(spark, sfDir, "documents")
    val docs = docs0
      .withColumn("__r", explode(sequence(lit(0), lit(fanout - 1))))
      .select((col("doc_id") * fanout + col("__r")).as("doc_id"),
        col("lang"), col("text"), col("source"))
    println(s"[skew] sf=$sfDir fanout=x$fanout docs=" + docs.count())

    // 1. band-bucket occupancy and the pair volume it implies
    val occ = graft.queries.TextOps.bandRows(docs)
      .groupBy("band", "band_sig").agg(count(lit(1)).as("k"))
      .select(col("k"), expr("k * (k - 1) div 2").as("pairs"),
        pmod(hash(col("band"), col("band_sig")), lit(parts)).as("red"))
      .cache()
    val tot = occ.agg(sum("k").as("rows"), sum("pairs").as("pairs"),
      max("k").as("kmax"), expr("percentile(k, 0.999)").as("p999"),
      count(lit(1)).as("buckets")).head()
    val hot = occ.orderBy(desc("k")).limit(5)
      .select("k", "pairs").collect()
      .map(r => s"k=${r.getLong(0)} pairs=${r.getLong(1)}").mkString(", ")
    val red = occ.groupBy("red").agg(sum("pairs").as("rp"))
      .agg(max("rp").as("mx"), sum("rp").as("sm")).head()
    println(s"[skew] bands: buckets=${tot.getLong(4)} rows=${tot.getLong(0)}"
      + s" kmax=${tot.getLong(2)} p999=${tot.get(3)}"
      + s" pairTotal=${tot.getLong(1)} top5[$hot]"
      + f" hottestReducerPairShare=${red.getLong(0).toDouble /
          math.max(1L, red.getLong(1))}%.4f (parts=$parts)")

    // 2. posting-df gram-key occupancy under the bench partitioning
    val grams = graft.queries.TextOps.gramRows(docs, 4)
      .groupBy(xxhash64(col("lang"), col("gram")).as("kh"))
      .agg(count(lit(1)).as("occ"), countDistinct(col("doc_id")).as("df"))
      .cache()
    val g = grams.agg(count(lit(1)).as("keys"), max("occ").as("occMax"),
      expr("percentile(occ, 0.999)").as("p999"), max("df").as("dfMax"))
      .head()
    val gred = grams
      .select(pmod(hash(col("kh")), lit(parts)).as("red"), col("occ"))
      .groupBy("red").agg(sum("occ").as("rows"))
      .agg(max("rows").as("mx"), sum("rows").as("sm")).head()
    println(s"[skew] grams: keys=${g.getLong(0)} occMax=${g.getLong(1)}"
      + s" p999=${g.get(2)} dfMax=${g.getLong(3)}"
      + f" hottestReducerRowShare=${gred.getLong(0).toDouble /
          math.max(1L, gred.getLong(1))}%.4f (parts=$parts)")
    spark.stop()
  }
}
