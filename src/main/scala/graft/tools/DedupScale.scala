package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Measured scale curve for the dedup path (VERDICT r5 §next-7): runs the
  * EXACT q_minhash_band / q_dedup_resolve formulations over the sf0.1
  * documents table and over a ~10× duplicate+perturb scale-up of it, and
  * prints wall times + ratios. Numbers land in SCALE.md.
  *
  * Synthesis keeps candidate DENSITY honest: each replica's words are
  * salted with the replica id (`r3_word`), so every word n-gram differs
  * across replicas — no cross-replica band collisions, and the scaled
  * corpus is k disjoint copies of the original's duplicate structure
  * (rows ×k ⇒ candidate pairs ×k, component structure ×k). Replicating
  * text verbatim would instead make every doc a k-clique and measure a
  * quadratic blowup the real operator never sees.
  */
object DedupScale {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val k = sys.env.getOrElse("SPARK_GRAFT_SCALE_K", "10").toInt

    val base = Tables.table(spark, dir, "documents")
      .select("doc_id", "lang", "text")
    def scaled(k: Int): DataFrame =
      if (k == 1) base
      else base.crossJoin(spark.range(k).select(col("id").as("__r")))
        .select((col("doc_id") * k + col("__r")).as("doc_id"), col("lang"),
          concat(concat_ws("", lit("r"), col("__r"), lit("_")),
            regexp_replace(col("text"), lit(" "),
              concat_ws("", lit(" r"), col("__r"), lit("_")))).as("text"))

    def time[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val a = f
      (a, (System.nanoTime() - t0) / 1e9)
    }

    def run(tag: String, docs: DataFrame): (Long, Double, Long, Double) = {
      // materialize synthesis OUTSIDE the timed region
      val d = docs.localCheckpoint(true)
      val (nBand, tBand) = time(graft.queries.TextOps.bandRows(d).count())
      val (nRes, tRes) = time {
        val bands = graft.Caching.cache(graft.queries.TextOps.bandRows(d))
        val pairs = bands.as("a").join(bands.as("b"),
            col("a.band") === col("b.band") &&
            col("a.band_sig") === col("b.band_sig") &&
            col("a.doc_id") < col("b.doc_id"))
          .select(col("a.doc_id").as("da"), col("b.doc_id").as("db"))
          .distinct()
        val n = graft.operators.Components.resolveDuplicates(pairs).count()
        graft.Caching.releaseAll()
        n
      }
      println(f"$tag%-8s docs=${d.count()}%7d  band rows=$nBand%8d " +
        f"band=${tBand}%6.2f s  resolve rows=$nRes%6d resolve=${tRes}%6.2f s")
      (nBand, tBand, nRes, tRes)
    }

    val (b1, tb1, r1, tr1) = run("1x", scaled(1))
    val (bk, tbk, rk, trk) = run(s"${k}x", scaled(k))
    println(f"ratios at ${k}x: band rows ${bk.toDouble / b1}%.1f×, " +
      f"band time ${tbk / tb1}%.1f×; resolve rows ${rk.toDouble / r1}%.1f×, " +
      f"resolve time ${trk / tr1}%.1f×")
    spark.stop()
  }
}
