package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.Components

/** Head-to-head: min-label propagation vs large-star/small-star
  * alternation (r7) — rounds and wall on (a) the REAL LSH candidate-pair
  * graph from the sf0.1 documents (star-like duplicate clusters,
  * diameter 2-3) and (b) a chain-heavy synthetic graph (10k disjoint
  * 64-node chains — the topology min-label's O(diameter) hurts on).
  * Numbers land in SCALE.md. Dev-only probe. */
object CCProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    def time[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val a = f
      (a, (System.nanoTime() - t0) / 1e9)
    }

    def compare(tag: String, edges: DataFrame, maxIter: Int = 128): Unit = {
      val e = edges.localCheckpoint(true) // synthesis outside timed region
      val ((labM, rM), tM) = time {
        val r = Components.minLabelWithRounds(e, maxIter)
        r._1.count()
        r
      }
      val ((labS, rS), tS) = time {
        val r = Components.starWithRounds(e, maxIter)
        r._1.count()
        r
      }
      val nM = labM.count()
      val nS = labS.count()
      println(f"$tag%-14s min-label: $rM%3d rounds ${tM}%6.2f s " +
        f"($nM%7d labels) | star: $rS%3d rounds ${tS}%6.2f s ($nS%7d)")
    }

    // (a) real duplicate-candidate pairs from the documents table
    val docs = Tables.table(spark, dir, "documents")
      .select("doc_id", "lang", "text")
    val bands = graft.Caching.cache(graft.queries.TextOps.bandRows(docs))
    val pairs = bands.as("a").join(bands.as("b"),
        col("a.band") === col("b.band") &&
        col("a.band_sig") === col("b.band_sig") &&
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("da"), col("b.doc_id").as("db"))
      .distinct()
    compare("lsh-pairs", pairs)
    graft.Caching.releaseAll()

    // (b) chain-heavy: 10k disjoint chains of 64 nodes
    val chains = spark.range(10000L * 63)
      .select((col("id") / 63).cast("long").as("c"),
        (col("id") % 63).cast("long").as("i"))
      .select((col("c") * 64 + col("i")).as("src"),
        (col("c") * 64 + col("i") + 1).as("dst"))
    compare("chains-64", chains)
    spark.stop()
  }
}
