package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Measured scale curve for q_skyline (r12): replicate the documents
  * table ×1/×4/×16 with remapped doc_ids (texts unchanged — each doc's
  * (distinct-token count, n_chars) point is identical across replicas,
  * so the reduced per-a frame |A| must stay CONSTANT while the corpus
  * grows ×k; the frontier itself only gains the replicas of frontier
  * docs). Reports wall time per step (exponent vs docs), |A|, and the
  * frontier size. The claim under test: skyline cost is the corpus
  * scan (linear), never the |A|² suffix-max self-join (constant).
  * Results land in SCALE.md. */
object SkylineProbe {
  private def med3(f: => Long): (Long, Double) = {
    f
    val runs = (1 to 3).map { _ =>
      val t0 = System.nanoTime()
      val n = f
      (n, (System.nanoTime() - t0) / 1e9)
    }
    (runs.head._1, runs.map(_._2).sorted.apply(1))
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val base = Tables.table(spark, dir, "documents")
      .select("doc_id", "text", "n_chars")
    val maxId = base.agg(max("doc_id")).head().getLong(0) + 1

    def replicate(k: Int): DataFrame =
      (0 until k).map { i =>
        base.select((col("doc_id") + lit(i * maxId)).as("doc_id"),
          col("text"), col("n_chars"))
      }.reduce(_ unionByName _)

    val rows = Seq(1, 4, 16).map { k =>
      val d = replicate(k)
      val nDocs = d.count()
      val (nFront, t) = med3 {
        val n = graft.queries.PipelineOps.skylineOf(d).count()
        graft.Caching.releaseAll()
        n
      }
      val nA = d.select(size(array_distinct(split(col("text"), " ")))
        .cast("long").as("a")).distinct().count()
      println(f"x$k%-3d docs=$nDocs%7d  |A|=$nA%4d  frontier=$nFront%4d" +
        f"  t=$t%7.3f s")
      (nDocs, nA, nFront, t)
    }
    val e = math.log(rows(2)._4 / rows(0)._4) /
      math.log(rows(2)._1.toDouble / rows(0)._1)
    println(f"time exponent (x1→x16 docs): $e%5.2f" +
      f"  |A| ratio: ${rows(2)._2.toDouble / rows(0)._2}%4.2f" +
      f"  (claim: exponent ≈ 1, |A| flat)")
    spark.stop()
  }
}
