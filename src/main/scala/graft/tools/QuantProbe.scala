package graft.tools

import java.nio.file.{Files, Path}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.GraftFunctions
import graft.operators.Similarity

/** Dev probe (r7): the int8 scalar-quantization trade measured, not
  * asserted — storage footprint, scan+score wall time, and recall@10 of
  * the asymmetric quantized search vs exact float32, on a replicated
  * sf0.1 embeddings corpus (replication makes scan cost visible; the
  * fixture alone is cache-resident). Numbers land in SCALE.md. */
object QuantProbe {
  private def dirBytes(p: Path): Long = {
    val s = Files.walk(p)
    try s.filter(Files.isRegularFile(_)).mapToLong(Files.size).sum()
    finally s.close()
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val rep = args.drop(1).headOption.map(_.toInt).getOrElse(64)
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    GraftFunctions.register(spark)

    val base = Tables.table(spark, dir, "embeddings")
    val big = base.crossJoin(broadcast(
        spark.range(rep.toLong).toDF("__r")))
      .select((col("vec_id") * rep + col("__r")).as("vec_id"),
        col("embedding"))
    val tmp = Files.createTempDirectory("quantprobe")
    val f32Dir = tmp.resolve("f32").toString
    val i8Dir = tmp.resolve("i8").toString
    big.write.mode("overwrite").parquet(f32Dir)
    Similarity.quantizeInt8(big, "embedding")
      .select("vec_id", "codes", "scale")
      .write.mode("overwrite").parquet(i8Dir)
    val f32Bytes = dirBytes(tmp.resolve("f32"))
    val i8Bytes = dirBytes(tmp.resolve("i8"))

    // float query for the float scan, double query for the reconstructed
    // scan — cosine_sim requires matching element types
    val qvF = base.filter(col("vec_id") === 0)
      .select(col("embedding").as("qv"))
    val qvD = base.filter(col("vec_id") === 0)
      .select(transform(col("embedding"), _.cast("double")).as("qv"))

    def timed(f: => Array[Long]): (Double, Array[Long]) = {
      f // warm
      val runs = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        val ids = f
        ((System.nanoTime() - t0) / 1e9, ids)
      }
      runs.sortBy(_._1)(Ordering.Double.TotalOrdering).apply(1)
    }

    def topIds(df: DataFrame, scoreCol: String): Array[Long] =
      df.orderBy(desc(scoreCol), asc("vec_id")).limit(10)
        .select("vec_id").collect().map(_.getLong(0))

    val (tF32, exact) = timed {
      topIds(spark.read.parquet(f32Dir)
        .crossJoin(broadcast(qvF))
        .select(col("vec_id"),
          round(expr("cosine_sim(embedding, qv)"), 4).as("cs")), "cs")
    }
    val (tI8, approx) = timed {
      topIds(spark.read.parquet(i8Dir)
        .withColumn("recon", Similarity.dequantizeInt8("codes", "scale"))
        .crossJoin(broadcast(qvD))
        .select(col("vec_id"),
          round(expr("cosine_sim(recon, qv)"), 4).as("cs")), "cs")
    }
    // codes-direct: for cosine the per-vector scale cancels exactly, so
    // raw int8 codes rank identically to the reconstruction — no
    // dequantize pass at all (the r7 mixed-type kernel reads bytes)
    val (tCodes, direct) = timed {
      topIds(spark.read.parquet(i8Dir)
        .crossJoin(broadcast(qvD))
        .select(col("vec_id"),
          round(expr("cosine_sim(codes, qv)"), 4).as("cs")), "cs")
    }
    val recall = exact.count(approx.contains) / 10.0
    val recallD = exact.count(direct.contains) / 10.0

    println(f"rows=${base.count() * rep} rep=$rep " +
      f"f32_bytes=$f32Bytes i8_bytes=$i8Bytes " +
      f"ratio=${f32Bytes.toDouble / i8Bytes}%.2f " +
      f"t_f32=$tF32%.3f t_recon=$tI8%.3f t_codes=$tCodes%.3f " +
      f"recall_recon=$recall%.2f recall_codes=$recallD%.2f")
    spark.stop()
  }
}
