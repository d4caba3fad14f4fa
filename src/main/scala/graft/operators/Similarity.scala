package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions

/** Similarity-search operators over embedding columns (SURVEY §2.10 L3).
  *
  * All scoring goes through the codegen'd [[graft.functions.CosineSimilarity]]
  * expression. Plan shapes and their 100 TB behavior:
  *
  *  - [[topK]]: broadcast the (tiny) query side, scan candidates once,
  *    TakeOrderedAndProject — no shuffle of the candidate table at all;
  *    scales linearly with executors.
  *  - [[nearDupPairs]]: candidate pairs only within a blocking key
  *    (label, LSH bucket, shard) — the blocked equi-join shuffles each
  *    side once on the block key; never all-pairs.
  *  - [[ivfTopK]]: two-stage ANN — pick the best coarse cell by centroid
  *    similarity (tiny), then exact search only inside that cell
  *    (partition-prunable when the table is partitioned by the cell key).
  */
object Similarity {
  private def cs(a: String, b: String) = expr(s"cosine_sim($a, $b)")

  /** Exact top-k rows most similar to the vector of `queryId`. */
  def topK(spark: SparkSession, emb: DataFrame, idCol: String,
      vecCol: String, queryId: Long, k: Int): DataFrame = {
    GraftFunctions.register(spark)
    val q = emb.filter(col(idCol) === queryId)
      .select(col(vecCol).as("__qv"))
    emb.filter(col(idCol) =!= queryId)
      .crossJoin(broadcast(q))
      .select(col(idCol), cs(vecCol, "__qv").as("similarity"))
      .orderBy(desc("similarity"), asc(idCol))
      .limit(k)
  }

  /** All pairs above `threshold` within each blocking-key group. */
  def nearDupPairs(spark: SparkSession, emb: DataFrame, idCol: String,
      vecCol: String, blockCol: String, threshold: Double): DataFrame = {
    GraftFunctions.register(spark)
    val a = emb.select(col(idCol).as("id_a"), col(blockCol).as("__blk"),
      col(vecCol).as("__va"))
    val b = emb.select(col(idCol).as("id_b"), col(blockCol).as("__blk2"),
      col(vecCol).as("__vb"))
    a.join(b, col("__blk") === col("__blk2") && col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), cs("__va", "__vb").as("similarity"))
      .filter(col("similarity") >= threshold)
  }

  /** IVF-style two-stage ANN: probe the single best cell (by centroid
    * cosine), exact top-k within it. `cellCol` is the coarse-quantizer
    * assignment (k-means cell, or any deterministic proxy). */
  def ivfTopK(spark: SparkSession, emb: DataFrame, idCol: String,
      vecCol: String, cellCol: String, queryId: Long, k: Int): DataFrame = {
    GraftFunctions.register(spark)
    val asD = emb.select(col(idCol), col(cellCol),
      transform(col(vecCol), _.cast("double")).as("__v"))
    val cents = asD
      .select(col(cellCol), posexplode(col("__v")).as(Seq("__p", "__x")))
      .groupBy(cellCol, "__p").agg(avg("__x").as("__cx"))
      .groupBy(cellCol)
      .agg(transform(array_sort(collect_list(struct(col("__p"), col("__cx")))),
        s => s.getField("__cx")).as("__cv"))
    val q = asD.filter(col(idCol) === queryId).select(col("__v").as("__qv"))
    val best = cents.crossJoin(broadcast(q))
      .select(col(cellCol), cs("__cv", "__qv").as("__ccs"))
      .orderBy(desc("__ccs"), asc(cellCol))
      .limit(1).select(col(cellCol).as("__best"))
    asD.filter(col(idCol) =!= queryId)
      .join(broadcast(best), col(cellCol) === col("__best"))
      .crossJoin(broadcast(q))
      .select(col(idCol), cs("__v", "__qv").as("similarity"))
      .orderBy(desc("similarity"), asc(idCol))
      .limit(k)
  }
}
