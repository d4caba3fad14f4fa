package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Table-layout verbs for the 100 TB posture (SCALE.md's two physical
  * claims, as library surface instead of recipes):
  *
  *  - CO-BUCKETED facts: two tables bucketed+sorted on the same join key
  *    equi-join with ZERO exchanges — the shuffle is paid once at write
  *    time and amortized over every subsequent join. This is what removes
  *    the orders⋈lineitem exchange at scale (ScaleClaimsSpec pins the
  *    plan: no hashpartitioning on either key).
  *  - DATE-PARTITIONED events: time predicates prune to the touched
  *    partitions at PLANNING time — a day's query reads a day's files
  *    (ScaleClaimsSpec pins PartitionFilters + numFiles).
  *
  * Both write through the catalog/parquet APIs Spark already has; the
  * value here is the documented, tested convention.
  */
object Layout {
  /** Write `df` bucketed+sorted on `key` as catalog table `table` at
    * `path`. Join two tables written with the SAME bucket count and key
    * and neither side shuffles. */
  def writeBucketed(df: DataFrame, table: String, path: String,
      key: String, buckets: Int = 8): Unit = {
    require(buckets > 0, "buckets must be positive")
    df.write.mode("overwrite").bucketBy(buckets, key).sortBy(key)
      .option("path", path).saveAsTable(table)
  }

  /** Write `df` partitioned by the DATE of `tsCol` at `path` — the
    * event-data layout whose time filters prune at planning time. */
  def writeDatePartitioned(df: DataFrame, path: String,
      tsCol: String = "ts"): Unit = {
    require(!df.columns.contains("date"),
      "the frame already has a 'date' column — the layout derives its " +
        "partition column from " + tsCol + " and would silently replace " +
        "yours; rename it first")
    df.withColumn("date", to_date(col(tsCol)))
      .write.mode("overwrite").partitionBy("date").parquet(path)
  }

  /** Read a [[writeDatePartitioned]] layout; filter on `date` to prune. */
  def readDatePartitioned(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)
}
