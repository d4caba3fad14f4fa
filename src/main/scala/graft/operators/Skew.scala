package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities (SURVEY §7.6). AQE's skew-join splitting
  * handles most cases at runtime; explicit salting remains the tool when a
  * single key dominates so heavily that even split partitions overwhelm a
  * task (the classic hot-user/hot-null problem at 100 TB).
  */
object Skew {
  /** Salted inner equi-join: the (large, skewed) `left` side is salted
    * deterministically; the smaller `right` side is replicated `salt`
    * ways so every salted key finds its match. Result equals the plain
    * join (asserted in ScalaTest); cost: `right` grows ×salt — use for
    * moderate-size right sides that AQE cannot split effectively.
    */
  def saltedEquiJoin(left: DataFrame, right: DataFrame, key: String,
      salt: Int): DataFrame = {
    require(salt > 1, "salt must be > 1")
    // deterministic spread: hash the whole left row, not rand() —
    // retried and speculative tasks must place a row identically
    val l = left.withColumn("__salt",
      pmod(hash(left.columns.map(col): _*), lit(salt)))
    val salts = right.sparkSession.range(salt)
      .select(col("id").cast("int").as("__salt"))
    val r = right.crossJoin(salts)
    l.join(r, l(key) === r(key) && l("__salt") === r("__salt"))
      .drop(r(key)).drop("__salt")
  }
}
