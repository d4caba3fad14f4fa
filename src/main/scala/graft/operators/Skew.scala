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
    // deterministic spread: hash the left row, not rand() — retried and
    // speculative tasks must place a row identically. Map-typed columns
    // are excluded (hash() rejects MapType — unordered entries have no
    // canonical hash); byte-identical duplicate rows therefore share a
    // salt, which is acceptable: identical-row floods are a dedup
    // problem, not a join-skew one.
    def mapFree(dt: org.apache.spark.sql.types.DataType): Boolean = dt match {
      case _: org.apache.spark.sql.types.MapType => false
      case s: org.apache.spark.sql.types.StructType =>
        s.fields.forall(f => mapFree(f.dataType))
      case a: org.apache.spark.sql.types.ArrayType => mapFree(a.elementType)
      case _ => true
    }
    val hashable = left.schema.fields
      .filter(f => mapFree(f.dataType)).map(f => col(f.name))
    require(hashable.nonEmpty,
      "saltedEquiJoin needs at least one non-map column to derive the salt")
    val l = left.withColumn("__salt",
      pmod(hash(hashable.toIndexedSeq: _*), lit(salt)))
    val salts = right.sparkSession.range(salt)
      .select(col("id").cast("int").as("__salt"))
    // rename the right key before joining: when `right` derives from
    // `left` (dim-from-fact self-joins), `l(key) === r(key)` resolves both
    // sides to the SAME attribute id and Spark falls back to a trivially-
    // true predicate warning + positional disambiguation; a distinct name
    // makes the condition reference distinct attributes by construction
    val rKey = "__rkey"
    require(!right.columns.contains(rKey) && !left.columns.contains(rKey),
      s"saltedEquiJoin reserves scratch column $rKey")
    // the salts side is always exactly `salt` rows — broadcast explicitly
    // so the replication never shuffles `right`, whatever its size
    val r = right.withColumnRenamed(key, rKey).crossJoin(broadcast(salts))
    l.join(r, l(key) === r(rKey) && l("__salt") === r("__salt"))
      .drop(rKey).drop("__salt")
  }
}
