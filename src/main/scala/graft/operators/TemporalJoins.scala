package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal join operators (SURVEY §2.3 J7/J8) — the CEP staples the
  * reference expresses through windowed stream joins, generalized to any
  * keyed, timestamped DataFrames.
  *
  * Both operators are pure plan builders: one equi-shuffle on the key
  * (plus the time predicate evaluated inside the join), then — for as-of —
  * a per-left-row top-1. At 100 TB both sides shuffle once on the key;
  * no broadcast of the big side, no driver materialization. For highly
  * skewed keys enable AQE skew-join splitting; for repeated as-of joins
  * against the same right side, bucket both tables on the key.
  */
object TemporalJoins {
  /** Interval join: rows of `right` within (leftTs, leftTs + interval]
    * of a matching-key `left` row. Column names must be disjoint except
    * for the join key columns given in `key`. */
  def intervalJoin(left: DataFrame, right: DataFrame, key: Seq[String],
      leftTs: String, rightTs: String, interval: String): DataFrame = {
    val cond = key.map(k => left(k) === right(k)).reduce(_ && _) &&
      right(rightTs) > left(leftTs) &&
      right(rightTs) <= left(leftTs) + expr(s"INTERVAL $interval")
    left.join(right, cond)
  }

  /** As-of (backward) join: for each `left` row, the single latest `right`
    * row with rightTs <= leftTs on the same key; unmatched left rows are
    * kept with nulls (LEFT ASOF semantics). `leftId` must be a unique
    * left-row identifier; ties on rightTs break by descending `rightId`.
    */
  def asofJoinBackward(left: DataFrame, right: DataFrame, key: Seq[String],
      leftId: String, leftTs: String, rightTs: String, rightId: String)
      : DataFrame = {
    val cond = key.map(k => left(k) === right(k)).reduce(_ && _) &&
      right(rightTs) <= left(leftTs)
    val w = Window.partitionBy(leftId)
      .orderBy(desc(rightTs), desc(rightId))
    val matched = left.select((leftId +: key :+ leftTs).distinct.map(col): _*)
      .join(right, cond)
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
      .drop(key: _*)
      .withColumnRenamed(leftId, s"__$leftId")
      .drop(leftTs)
    left.join(matched, left(leftId) === matched(s"__$leftId"), "left")
      .drop(s"__$leftId")
  }
}
