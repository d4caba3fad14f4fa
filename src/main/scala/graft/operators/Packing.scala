package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Greedy sequence packing — the training-data prep step that fills
  * fixed-capacity context windows with whole documents (first-fit in a
  * deterministic document order), so a downstream tokenizer emits dense
  * batches instead of one padded sequence per short doc.
  *
  * Semantics (deterministic, exact): within each group (the pack shard),
  * documents are visited in ascending `orderCol`; a running bin keeps its
  * fill, and a document that would push the fill past `capacity` closes
  * the bin and opens the next (bins number from 1 per group). A document
  * larger than `capacity` therefore sits alone in its own bin — packing
  * never splits a document (splitting is the tokenizer's job downstream;
  * the operator's contract is whole-doc placement).
  *
  * Scale shape: ONE shuffle (`repartition` on the group columns) followed
  * by a partition-local sort and a LINEAR scan with O(1) state — the
  * current group key, bin ordinal, and fill. Nothing is buffered: unlike
  * a groupByKey/mapGroups formulation, a group never has to fit in
  * memory, and unlike a window-function formulation the non-associative
  * reset-on-overflow scan is expressed directly instead of via a
  * self-join or recursion. Packing is embarrassingly parallel across
  * groups by construction — real pipelines shard the corpus (e.g.
  * lang × hash-bucket) exactly so this per-shard scan distributes, which
  * is why the group columns are the caller's contract, not a default.
  */
object Packing {
  /** @param df        input frame; `tokensCol` must be LongType.
    * @param groupCols pack-shard columns (each shard packs independently).
    * @param orderCol  deterministic visit order within a shard.
    * @param tokensCol per-document token count (long).
    * @param capacity  bin capacity in tokens (> 0).
    * @return input columns + `bin_id` (1-based per-shard bin ordinal).
    */
  def packGreedy(df: DataFrame, groupCols: Seq[String], orderCol: String,
      tokensCol: String, capacity: Long): DataFrame = {
    require(capacity > 0, s"capacity must be positive (got $capacity)")
    require(groupCols.nonEmpty, "packing needs at least one shard column")
    val tIdx = df.schema.fieldIndex(tokensCol)
    require(df.schema(tIdx).dataType == LongType,
      s"$tokensCol must be LongType (got ${df.schema(tIdx).dataType})")
    val gIdx = groupCols.map(df.schema.fieldIndex)
    val sorted = df.repartition(groupCols.map(col): _*)
      .sortWithinPartitions((groupCols :+ orderCol).map(col): _*)
    val enc = Encoders.row(df.schema.add("bin_id", LongType,
      nullable = false))
    sorted.mapPartitions { it =>
      // O(1) scan state; groups never span partitions (hash repartition
      // on the full group key), so a key change is always a group start.
      var key: Seq[Any] = null
      var bin = 0L
      var fill = 0L
      it.map { r =>
        val k = gIdx.map(r.get)
        val n = r.getLong(tIdx)
        if (key == null || k != key) { key = k; bin = 1L; fill = n }
        else if (fill + n > capacity) { bin += 1L; fill = n }
        else fill += n
        Row.fromSeq(r.toSeq :+ bin)
      }
    }(enc)
  }
}
