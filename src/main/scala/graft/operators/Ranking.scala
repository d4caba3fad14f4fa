package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed exact global ranking — rank/ntile over a TOTAL order
  * without the single-partition `Window.orderBy(...)` a naive
  * formulation plans (which routes every row through ONE task and is
  * the canonical 100 TB scale-killer).
  *
  * Shape: `repartitionByRange` on the order key gives contiguous,
  * ascending ranges per partition (partition 0 holds the first keys in
  * the requested order); a partition-local sort makes the physical row
  * order the global order within each range. `monotonically_increasing_id`
  * then encodes (partitionId, local row index) for free — map-side, no
  * window. The per-partition counts fold into ONE broadcast row (at most
  * `parts` scalars — the same bounded traffic zipWithIndex and MLlib
  * KMeans accept) whose offset array is built with array higher-order
  * functions, and global rank = offsets(pid) + localIdx + 1, evaluated
  * map-side against the broadcast row. Total cost: ONE range exchange +
  * one `parts`-row aggregate — vs the unpartitioned window's full sort
  * into a single task.
  *
  * Laziness (r10, ADVICE): the offsets live INSIDE the returned plan as
  * a broadcast subtree — building the DataFrame runs NO Spark jobs (the
  * r9 form collected the counts at construction time, so merely building
  * q_rfm's plan executed three range shuffles). The ranged frame is
  * persisted (graft.Caching) so the count subtree and the output rows
  * observe the SAME physical layout on first action; the offsets
  * computation itself stays window-free (an unpartitioned window over
  * the tiny count frame would trip the repo-wide no-global-Window pin).
  *
  * Determinism: callers must pass a STRICT total order (tie-break on a
  * unique key) so ranks are unique and engine-independent.
  */
object Ranking {

  /** Shared core: the range-partitioned, locally-sorted, persisted frame
    * plus the map-side global-rank column. Scratch columns `__mid`,
    * `__offs`, `__n` remain for the caller to consume and drop. */
  private def withRankCol(df: DataFrame, order: Seq[Column])
      : (DataFrame, Column) = {
    for (c <- Seq("__mid", "__offs", "__n"))
      require(!df.columns.contains(c),
        s"input column '$c' collides with a reserved scratch column " +
          "of Ranking — rename it first")
    val spark = df.sparkSession
    val parts = spark.sessionState.conf.numShufflePartitions
    // graft.Caching (not a bare persist): Verify/Bench release tracked
    // entries between queries, and a re-build of the same plan composes
    // against the live cache entry instead of re-persisting. persist is
    // lazy — nothing executes here.
    val ranged = graft.Caching.cache(df
      .repartitionByRange(parts, order: _*)
      .sortWithinPartitions(order: _*)
      .withColumn("__mid", monotonically_increasing_id()))
    // mid = (partitionId << 33) | localIdx, localIdx in physical order —
    // which IS the global order inside each contiguous range.
    val pid = shiftright(col("__mid"), 33).cast("int")
    val localIdx = col("__mid").bitwiseAND(lit((1L << 33) - 1))
    // One broadcast row: sorted (pid, count) pairs → prefix-sum offsets
    // (array `aggregate`, O(parts²) on ≤ parts scalars — driver-bounded
    // constants, not data) + the total row count.
    val one = ranged
      .groupBy(pid.as("__p")).agg(count(lit(1)).as("__c"))
      .agg(sort_array(collect_list(struct(col("__p"), col("__c"))))
        .as("__pc"))
      .select(
        expr(s"transform(sequence(0, ${parts - 1}), " +
          "i -> aggregate(filter(__pc, x -> x.__p < i), 0L, " +
          "(a, x) -> a + x.__c))").as("__offs"),
        expr("aggregate(__pc, 0L, (a, x) -> a + x.__c)").as("__n"))
    val withOff = ranged.crossJoin(broadcast(one))
    (withOff, element_at(col("__offs"), pid + 1) + localIdx + lit(1L))
  }

  /** Adds `out` = the exact 1-based global `row_number()` (LongType)
    * over the given strict total order — no window anywhere. Pure plan
    * builder; no jobs run until the caller's first action. */
  def withGlobalRank(df: DataFrame, out: String, order: Column*)
      : DataFrame = {
    val (f, rank) = withRankCol(df, order)
    f.withColumn(out, rank).drop("__mid", "__offs", "__n")
  }

  /** Adds `out` = exact SQL `ntile(buckets)` over the given total order
    * (first `n % buckets` tiles get the extra row, per the standard),
    * computed without any unpartitioned window. Returns the input
    * columns + `out` (IntegerType, 1-based tile). Pure plan builder —
    * no jobs run until the caller's first action.
    */
  def withGlobalNtile(df: DataFrame, buckets: Int, out: String,
      order: Column*): DataFrame = {
    require(buckets > 0, "ntile bucket count must be positive")
    val (f, rank) = withRankCol(df, order)
    // ntile(b) over n rows: first rem = n % b tiles hold size + 1 rows.
    val size = expr(s"__n div ${buckets}L")
    val rem = expr(s"__n % ${buckets}L")
    val cut = (size + lit(1L)) * rem // ranks 1..cut → the first rem tiles
    val bigDiv = size + lit(1L)
    val smallDiv = greatest(size, lit(1L)) // otherwise-branch unreachable at size=0
    val tile = when(rank <= cut, (rank + size) / bigDiv)
      .otherwise(rem + (rank - cut + (smallDiv - lit(1L))) / smallDiv)
    f.withColumn(out, tile.cast("int"))
      .drop("__mid", "__offs", "__n")
  }
}
