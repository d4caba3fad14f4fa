package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The reference's signature optimization — incremental sliding-window
  * aggregation via per-slide panes ("add the new pane, retire the expired
  * pane", SURVEY §0.1.2 [R]) — expressed relationally as a first-class
  * operator.
  *
  * `window(ts, w, s)` assigns every ROW to w/s windows: the expand factor
  * multiplies the SCAN. [[slidingViaPanes]] instead aggregates rows once
  * into w/s-minute panes and replicates only the PANE PARTIALS (a few
  * thousand rows) into the windows that contain them, merging partials —
  * at 100 TB this turns "shuffle w/s × the fact table" into "shuffle the
  * fact table once + a trivial pane merge", the same asymptotics the
  * reference bought with Redis pane state.
  *
  * Correctness rests on the merge algebra (count/sum/min/max are
  * commutative monoids over panes) — pinned by `PaneMergeSpec` on random
  * data and by `PanesSpec` against `window()` on the events table.
  * (avg = merged sum / merged count; distinct-style aggregates are NOT
  * pane-mergeable — use sketches.)
  */
object Panes {
  /** Sliding count/sum/min/max via tumbling-pane pre-aggregation.
    *
    * @param aggs (columnName, fn) with fn ∈ count|sum|min|max; output
    *             column is named `fn_columnName` (count → `cnt`).
    * @return one row per (ws [+ keys]) with the merged aggregates —
    *         identical to grouping by `window(ts, window, slide)`.
    */
  def slidingViaPanes(df: DataFrame, tsCol: String, window_ : String,
      slide: String, aggs: Seq[(String, String)], keys: Seq[String] = Nil)
      : DataFrame = {
    val panes = (parseDuration(window_) / parseDuration(slide)).toInt
    require(panes.toLong * parseDuration(slide) == parseDuration(window_),
      s"slide must divide window ($window_ / $slide)")

    def partial(c: (String, String)): Column = c._2 match {
      case "count" => count(lit(1)).as("cnt")
      case "sum" => sum(c._1).as(s"sum_${c._1}")
      case "min" => min(c._1).as(s"min_${c._1}")
      case "max" => max(c._1).as(s"max_${c._1}")
      case other => throw new IllegalArgumentException(
        s"'$other' is not pane-mergeable (count|sum|min|max)")
    }
    def name(c: (String, String)): String =
      if (c._2 == "count") "cnt" else s"${c._2}_${c._1}"
    def merge(c: (String, String)): Column = c._2 match {
      case "count" => sum("cnt").as("cnt")
      case "sum" => sum(name(c)).as(name(c))
      case "min" => min(name(c)).as(name(c))
      case "max" => max(name(c)).as(name(c))
    }

    paneExpand(df, tsCol, slide, panes, keys,
      aggs.map(partial), aggs.map(name), aggs.map(merge))
  }

  /** The shared pane-expansion skeleton both sliding operators ride:
    * aggregate once per tumbling pane (`partialAggs`), replicate each
    * pane row into the `panes` windows containing it (carrying
    * `carryCols`), merge per window (`mergeAggs`). Any fix to the
    * pane/window alignment lives HERE once. */
  private def paneExpand(df: DataFrame, tsCol: String, slide: String,
      panes: Int, keys: Seq[String], partialAggs: Seq[Column],
      carryCols: Seq[String], mergeAggs: Seq[Column]): DataFrame = {
    val paneAgg = df
      .groupBy((window(col(tsCol), slide).getField("start").as("ps") +:
        keys.map(col)): _*)
      .agg(partialAggs.head, partialAggs.tail: _*)
    paneAgg
      .select((col("*") +: Seq(
        explode(sequence(lit(0), lit(panes - 1))).as("k"))): _*)
      .select((col("ps") - col("k") * expr(s"INTERVAL $slide")).as("ws") +:
        (keys.map(col) ++ carryCols.map(col)): _*)
      .groupBy(("ws" +: keys).map(col): _*)
      .agg(mergeAggs.head, mergeAggs.tail: _*)
  }

  /** Sliding-window DISTINCT counting via mergeable HLL pane sketches —
    * the case the plain pane algebra can't do (the scaladoc's "use
    * sketches"; the hard half of the reference's incremental-agg story).
    * Each tumbling pane aggregates once into a DataSketches HLL state
    * (`hll_sketch_agg`); each sliding window unions its panes' sketches
    * (`hll_union_agg` — register-wise max, the same merge a 1000-executor
    * partial agg does) and estimates. The fact table is scanned and
    * shuffled ONCE; only pane-sized sketch blobs replicate into windows.
    * Estimates carry HLL error (~1.6% at default lgK 12) — PanesSpec pins
    * them within 5% of exact and within 1% of the direct
    * `window()`-expand sketch. */
  def slidingDistinctViaPanes(df: DataFrame, tsCol: String, window_ : String,
      slide: String, distinctCol: String, keys: Seq[String] = Nil)
      : DataFrame =
    mergeDistinctPanes(
      distinctPaneSketches(df, tsCol, slide, distinctCol, keys),
      window_, slide, distinctCol, keys)

  /** The PANE half of [[slidingDistinctViaPanes]], exposed separately
    * because it is the STREAMING-maintainable piece (r7): one HLL sketch
    * per tumbling pane [+ keys], via `hll_sketch_agg`. On a batch frame
    * it is a plain aggregation; on a STREAMING frame it is a standard
    * streaming aggregation whose state is the per-pane sketch —
    * continuously updated registers, exactly the reference's Redis pane
    * state re-expressed as Structured Streaming agg state. Maintain it
    * with a complete-mode memory sink (small pane table) or a
    * foreachBatch upsert into a keyed store at scale; serve sliding
    * windows by running [[mergeDistinctPanes]] over the pane table —
    * StreamingTwinSpec pins replay ≡ batch. */
  def distinctPaneSketches(df: DataFrame, tsCol: String, slide: String,
      distinctCol: String, keys: Seq[String] = Nil): DataFrame =
    df.groupBy((window(col(tsCol), slide).getField("start").as("ps") +:
        keys.map(col)): _*)
      .agg(expr(s"hll_sketch_agg($distinctCol)").as("__sk"))

  /** The MERGE half of [[slidingDistinctViaPanes]]: replicate each pane
    * sketch into the w/s windows containing it and union per window
    * (`hll_union_agg` — register-wise max, order-insensitive, so
    * streaming-built and batch-built pane sketches merge identically).
    * Input must be a [[distinctPaneSketches]] frame (`ps`, keys,
    * `__sk`). */
  def mergeDistinctPanes(paneRows: DataFrame, window_ : String,
      slide: String, distinctCol: String, keys: Seq[String] = Nil)
      : DataFrame = {
    val panes = (parseDuration(window_) / parseDuration(slide)).toInt
    require(panes.toLong * parseDuration(slide) == parseDuration(window_),
      s"slide must divide window ($window_ / $slide)")
    paneRows
      .select((col("*") +: Seq(
        explode(sequence(lit(0), lit(panes - 1))).as("k"))): _*)
      .select((col("ps") - col("k") * expr(s"INTERVAL $slide")).as("ws") +:
        (keys.map(col) :+ col("__sk")): _*)
      .groupBy(("ws" +: keys).map(col): _*)
      .agg(expr("hll_sketch_estimate(hll_union_agg(__sk))")
        .as(s"approx_distinct_$distinctCol"))
  }

  /** Duration string → microseconds (delegates to Catalyst's parser). */
  private def parseDuration(d: String): Long = {
    val iv = org.apache.spark.sql.catalyst.util.IntervalUtils
      .stringToInterval(org.apache.spark.unsafe.types.UTF8String.fromString(d))
    require(iv.months == 0, "month-based windows are not fixed-length")
    iv.days * 86400000000L + iv.microseconds
  }
}
