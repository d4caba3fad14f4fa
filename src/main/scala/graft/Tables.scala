package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Single source of truth for loading the test tables.
  *
  * Every query in [[SparkEntry.queries]] and every ScalaTest spec goes
  * through this loader so that Spark and the DuckDB oracle see byte-identical
  * values — in particular for `events.ts`, which is physically
  * parquet TIMESTAMP(NANOS) and must be truncated to microseconds exactly the
  * way DuckDB 1.0.0 does natively (see FIXTURES.md).
  *
  * Scale note (100 TB): this loader reads plain directories of parquet. At
  * cluster scale the same call sites work unchanged against a partitioned
  * layout (e.g. `events/date=.../hour=...`) — Spark's file index + dynamic
  * partition pruning handle pruning; nothing here assumes single files.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Read one table, normalizing `events.ts` to session-zoned TIMESTAMP.
    *
    * The driver has shipped `events.ts` in two physical forms across
    * rounds: INT64 TIMESTAMP(NANOS) (reads as bigint under nanosAsLong;
    * truncate to micros with INTEGER division — a double division would
    * exceed 2^53 for 2024-era nanos and be off by 1µs on ~12% of rows vs
    * DuckDB's truncating read) and plain TIMESTAMP(MICROS) (reads as
    * TIMESTAMP_NTZ; reinterpret the wall clock in the UTC session zone,
    * which is exactly DuckDB's naive read). Dispatch on the arrived type
    * so either vintage of testdata works unchanged.
    */
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    tables.getOrElseUpdate((spark, sfDir, name), {
      // drop entries for STOPPED sessions only, so the memo can't pin dead
      // sessions (and their state) forever. r15 fix (ADVICE r14 #1): the
      // r14 predicate `(s ne spark) && !stopped` also evicted every LIVE
      // entry of the CURRENT session on each miss — the memo degenerated
      // to one table per session and multi-table queries got zero
      // cross-table hits. Keep all current-session entries (the key
      // already includes dir and name, so they never conflict); `load`'s
      // sibling predicate is different ON PURPOSE (dir invalidation of
      // the session-global temp-view namespace).
      tables.filterInPlace { case ((s, _, _), _) =>
        (s eq spark) || !s.sparkContext.isStopped }
      build(spark, sfDir, name)
    })

  /** Uncached build (r14 optimization round): `spark.read.parquet` costs
    * ~70–90 ms of driver work per call (DataSource resolution, file
    * listing, footer schema read) — measured via tools.OptProbe phase
    * split: q_join_6way spent 0.55 s of its 1.34 s median just re-deriving
    * its 6 table frames per run. The memo above hands every invocation the
    * SAME logical plan, so that work is paid once per (session, dir,
    * table). This caches driver-side METADATA only (guide §6 file-listing
    * caching, §7.3 driver work): executions still scan the parquet bytes —
    * no data or results are persisted. */
  private def build(spark: SparkSession, sfDir: String, name: String)
      : DataFrame = {
    // Verify/Bench create the session without this conf; runtime-set works
    // (verified in SURVEY §7.1 M0). Harmless to set repeatedly, and inert
    // when the file is not NANOS-typed.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$sfDir/$name.parquet")
    if (name == "events")
      df.schema("ts").dataType match {
        case org.apache.spark.sql.types.LongType =>
          df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
        case org.apache.spark.sql.types.TimestampType => df
        case _ => // TIMESTAMP_NTZ: NTZ→TZ cast reads the wall clock in the
          // session zone (UTC), matching DuckDB's naive timestamp read.
          df.withColumn("ts", col("ts").cast("timestamp"))
      }
    else df
  }

  private val tables =
    scala.collection.concurrent.TrieMap
      .empty[(SparkSession, String, String), DataFrame]

  /** Conditional scan fan-out (r14 optimization round; guide §2.5's
    * "one huge unsplittable file → repartition immediately after the
    * read"). The fixture tables arrive as ONE parquet file with ONE row
    * group, so every scan stage runs as a single task regardless of
    * `maxPartitionBytes` — measured via the OptProbe stage listener: the
    * gram+md5 map stage of the text keys spent 0.5–0.9 s on one core
    * with 31 idle. When (and only when) the scan yields fewer partitions
    * than the session's shuffle parallelism, hash-repartition on the
    * row-identity column: the heavy map work then engages every core,
    * and every downstream per-`key` aggregation/window REUSES the
    * partitioning (hashpartitioning(key) satisfies their clustering), so
    * the net exchange count does not grow — the exchange moves BEFORE
    * the expensive map and carries the (smaller) raw rows instead of the
    * exploded gram stream. At cluster scale the file count already
    * provides parallelism, the condition is false, and this is the
    * identity — no shuffle is added. Results are partition-count
    * independent (re-verified at CPUS=2/32 per VERIFICATION.md). */
  def fanout(df: DataFrame, key: String): DataFrame = {
    if (df.isStreaming) df // streaming Datasets reject .rdd; scan
    // partitioning is the source's business there (ADVICE r14 #5)
    else {
      // r15 (ADVICE r14 #5): `df.rdd.getNumPartitions` instantiates the
      // full physical plan per call — exactly the per-build driver
      // overhead the table memo eliminates elsewhere. The scan partition
      // count is a property of the scanned files, so memoize it per
      // (session, canonicalized plan); entries for stopped sessions are
      // dropped on each miss, same hygiene as the table memo.
      val spark = df.sparkSession
      val n = scanParts.getOrElseUpdate(
        (spark, df.queryExecution.analyzed.canonicalized), {
          scanParts.filterInPlace { case ((s, _), _) =>
            (s eq spark) || !s.sparkContext.isStopped }
          df.rdd.getNumPartitions
        })
      if (n >= spark.sessionState.conf.numShufflePartitions) df
      // r15: EXPLICIT partition count. The r14 `repartition(col(key))`
      // left the count to AQE, and AQE's parallelism-first coalescing
      // (minPartitionSize 1 MB) merged the sub-MB fixture shuffle back
      // to ONE partition at runtime — the heavy gram/md5 map stage that
      // fanout exists to parallelize ran single-task after all
      // (verified with the OptProbe stage listener: 830 KB shuffle →
      // tasks=1). A user-specified numPartitions is exempt from
      // coalescing, so the map stage genuinely engages every core. The
      // byte-proportional coalescing stays right for every OTHER
      // exchange — this one is special because its downstream work is
      // CPU-heavy per byte, which AQE cannot know.
      else df.repartition(
        spark.sessionState.conf.numShufflePartitions, col(key))
    }
  }

  private val scanParts =
    scala.collection.concurrent.TrieMap.empty[
      (SparkSession, org.apache.spark.sql.catalyst.plans.logical
        .LogicalPlan), Int]

  /** Load all tables and register each as a temp view (for SQL-surface use).
    *
    * Memoized per (session, dir): SQL-surface queries call this on every
    * invocation, and re-deriving 10 parquet schemas costs ~0.5 s per call.
    * The registration is idempotent — the cache only skips redundant
    * catalog writes, never changes what a view resolves to (last dir wins,
    * exactly as with un-memoized createOrReplaceTempView).
    */
  def load(spark: SparkSession, sfDir: String): Map[String, DataFrame] = {
    val key = (spark, sfDir)
    registered.get(key) match {
      // a cache hit is only honored if every view is still registered —
      // a caller dropping a temp view must not leave later SQL-surface
      // queries resolving against nothing (or a half-stale catalog)
      case Some(m) if names.forall(spark.catalog.tableExists) => m
      case _ =>
        val m = names.map { n =>
          val df = table(spark, sfDir, n)
          df.createOrReplaceTempView(n)
          n -> df
        }.toMap
        // a different dir on the same session invalidates other entries;
        // entries for stopped sessions are dropped so the map can't pin
        // dead sessions (and their state) forever
        registered.filterInPlace { case ((s, _), _) =>
          (s ne spark) && !s.sparkContext.isStopped }
        registered.put(key, m)
        m
    }
  }

  private val registered =
    scala.collection.concurrent.TrieMap
      .empty[(SparkSession, String), Map[String, DataFrame]]
}
