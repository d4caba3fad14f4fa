package graft.tools

import org.apache.spark.sql.SparkSession

/** r9 drift isolation for `q_topk` (verdict r8 §next-3): the in-suite
  * number moved 0.161 s (r7) → 0.214 s (r8) with no code change. This
  * probe measures the key ALONE in a fresh JVM at the bench config,
  * with enough warm-up to reach JIT/page-cache steady state, and prints
  * every run + min/median — plus a 1-key-sort variant to separate the
  * declared 3-key-determinism cost from drift.
  *
  * r10: the harness also measures `q_window_tumbling` (the r9 headline
  * drifted 0.147 → 0.168 s with no code change) and the
  * `q_agg_groupby` anchor in the SAME fresh JVM, so any future
  * headline drift has a same-run reference — anchor-normalized ratios
  * are the cross-session currency (SCALE.md discipline).
  *
  * r11 (verdict #2): `q_window_sliding` (0.198 → 0.366 s r9→r10, the
  * board's largest unexplained drift, no code change) and `q_semdedup`
  * (0.936 → 1.462 s; the r10 adaptive-cap change reproduces r9 fixture
  * behavior bit-for-bit, so the delta should be ambient) join the same
  * fresh-JVM run. Cached intermediates are released after every
  * timed run so each measurement pays the key's full cost, exactly as
  * Bench does.
  */
object TopkProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.functions._
    def threeKey() = graft.SparkEntry.queries("q_topk")(spark, sfDir)
    def oneKey() = graft.Tables.table(spark, sfDir, "lineitem")
      .select("l_orderkey", "l_linenumber", "l_extendedprice")
      .orderBy(desc("l_extendedprice")).offset(10).limit(100)
    def time(f: () => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime(); f().count()
      val t = (System.nanoTime() - t0) / 1e9
      graft.Caching.releaseAll() // pay the full key cost every run
      t
    }
    def tumbling() = graft.SparkEntry.queries("q_window_tumbling")(
      spark, sfDir)
    def anchor() = graft.SparkEntry.queries("q_agg_groupby")(spark, sfDir)
    def sliding() = graft.SparkEntry.queries("q_window_sliding")(
      spark, sfDir)
    def semdedup() = graft.SparkEntry.queries("q_semdedup")(spark, sfDir)
    for ((name, f) <- Seq(("3key", threeKey _), ("1key", oneKey _),
        ("tumbling", tumbling _), ("anchor", anchor _),
        ("sliding", sliding _), ("semdedup", semdedup _))) {
      (1 to 8).foreach { _ => f().count(); graft.Caching.releaseAll() }
      val runs = (1 to 5).map(_ => time(f))
      val s = runs.sorted
      println(f"$name: runs=${runs.map(r => f"$r%.3f").mkString(",")} " +
        f"min=${s.head}%.3f median=${s(2)}%.3f")
    }
    spark.stop()
  }
}
