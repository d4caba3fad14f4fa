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
      val t0 = System.nanoTime(); f().count(); (System.nanoTime() - t0) / 1e9
    }
    def tumbling() = graft.SparkEntry.queries("q_window_tumbling")(
      spark, sfDir)
    def anchor() = graft.SparkEntry.queries("q_agg_groupby")(spark, sfDir)
    for ((name, f) <- Seq(("3key", threeKey _), ("1key", oneKey _),
        ("tumbling", tumbling _), ("anchor", anchor _))) {
      (1 to 8).foreach(_ => f().count()) // warm-up to steady state
      val runs = (1 to 5).map(_ => time(f))
      val s = runs.sorted
      println(f"$name: runs=${runs.map(r => f"$r%.3f").mkString(",")} " +
        f"min=${s.head}%.3f median=${s(2)}%.3f")
    }
    spark.stop()
  }
}
