package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** r11 drift attribution (verdict #2) at the DRIVER's bench config
  * (local[32], 32 shuffle partitions — TopkProbe runs the 4-thread
  * variant): `q_window_sliding` moved 0.198 → 0.366 s and `q_semdedup`
  * 0.936 → 1.462 s r9→r10 with no fixture-affecting code change. This
  * probe measures both against the same-run `q_agg_groupby` anchor in
  * a fresh JVM, plus a same-JVM A/B of the ONE semdedup code delta in
  * that window (f4b18a3's adaptive cap vs the r9 fixed cap in the seed
  * selection) — fixture labels are 50–220 rows, all under the 32² =
  * 1024 adaptive threshold, so the A/B should measure ≈ 1.0× if the
  * drift is ambient.
  *
  * r12 (verdict #1): `q_dedup_proxy` joined the suite after the r11
  * driver bench read it at 0.234 s vs the 0.099 s baseline (2.36×, the
  * one per-metric budget breach) on an UNCHANGED 6-line countDistinct —
  * measured here at matched warmth against the same anchor, at both the
  * baseline's 4-thread config and the driver's 32-thread config
  * (SPARK_GRAFT_PROBE_CPUS, default 32). Baseline-implied anchor ratio:
  * 0.099 / 0.300 = 0.33. */
object DriftProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_PROBE_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.GraftFunctions.register(spark)

    def time(f: () => DataFrame): Double = {
      val t0 = System.nanoTime(); f().count()
      val t = (System.nanoTime() - t0) / 1e9
      graft.Caching.releaseAll()
      t
    }
    def key(k: String)() = graft.SparkEntry.queries(k)(spark, sfDir)

    // the r9 FIXED-cap seed selection (pre-f4b18a3), inlined — the only
    // code delta on the semdedup path between the r9 and r10 benches
    def fixedAssign(): DataFrame = {
      import org.apache.spark.sql.expressions.Window
      val emb = graft.Tables.table(spark, sfDir, "embeddings")
      val cap = 32
      val wl = Window.partitionBy("label").orderBy("vec_id")
      val seedIds = emb.select(col("vec_id"), col("label"))
        .withColumn("__rk", row_number().over(wl))
        .withColumn("__n", count(lit(1))
          .over(Window.partitionBy("label")))
        .filter(col("__rk") <= expr(s"(__n + ${cap - 1}) div $cap"))
        .select(col("vec_id").as("__sid"))
      val seedArr = emb
        .join(broadcast(seedIds), col("vec_id") === col("__sid"))
        .groupBy(col("label").as("__sl"))
        .agg(sort_array(collect_list(struct(col("vec_id").as("sid"),
          col("embedding").as("sv")))).as("__seeds"))
      emb.join(broadcast(seedArr), col("label") === col("__sl"))
        .withColumn("__vv", expr("dot_product(embedding, embedding)"))
        .withColumn("sub", expr(
          """array_min(transform(__seeds, s -> named_struct(
            |'d2', floor((__vv - 2 * dot_product(embedding, s.sv)
            |             + dot_product(s.sv, s.sv)) * 10000 + 0.5)
            |      / 10000,
            |'sid', s.sid))).sid""".stripMargin))
        .drop("__sl", "__seeds", "__vv")
    }
    def adaptiveAssign(): DataFrame =
      graft.operators.Similarity.subclusterByCap(spark,
        graft.Tables.table(spark, sfDir, "embeddings"),
        "vec_id", "label", "embedding", cap = 32)

    val suite: Seq[(String, () => DataFrame)] = Seq(
      ("anchor", key("q_agg_groupby") _),
      ("sliding", key("q_window_sliding") _),
      ("semdedup", key("q_semdedup") _),
      ("dedup_proxy", key("q_dedup_proxy") _),
      ("assign_adaptive", adaptiveAssign _),
      ("assign_fixed_r9", fixedAssign _))
    val meds = suite.map { case (name, f) =>
      (1 to 8).foreach { _ => f().count(); graft.Caching.releaseAll() }
      val runs = (1 to 5).map(_ => time(f))
      val s = runs.sorted
      println(f"$name%-16s runs=${runs.map(r => f"$r%.3f").mkString(",")} " +
        f"min=${s.head}%.3f median=${s(2)}%.3f")
      name -> s(2)
    }.toMap
    println(f"ratios vs anchor: sliding=${meds("sliding") / meds("anchor")}%.2f " +
      f"semdedup=${meds("semdedup") / meds("anchor")}%.2f " +
      f"dedup_proxy=${meds("dedup_proxy") / meds("anchor")}%.2f")
    println(f"adaptive/fixed assignment A/B: " +
      f"${meds("assign_adaptive") / meds("assign_fixed_r9")}%.2f")
    spark.stop()
  }
}
