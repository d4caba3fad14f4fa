package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev probe (r13, verdict #6): the BPE trainer at a REALISTIC merge
  * count. The cutover (PipelineOps.BpeLocalCutover = 8) was spec-pinned
  * local ≡ distributed at small round counts; this measures the wall
  * and the Spark JOB COUNT either side of it — 8 rounds (distributed
  * loop: one job per merge) vs 256 rounds (local: one word-freq agg +
  * one Heaps-bounded vocab collect, ZERO per-round jobs) — so the
  * "constant jobs in the merge count" claim is a measured row, not an
  * argument. Numbers land in SCALE.md. */
object BpeProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val jobs = new java.util.concurrent.atomic.AtomicInteger()
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          jobs.incrementAndGet(); ()
        }
      })

    // 89 = the documents fixture's CLOSURE point: after 89 merges every
    // word is a single symbol and round 90 throws "no adjacent pairs
    // left" (the fixture draws from a fixed word pool, so its vocab is
    // scale-independent) — i.e. the local arm trains the full
    // vocabulary to closure, the largest merge count the fixture admits
    Seq(3, 8, 64, 89).foreach { rounds =>
      jobs.set(0)
      val t0 = System.nanoTime()
      val (merges, _) =
        graft.queries.PipelineOps.bpeRounds(spark, sfDir, rounds)
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(1500) // listener bus drain
      val path = if (rounds > graft.queries.PipelineOps.BpeLocalCutover)
        "local" else "distributed"
      println(f"rounds=$rounds%4d path=$path%-11s wall=$wall%7.2fs " +
        f"jobs=${jobs.get()}%4d merges=${merges.length} " +
        f"last=${merges.last._2}+${merges.last._3} (cnt ${merges.last._4})")
      graft.Caching.releaseAll()
    }
    spark.stop()
  }
}
