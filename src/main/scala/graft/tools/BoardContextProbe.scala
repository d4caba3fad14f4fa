package graft.tools

import org.apache.spark.sql.SparkSession

/** r13 (verdict #1): FULL-BOARD-CONTEXT drift arm. The r12 driver bench
  * read `q_pagerank` at 10.910 s and `q_split_leakage` at 2.865 s inside
  * the 231-key board while the identical protocol standalone read
  * 1.975 s / 1.131 s — a signature consistent with best-effort cache
  * eviction re-running the band self-join once per iteration. DriftProbe
  * measures keys fresh-JVM only, which is exactly the context where that
  * mechanism cannot fire; this probe measures the SAME keys three ways
  * in one JVM so the attribution is a measurement, not an inference:
  *
  *   1. FRESH      — at JVM start (DriftProbe's protocol: warm + 3
  *                   timed, median);
  *   2. IN-BOARD   — at their sorted position inside a full sequential
  *                   replay of every SparkEntry key (each other key runs
  *                   warm + 1 timed with the Bench loop's releaseAll +
  *                   GC hygiene, so storage/GC pressure matches the
  *                   driver's run; the targets keep warm + 3 timed);
  *   3. POST-BOARD — immediately after the board, when heap and block
  *                   manager carry the whole run's residue.
  *
  * A ratio IN-BOARD/FRESH ≈ 1 shows the eager-localCheckpoint hardening
  * (Components.scala / PipelineOps q_pagerank) holds under the driver's
  * pressure; a ratio matching the key's iteration count reproduces the
  * eviction pathology. Config matches the driver bench: local[32],
  * spark.sql.shuffle.partitions=8 (override via SPARK_GRAFT_PROBE_CPUS /
  * SPARK_GRAFT_PROBE_SHUFFLE).
  */
object BoardContextProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_PROBE_CPUS", "32")
    val shuffle = sys.env.getOrElse("SPARK_GRAFT_PROBE_SHUFFLE", "8")
    val targets = sys.env.getOrElse("SPARK_GRAFT_PROBE_TARGETS",
      "q_pagerank,q_split_leakage").split(",").map(_.trim).toSeq
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", shuffle)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.GraftFunctions.register(spark)

    def run(k: String): Double = {
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(k)(spark, sfDir).count()
      (System.nanoTime() - t0) / 1e9
    }
    // one key under the Bench loop's exact hygiene: warm, n timed,
    // release tracked caches, GC — medians over the timed runs
    def measure(k: String, n: Int, show: Boolean = false): Double = {
      run(k)
      val ts = (1 to n).map(_ => run(k))
      graft.Caching.releaseAll()
      System.gc()
      if (show) println(f"  runs $k%-18s " +
        ts.map(t => f"$t%.3f").mkString(","))
      val s = ts.sorted
      s((s.size - 1) / 2)
    }

    val fresh = targets.map(k => k -> measure(k, 3, show = true)).toMap
    fresh.foreach { case (k, t) => println(f"FRESH      $k%-18s $t%.3f s") }

    val board = graft.SparkEntry.queries.keys.toSeq.sorted
    var inBoard = Map.empty[String, Double]
    board.foreach { k =>
      if (targets.contains(k)) {
        val t = measure(k, 3, show = true)
        inBoard += (k -> t)
        println(f"IN-BOARD   $k%-18s $t%.3f s  " +
          f"(position ${board.indexOf(k) + 1}/${board.size})")
      } else {
        try measure(k, 1)
        catch { case _: Throwable => () } // pressure run; a failure here
                                          // is Verify's problem, not ours
      }
    }

    val post = targets.map(k => k -> measure(k, 3, show = true)).toMap
    post.foreach { case (k, t) => println(f"POST-BOARD $k%-18s $t%.3f s") }

    // settle arm: same keys after the block-manager drop storm and the
    // ContextCleaner have had time to drain — separates "end-of-board
    // transient" from "accumulated-state slowdown"
    Thread.sleep(3000); System.gc(); Thread.sleep(2000); System.gc()
    val settled = targets.map(k => k -> measure(k, 3, show = true)).toMap
    settled.foreach { case (k, t) =>
      println(f"SETTLED    $k%-18s $t%.3f s") }

    targets.foreach { k =>
      println(f"RATIO $k%-18s in_board/fresh=${inBoard(k) / fresh(k)}%.2f " +
        f"post/fresh=${post(k) / fresh(k)}%.2f " +
        f"settled/fresh=${settled(k) / fresh(k)}%.2f")
    }
    spark.stop()
  }
}
