package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** r14 optimization probe: per-key timing under the EXACT Bench protocol
  * (same session config, warm-up + 3 timed runs, median, cache release +
  * GC between keys) plus the final adaptive formatted plan, written to
  * `plans/r14/<key>_<tag>.txt` so before/after plan claims are auditable
  * without running Spark.
  *
  * Usage: OptProbe <tag> <key>[,<key>...]        (tag = before | after | ...)
  * Env:   SPARK_GRAFT_SF_DIR (default sf0.1), SPARK_GRAFT_CPUS (default 32),
  *        SPARK_GRAFT_PLAN_DIR (default plans/r14).
  */
object OptProbe {
  def main(args: Array[String]): Unit = {
    val tag = if (args.nonEmpty) args(0) else "before"
    // "ALL" = every declared key, one warm-up execution + plan dump only
    // (no timed runs) — the round-close plan-evidence sweep
    val dumpOnly = args.length > 1 && args(1) == "ALL"
    val keys =
      if (dumpOnly) graft.SparkEntry.queries.keys.toArray.sorted
      else if (args.length > 1)
        args(1).split(",").map(_.trim).filter(_.nonEmpty)
      else Array.empty[String]
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val planDir = sys.env.getOrElse("SPARK_GRAFT_PLAN_DIR", "plans/r15")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      // r15: partitions track cpus, exactly like Bench (VERDICT r14 #2)
      .config("spark.sql.shuffle.partitions", cpus.toInt.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Files.createDirectories(Paths.get(planDir))
    // per-stage accounting (guide §1.1 empirical loop, headless stand-in
    // for the Stages tab): task-summed run time + shuffle bytes per stage
    val stages = new java.util.concurrent.ConcurrentHashMap[
      Int, (String, Long, Long, Long, Long)]() // name, ms, sh-read, sh-write, tasks
    val showStages = sys.env.contains("SPARK_GRAFT_STAGES")
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(
            sc: org.apache.spark.scheduler.SparkListenerStageCompleted)
            : Unit = {
          val si = sc.stageInfo
          // RDD scope names make the stage attributable ("Scan parquet",
          // "InMemoryTableScan", ...) where the callsite alone is the
          // opaque AQE $anonfun
          val rdds = si.rddInfos.map(_.name).distinct.mkString(">")
            .replaceAll("\\s+", " ").take(80)
          val name = (si.name.takeWhile(_ != '\n') + " | " + rdds).take(140)
          stages.put(si.stageId, (name,
            si.taskMetrics.executorRunTime,
            si.taskMetrics.shuffleReadMetrics.totalBytesRead,
            si.taskMetrics.shuffleWriteMetrics.bytesWritten,
            si.numTasks.toLong))
        }
      })
    keys.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      spark.sparkContext.setJobDescription(s"optprobe:$name")
      // warm-up run also finalizes AQE so the dumped plan is the real one
      val warm = fn(spark, sfDir)
      warm.count()
      val txt = s"// $name — final adaptive plan, $sfDir, tag=$tag\n" +
        warm.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
      Files.writeString(Paths.get(s"$planDir/${name}_$tag.txt"), txt)
      if (dumpOnly) {
        graft.Caching.releaseAll()
        println(s"[optprobe] $name plan -> $planDir/${name}_$tag.txt")
      } else {
      // r15 (VERDICT r14 #3): timed runs start cold wrt library caches,
      // exactly like Bench — release after the warm-up and each timed run
      graft.Caching.releaseAll()
      // phase breakdown per run: build (DataFrame construction incl. any
      // dialect rewrite), plan (analysis+optimization+physical planning,
      // forced via executedPlan), execute (jobs incl. AQE re-planning)
      val times = (1 to 3).map { i =>
        if (i == 3) stages.clear() // keep only the LAST run's stages
        val t0 = System.nanoTime()
        val df = fn(spark, sfDir)
        val t1 = System.nanoTime()
        df.queryExecution.executedPlan
        val t2 = System.nanoTime()
        df.count()
        val t3 = System.nanoTime()
        graft.Caching.releaseAll() // untimed: outside the clocked region
        ((t3 - t0) / 1e9, (t1 - t0) / 1e9, (t2 - t1) / 1e9, (t3 - t2) / 1e9)
      }.sortBy(_._1)
      if (showStages) {
        import scala.jdk.CollectionConverters._
        val rows = stages.asScala.toSeq.sortBy(-_._2._2).take(8)
        rows.foreach { case (id, (nm, ms, sr, sw, nt)) =>
          println(f"    [stage $id%5d] $ms%6d ms  tasks $nt%3d  " +
            f"shRead ${sr / 1024}%8d KB  shWrite ${sw / 1024}%8d KB  $nm")
        }
      }
      graft.Caching.releaseAll()
      System.gc()
      val (tot, b, p, x) = times(1)
      println(f"[optprobe] $name%-24s median $tot%7.3f s " +
        f"(build $b%.3f plan $p%.3f exec $x%.3f; " +
        f"runs ${times.map(t => f"${t._1}%.3f").mkString(" ")})  plan -> " +
        s"$planDir/${name}_$tag.txt")
      }
      spark.sparkContext.setJobDescription(null)
    }
    spark.stop()
  }
}
