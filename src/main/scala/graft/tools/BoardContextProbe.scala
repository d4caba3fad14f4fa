package graft.tools

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** r13 (verdict #1) / r14 (verdict #1 again): FULL-BOARD-CONTEXT drift
  * arm with MECHANISM instrumentation. The r12 driver bench read
  * `q_pagerank` at 10.910 s inside the 231-key board while the identical
  * protocol standalone read 1.975 s; the r12 eager-checkpoint fix killed
  * the recompute mechanism, yet the r13 DRIVER board still read 3.381 s
  * (~1-in-3 full boards) while the builder's own board read 0.807 s.
  * The r14 verdict demands the transient be ATTRIBUTED by measurement,
  * naming the mechanism among: (a) checkpointed blocks evicted to disk
  * under late-board pressure (per-round disk re-reads), (b) GC stall,
  * (c) checkpoint-materialization contention.
  *
  * This probe runs N full sequential board replays (default 5; every
  * SparkEntry key, Bench-loop hygiene: warm + 1 timed, releaseAll + GC)
  * and, for the target keys, measures warm + 3 timed with per-run rows:
  *
  *   - wall seconds;
  *   - task-summed jvmGCTime / memoryBytesSpilled / diskBytesSpilled
  *     (SparkListener onTaskEnd deltas — hypothesis (b) and shuffle
  *     spill pressure);
  *   - driver MXBean GC-time delta (full-GC stalls between tasks —
  *     local mode shares the JVM, so this covers executor-side too);
  *   - persisted-RDD census before the run from
  *     `sc.getRDDStorageInfo`: count, memory bytes, disk bytes
  *     (hypothesis (a): residue blocks from PRIOR keys still occupying
  *     the storage pool, or the key's own checkpoint blocks landing on
  *     disk instead of memory).
  *
  * The A/B arm: `SPARK_GRAFT_PROBE_LEGACY=1` disables the r14
  * deterministic checkpoint release (Caching.trackCheckpoints=false),
  * restoring the r13 behavior where localCheckpoint blocks are freed
  * only when the ContextCleaner reacts to a GC — the leading candidate
  * for the bimodal residue, since that cleanup is ASYNC and can lag the
  * next key's runs. Comparing the census columns legacy-vs-tracked makes
  * the attribution a measurement: legacy boards show nonzero carried-in
  * RDD residue before the target runs exactly when the slow readings
  * appear; tracked boards show zero.
  *
  * Config matches the driver bench: local[32],
  * spark.sql.shuffle.partitions=8 (override via SPARK_GRAFT_PROBE_CPUS /
  * SPARK_GRAFT_PROBE_SHUFFLE); SPARK_GRAFT_PROBE_BOARDS sets the replay
  * count; SPARK_GRAFT_PROBE_TARGETS the instrumented keys.
  */
object BoardContextProbe {
  private final class TaskAcc extends SparkListener {
    val gcMs = new AtomicLong
    val memSpill = new AtomicLong
    val diskSpill = new AtomicLong
    override def onTaskEnd(te: SparkListenerTaskEnd): Unit = {
      val m = te.taskMetrics
      if (m != null) {
        gcMs.addAndGet(m.jvmGCTime)
        memSpill.addAndGet(m.memoryBytesSpilled)
        diskSpill.addAndGet(m.diskBytesSpilled)
      }
    }
    def snap(): (Long, Long, Long) =
      (gcMs.get(), memSpill.get(), diskSpill.get())
  }

  private def mxGcMs(): Long = {
    import scala.jdk.CollectionConverters._
    java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
      .asScala.map(_.getCollectionTime).sum
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_PROBE_CPUS", "32")
    val shuffle = sys.env.getOrElse("SPARK_GRAFT_PROBE_SHUFFLE", "8")
    val boards = sys.env.getOrElse("SPARK_GRAFT_PROBE_BOARDS", "5").toInt
    val legacy = sys.env.get("SPARK_GRAFT_PROBE_LEGACY").contains("1")
    val targets = sys.env.getOrElse("SPARK_GRAFT_PROBE_TARGETS",
      "q_pagerank").split(",").map(_.trim).toSeq
    if (legacy) graft.Caching.trackCheckpoints = false
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", shuffle)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.GraftFunctions.register(spark)
    val acc = new TaskAcc
    spark.sparkContext.addSparkListener(acc)
    println(s"mode=${if (legacy) "LEGACY (r13: GC-driven checkpoint " +
      "release)" else "TRACKED (r14: deterministic release)"} " +
      s"boards=$boards targets=${targets.mkString(",")}")

    def run(k: String): Double = {
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(k)(spark, sfDir).count()
      (System.nanoTime() - t0) / 1e9
    }
    // one key under the Bench loop's exact hygiene: warm, n timed,
    // release tracked caches, GC — median over the timed runs. For
    // instrumented keys, one mechanism row per timed run.
    def measure(k: String, n: Int, tag: String = ""): Double = {
      val instrument = tag.nonEmpty
      run(k)
      val ts = (1 to n).map { i =>
        if (instrument) {
          val rdds = spark.sparkContext.getRDDStorageInfo
          val (gc0, ms0, ds0) = acc.snap(); val mx0 = mxGcMs()
          val t = run(k)
          val (gc1, ms1, ds1) = acc.snap(); val mx1 = mxGcMs()
          println(f"$tag $k run$i wall=$t%.3f s " +
            f"taskGc=${gc1 - gc0}%d ms mxGc=${mx1 - mx0}%d ms " +
            f"spillMem=${(ms1 - ms0) / 1e6}%.1f MB " +
            f"spillDisk=${(ds1 - ds0) / 1e6}%.1f MB " +
            f"| residue before run: rdds=${rdds.length}%d " +
            f"mem=${rdds.map(_.memSize).sum / 1e6}%.1f MB " +
            f"disk=${rdds.map(_.diskSize).sum / 1e6}%.1f MB")
          t
        } else run(k)
      }
      graft.Caching.releaseAll()
      System.gc()
      val s = ts.sorted
      s((s.size - 1) / 2)
    }

    val board = graft.SparkEntry.queries.keys.toSeq.sorted
    val fresh = targets.map(k => k -> measure(k, 3, "FRESH")).toMap
    fresh.foreach { case (k, t) => println(f"FRESH      $k%-18s $t%.3f s") }

    (1 to boards).foreach { b =>
      var inBoard = Map.empty[String, Double]
      val t0 = System.nanoTime()
      board.foreach { k =>
        if (targets.contains(k)) {
          val t = measure(k, 3, s"BOARD$b")
          inBoard += (k -> t)
        } else {
          try measure(k, 1)
          catch { case _: Throwable => () } // pressure run; a failure here
                                            // is Verify's problem, not ours
        }
      }
      val wall = (System.nanoTime() - t0) / 1e9
      inBoard.foreach { case (k, t) =>
        println(f"BOARD$b%-2d    $k%-18s $t%.3f s " +
          f"(ratio vs fresh ${t / fresh(k)}%.2f; board wall $wall%.1f s)")
      }
    }
    spark.stop()
  }
}
