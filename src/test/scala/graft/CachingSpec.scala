package graft

import org.apache.spark.sql.functions._

/** The cache-lifecycle registry: same-plan reuse without a second
  * persist call, full release, and independence of distinct plans. */
class CachingSpec extends SparkSpec {
  import spark.implicits._

  test("cache: same canonical plan returns the tracked frame once") {
    Caching.releaseAll()
    val a = Seq(1, 2, 3).toDF("x").groupBy("x").count()
    val b = Seq(1, 2, 3).toDF("x").groupBy("x").count() // same shape
    val ca = Caching.cache(a)
    val cb = Caching.cache(b)
    assert(ca eq cb, "second cache() of the same plan returns the FIRST " +
      "frame — no double persist, composition hits the live entry")
    assert(Caching.trackedCount === 1)
    assert(ca.storageLevel.useMemory, "first call really persisted")
    Caching.releaseAll()
    assert(Caching.trackedCount === 0)
    assert(!a.storageLevel.useMemory, "releaseAll unpersisted the frame")
  }

  test("cache: distinct plans are tracked independently") {
    Caching.releaseAll()
    val a = Caching.cache(Seq(1).toDF("x"))
    val b = Caching.cache(Seq(1).toDF("y"))
    assert(!(a eq b) && Caching.trackedCount === 2)
    // results still correct through the cached frames
    assert(a.as[Int].head() === 1 && b.as[Int].head() === 1)
    Caching.releaseAll()
    assert(Caching.trackedCount === 0)
  }

  test("query results are identical with a cold and a warm registry") {
    Caching.releaseAll()
    val cold = SparkEntry.queries("q_tfidf")(spark, sf).collect().map(_.toSeq)
    val warm = SparkEntry.queries("q_tfidf")(spark, sf).collect().map(_.toSeq)
    assert(cold.toSeq === warm.toSeq)
    Caching.releaseAll()
    val released =
      SparkEntry.queries("q_tfidf")(spark, sf).collect().map(_.toSeq)
    assert(cold.toSeq === released.toSeq)
    Caching.releaseAll()
  }

  test("checkpoint tracking: releaseAll frees the localCheckpoint " +
      "blocks deterministically and fires registered hooks (r14)") {
    import spark.implicits._
    Caching.releaseAll()
    val sc = spark.sparkContext
    val before = sc.getPersistentRDDs.size
    // EAGER checkpoint: blocks materialize now and must be tracked
    val df = Caching.checkpoint(
      (1 to 1000).toDF("x").select(col("x") * 2 as "y"))
    assert(df.count() == 1000L)
    assert(sc.getPersistentRDDs.size > before,
      "the checkpointed RDD should be persisted")
    var hookFired = 0
    Caching.onReleaseAll(() => hookFired += 1)
    Caching.releaseAll()
    assert(hookFired == 1, "releaseAll must fire registered hooks")
    // the tracked blocks are gone (async unpersist — poll briefly)
    val deadline = System.nanoTime() + 10e9.toLong
    while (sc.getPersistentRDDs.size > before &&
        System.nanoTime() < deadline) Thread.sleep(100)
    assert(sc.getPersistentRDDs.size <= before,
      s"checkpoint blocks must be released deterministically " +
        s"(still ${sc.getPersistentRDDs.size} persistent RDDs)")
    Caching.releaseAll() // hook stays registered; must be idempotent
    assert(hookFired == 2)
  }

  test("checkpoint uses the RELIABLE form when a checkpoint dir is " +
      "configured (r14, ADVICE r13 #3)") {
    import spark.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory("graft_ckpt_dir").toFile
    val sc = spark.sparkContext
    assert(sc.getCheckpointDir.isEmpty,
      "suite precondition: no checkpoint dir configured yet")
    try {
      sc.setCheckpointDir(dir.getAbsolutePath)
      val before = sc.getPersistentRDDs.size
      val df = Caching.checkpoint((1 to 100).toDF("x"))
      assert(df.count() == 100L)
      // reliable checkpoints write FILES, not block-manager entries
      assert(sc.getPersistentRDDs.size == before,
        "reliable checkpoint must not add tracked persisted blocks")
      val written = java.nio.file.Files.walk(dir.toPath)
        .filter(java.nio.file.Files.isRegularFile(_)).count()
      assert(written > 0, "reliable checkpoint must write files")
    } finally {
      // un-configure for later suites: SparkContext has no public
      // unset, so clear via the conf field it reads lazily — the
      // checkpointDir option is only consulted at checkpoint() calls
      val f = sc.getClass.getDeclaredField("checkpointDir")
      f.setAccessible(true)
      f.set(sc, None)
      org.apache.commons.io.FileUtils.deleteQuietly(dir)
    }
  }

  test("graft-events offset round-trips through its JSON form") {
    // the micro-batch restart path: Spark feeds the checkpointed JSON
    // back through deserializeOffset — must reproduce the same offset
    val scan = new graft.sources.GraftEventsSource()
    val t = scan.getTable(graft.sources.GraftEventsSource.rawSchema,
      Array.empty, new java.util.HashMap[String, String] {
        put("topic", "offset_rt")
      })
    val stream = t.asInstanceOf[org.apache.spark.sql.connector.catalog.SupportsRead]
      .newScanBuilder(new org.apache.spark.sql.util.CaseInsensitiveStringMap(
        new java.util.HashMap[String, String]()))
      .build().toMicroBatchStream("/tmp/unused")
    val off = stream.initialOffset()
    assert(off.json() === "0")
    val round = stream.deserializeOffset("42")
    assert(round.json() === "42")
    graft.sources.GraftEventsBroker.clear("offset_rt")
  }
}
