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
