package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** [[Ranking.withGlobalNtile]] must equal the builtin `ntile` over an
  * unpartitioned window CELL FOR CELL — the whole point of the r9
  * rewrite is changing the PLAN (range exchange + map-side rank instead
  * of a single-task sort) without changing a single output value. */
class RankingSpec extends SparkSpec {
  import spark.implicits._

  private def check(n: Int, buckets: Int, seed: Long): Unit = {
    // keys with heavy ties in the value column; id breaks all ties
    val rnd = new scala.util.Random(seed)
    val df = (0 until n).map(i => (i.toLong, rnd.nextInt(7).toDouble))
      .toDF("id", "v")
    val want = df
      .withColumn("nt", ntile(buckets)
        .over(Window.orderBy(desc("v"), asc("id"))))
      .collect().map(r => r.getLong(0) -> r.getInt(2)).toMap
    val got = Ranking
      .withGlobalNtile(df, buckets, "nt", desc("v"), asc("id"))
      .collect().map(r => r.getLong(0) -> r.getInt(2)).toMap
    assert(got === want, s"n=$n buckets=$buckets seed=$seed")
    graft.Caching.releaseAll()
    spark.sharedState.cacheManager.clearCache()
  }

  test("withGlobalNtile == builtin ntile across sizes, buckets, seeds") {
    // n < buckets (every row its own tile), n not divisible by buckets
    // (first n%b tiles get the extra row), n >> partitions
    for {
      (n, b) <- Seq((3, 4), (10, 4), (97, 4), (1000, 7), (1001, 10))
      seed <- Seq(1L, 42L)
    } check(n, b, seed)
  }

  test("withGlobalNtile: empty frame and single row") {
    val empty = Seq.empty[(Long, Double)].toDF("id", "v")
    assert(Ranking.withGlobalNtile(empty, 4, "nt", asc("v")).count() === 0)
    val one = Seq((1L, 5.0)).toDF("id", "v")
    val r = Ranking.withGlobalNtile(one, 4, "nt", asc("v")).collect()
    assert(r.map(_.getInt(2)).toSeq === Seq(1))
  }

  test("withGlobalNtile plans no Window and keeps the range exchange") {
    val df = (0 until 100).map(i => (i.toLong, (i % 5).toDouble))
      .toDF("id", "v")
    val out = Ranking.withGlobalNtile(df, 4, "nt", desc("v"), asc("id"))
    val lp = out.queryExecution.optimizedPlan
    val wins = lp.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window => w }
    assert(wins.isEmpty, "the operator must not plan any Window")
    graft.Caching.releaseAll()
    spark.sharedState.cacheManager.clearCache()
  }
}
