package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The df-ceiling pair discipline (r11, verdict #1): hot postings must
  * never reach the pair explode, cold postings must pair exactly, and
  * the dropped mass must be accounted, not silently eaten. */
class PostingsSpec extends SparkSpec {
  import spark.implicits._

  private def rows = Seq(
    // gram "hot" shared by 5 docs, "warm" by 3, "cold" by 2, "solo" by 1
    (1L, "hot"), (2L, "hot"), (3L, "hot"), (4L, "hot"), (5L, "hot"),
    (1L, "warm"), (2L, "warm"), (6L, "warm"),
    (6L, "cold"), (7L, "cold"),
    (8L, "solo"),
    // duplicate occurrences within one doc collapse (collect_set)
    (1L, "hot"), (6L, "cold")
  ).toDF("doc_id", "gram")

  private def posts = Postings.postingLists(rows, Seq("gram"))

  test("postingLists: sorted distinct doc ids per key") {
    val m = posts.collect()
      .map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    assert(m("hot") == Seq(1L, 2L, 3L, 4L, 5L))
    assert(m("cold") == Seq(6L, 7L))
    assert(m("solo") == Seq(8L))
  }

  test("pairCounts: exact ordered pairs under the ceiling") {
    val got = Postings.pairCounts(posts, maxDf = 128)
      .orderBy("da", "db").as[(Long, Long, Long)].collect()
    // hot (df 5) -> C(5,2)=10 pairs, warm -> 3, cold -> 1; (1,2) shares
    // hot+warm so inter=2
    assert(got.length == 10 + 3 + 1 - 1) // (1,2) merged across grams
    assert(got.forall { case (a, b, _) => a < b })
    val m = got.map { case (a, b, i) => (a, b) -> i }.toMap
    assert(m((1L, 2L)) == 2L) // hot + warm
    assert(m((3L, 4L)) == 1L) // hot only
    assert(m((6L, 7L)) == 1L) // cold only
  }

  test("pairCounts: a posting past the ceiling contributes ZERO pairs") {
    val capped = Postings.pairCounts(posts, maxDf = 4)
      .orderBy("da", "db").as[(Long, Long, Long)].collect()
    // hot (df 5 > 4) dropped entirely: only warm's 3 + cold's 1 remain
    assert(capped.toSeq == Seq((1L, 2L, 1L), (1L, 6L, 1L), (2L, 6L, 1L),
      (6L, 7L, 1L)))
  }

  test("dfHistogram: buckets integer-exact, dropped mass accounted") {
    val h = Postings.dfHistogram(posts, maxDf = 4)
      .as[(Long, Boolean, Long, Long, Long)].collect().toSeq
    // df=1 (solo) -> bucket 0; df=2 (cold) -> 1; df=3 (warm) -> 2;
    // df=5 (hot) -> 3, dropped at maxDf=4 with pair mass C(5,2)=10
    assert(h == Seq((0L, true, 1L, 1L, 0L), (1L, true, 1L, 2L, 1L),
      (2L, true, 1L, 3L, 3L), (3L, false, 1L, 5L, 10L)))
    // power-of-two edges: df=4 -> bucket 2, df=8 -> 3, df=128 -> 7,
    // df=129 -> 8 (the kept/dropped boundary at DefaultMaxDf)
    val edges = Seq(4, 8, 128, 129).map(n =>
      Postings.dfHistogram(
        Postings.postingLists(
          spark.range(n).select(lit("g").as("gram"),
            col("id").as("doc_id")), Seq("gram")))
        .as[(Long, Boolean, Long, Long, Long)].head())
    assert(edges.map(_._1) == Seq(2L, 3L, 7L, 8L))
    assert(edges.map(_._2) == Seq(true, true, true, false))
  }

  test("dfHistogramOf (counts-only) ≡ dfHistogram over posting lists") {
    val viaLists = Postings.dfHistogram(posts, 4).collect().map(_.toSeq)
    val viaCounts = Postings.dfHistogramOf(rows, Seq("gram"), "doc_id", 4)
      .collect().map(_.toSeq)
    assert(viaCounts.toSeq == viaLists.toSeq)
    // and on the real gram frame at fixture scale
    val gr = graft.queries.TextOps.gramRows(
      graft.Tables.table(spark, sf, "documents"), 4)
    val a = Postings.dfHistogram(
      Postings.postingLists(gr, Seq("lang", "gram")))
      .collect().map(_.toSeq)
    val b = Postings.dfHistogramOf(gr, Seq("lang", "gram"))
      .collect().map(_.toSeq)
    assert(a.toSeq == b.toSeq)
  }

  test("dfHistogramOf's xxhash64 key is collision-free on the fixture " +
    "gram space (r15 — the proxy-key exactness pin)") {
    // the r15 rewrite aggregates on xxhash64(lang, gram) instead of the
    // strings; the histogram is bit-identical iff no two distinct
    // (lang, gram) keys collide. Pin that directly on the real 4-gram
    // space (the ≡-to-posting-lists test above then pins the full
    // result); at sf0.01 scale the same holds (oracle-diffed).
    val gr = graft.queries.TextOps.gramRows(
      graft.Tables.table(spark, sf, "documents"), 4)
    val r = gr.agg(
      countDistinct(col("lang"), col("gram")).as("exact"),
      countDistinct(xxhash64(col("lang"), col("gram"))).as("hashed"))
      .head()
    assert(r.getLong(0) == r.getLong(1),
      s"xxhash64 collision on fixture grams: ${r.getLong(0)} keys -> " +
        s"${r.getLong(1)} hashes")
  }

  test("the declared keys ride the shared discipline (fixture ≡ uncapped" +
    " — max fixture df is 5, far under 128)") {
    val gr = graft.queries.TextOps.gramRows(
      graft.Tables.table(spark, sf, "documents"), 4)
    val p = Postings.postingLists(gr, Seq("lang", "gram"))
    val capped = Postings.pairCounts(p, 128)
    val uncapped = Postings.pairCounts(p, Int.MaxValue)
    assert(capped.exceptAll(uncapped).isEmpty &&
      uncapped.exceptAll(capped).isEmpty)
  }
}
