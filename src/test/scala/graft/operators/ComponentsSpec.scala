package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class ComponentsSpec extends SparkSpec {
  import spark.implicits._

  test("connected components: chains, cliques, disjoint pairs") {
    // 1-2-3-4 chain, {10,11,12} clique, isolated pair 20-21
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L), (11L, 12L),
      (10L, 12L), (20L, 21L)).toDF("src", "dst")
    val got = Components.connectedComponents(edges)
      .as[(Long, Long)].collect().toMap
    assert(Seq(1L, 2L, 3L, 4L).forall(got(_) == 1L))
    assert(Seq(10L, 11L, 12L).forall(got(_) == 10L))
    assert(Seq(20L, 21L).forall(got(_) == 20L))
    assert(got.size == 9)
  }

  test("long chain converges within diameter rounds") {
    val n = 30
    val edges = (1 until n).map(i => (i.toLong, (i + 1).toLong))
      .toDF("src", "dst")
    val got = Components.connectedComponents(edges)
      .as[(Long, Long)].collect().toMap
    assert((1 to n).forall(i => got(i.toLong) == 1L))
  }

  test("random graphs match a driver-side union-find (100 seeds)") {
    // pins the r6 convergence change (fixpoint detected IN the
    // propagating round): min-label propagation must agree with an
    // independent union-find on arbitrary topologies — stars, chains,
    // cycles, self-loops (dropped), parallel edges, whatever the seed
    // throws
    def unionFind(edges: Seq[(Long, Long)]): Map[Long, Long] = {
      val parent = scala.collection.mutable.Map[Long, Long]()
      def find(x: Long): Long = {
        val p = parent.getOrElseUpdate(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val ids = edges.flatMap(e => Seq(e._1, e._2)).distinct
      // normalize: every member maps to the MIN id of its component
      val byRoot = ids.groupBy(find)
      byRoot.valuesIterator.flatMap { members =>
        val m = members.min
        members.map(_ -> m)
      }.toMap
    }
    (1 to 100).foreach { seed =>
      val rnd = new scala.util.Random(seed)
      val n = 2 + rnd.nextInt(12)            // vertex ids 0..n-1
      val m = 1 + rnd.nextInt(16)            // edge count
      val edges = Seq.fill(m)(
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
      val real = edges.filter(e => e._1 != e._2)
      if (real.nonEmpty) {
        val got = Components
          .connectedComponents(real.toDF("src", "dst"))
          .as[(Long, Long)].collect().toMap
        val want = unionFind(real)
        assert(got === want, s"seed=$seed edges=$real")
      }
    }
  }

  test("star alternation == min-label on random graphs (40 seeds, r7)") {
    // the O(log n) large-star/small-star variant must produce the exact
    // (id, comp=min) frame min-label does, on arbitrary topologies
    // (40 seeds: each seed runs BOTH iterative algorithms — topology
    // coverage saturates well before the union-find test's 100)
    (1 to 40).foreach { seed =>
      val rnd = new scala.util.Random(seed + 7000)
      val n = 2 + rnd.nextInt(12)
      val m = 1 + rnd.nextInt(16)
      val edges = Seq.fill(m)(
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter(e => e._1 != e._2)
      if (edges.nonEmpty) {
        val df = edges.toDF("src", "dst")
        val star = Components.connectedComponentsStar(df)
          .as[(Long, Long)].collect().toMap
        val minl = Components.connectedComponents(df)
          .as[(Long, Long)].collect().toMap
        assert(star === minl, s"seed=$seed edges=$edges")
      }
    }
  }

  test("star alternation beats min-label round count on a long chain (r7)") {
    // a 60-vertex chain: min-label needs O(diameter) rounds; star
    // alternation contracts it in O(log n)
    val n = 60
    val edges = (1 until n).map(i => (i.toLong, (i + 1).toLong))
      .toDF("src", "dst")
    val (starLabels, starRounds) = Components.starWithRounds(edges)
    val (minLabels, minRounds) = Components.minLabelWithRounds(edges)
    assert(starLabels.as[(Long, Long)].collect().toMap ===
      minLabels.as[(Long, Long)].collect().toMap)
    assert((1 to n).forall(i =>
      starLabels.as[(Long, Long)].collect().toMap.apply(i.toLong) == 1L))
    assert(starRounds < minRounds,
      s"star=$starRounds rounds vs min-label=$minRounds on a chain")
    assert(starRounds <= 10, s"O(log n) expected, got $starRounds")
  }

  test("end-to-end dedup: LSH pairs on planted dups -> keeper resolution") {
    val docs = Tables.table(spark, sf, "documents")
    val planted = docs.limit(10)
      .union(docs.limit(4).withColumn("doc_id", col("doc_id") + 100000))
      .union(docs.limit(2).withColumn("doc_id", col("doc_id") + 200000))
    val pairs = Dedup.minhashLsh(planted, "doc_id", "text")
      .select("id_a", "id_b")
    val verdicts = Components.resolveDuplicates(pairs)
      .as[(Long, Long)].collect().toMap
    val originals = docs.orderBy("doc_id").limit(4)
      .select("doc_id").as[Long].collect()
    // each planted copy resolves to its original as keeper
    originals.take(4).foreach { id =>
      assert(verdicts(id + 100000) == id, s"copy of $id -> ${verdicts.get(id + 100000)}")
    }
    originals.take(2).foreach { id =>
      assert(verdicts(id + 200000) == id)
    }
  }

  test("blocked union-find == global fixpoint on block-confined graphs " +
    "(60 seeds, r15)") {
    // pins q_semdedup's r15 rewrite: when every edge lives inside one
    // block, resolveDuplicatesBlocked (one grouped union-find pass)
    // must emit exactly what the global iterative resolution emits
    (1 to 60).foreach { seed =>
      val rnd = new scala.util.Random(seed)
      val blocks = 1 + rnd.nextInt(4)
      val edges = (0 until blocks).flatMap { blk =>
        val base = blk * 100L // disjoint id spaces per block
        val n = 2 + rnd.nextInt(10)
        val m = 1 + rnd.nextInt(14)
        Seq.fill(m)((blk.toLong, rnd.nextInt(n) + base,
          rnd.nextInt(n) + base)).filter(e => e._2 != e._3)
      }
      if (edges.nonEmpty) {
        val df = edges.toDF("blk", "a", "b")
        val got = Components
          .resolveDuplicatesBlocked(df, "a", "b", Seq("blk"))
          .as[(Long, Long)].collect().toMap
        val want = Components
          .resolveDuplicates(df.select("a", "b"))
          .as[(Long, Long)].collect().toMap
        graft.Caching.releaseAll()
        assert(got === want, s"seed=$seed edges=$edges")
      }
    }
  }
}
