package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over a pair list — the step that turns near-dup
  * CANDIDATE PAIRS (from [[Dedup.minhashLsh]] / [[Similarity.nearDupPairs]])
  * into duplicate GROUPS with one keeper each, which is what a corpus
  * pipeline actually deletes against.
  *
  * Algorithm: iterative min-label propagation (each vertex adopts the
  * smallest label among itself and its neighbors) to a fixpoint —
  * O(diameter) rounds, each one join + one aggregation. Duplicate
  * clusters are star-like (diameter 2–3); the default round budget still
  * covers pathological chains; the only driver-side value per round is
  * the changed-row COUNT. Every round the label frame is
  * localCheckpoint-ed —
  * iterative plans grow exponentially otherwise and the driver OOMs
  * building plan strings long before executors feel anything; with a
  * reliable checkpoint dir configured, use checkpoint instead to also
  * remove lineage-recompute risk.
  */
object Components {
  /** @param edges two-column DataFrame of undirected pairs (ids of any
    *              integral type); vertices not present in any pair are
    *              (by construction) their own singleton component and are
    *              not emitted.
    * @return (id, component) where component = min id in the component.
    */
  def connectedComponents(edges: DataFrame, maxIter: Int = 64): DataFrame =
    minLabelWithRounds(edges, maxIter)._1

  /** Internal: min-label propagation, also reporting the round count
    * (the scale probes compare algorithms by rounds, not just wall). */
  private[graft] def minLabelWithRounds(edges: DataFrame,
      maxIter: Int = 64): (DataFrame, Int) = {
    val Array(sc, dc) = edges.columns
    val e = edges.select(col(sc).cast("long").as("a"),
        col(dc).cast("long").as("b"))
      .filter(col("a") =!= col("b"))
    // EAGER checkpoint, not best-effort persist (r12 verdict #1):
    // this frame is the input to EVERY propagation round. A persist()
    // entry evicted under session-wide memory pressure silently re-runs
    // the caller's upstream plan (for the dedup keys: the whole band
    // self-join) once per round — an O(rounds)× slowdown invisible to
    // correctness. Checkpointing materializes once and truncates
    // lineage, so eviction can never re-derive it. Via Caching (r14):
    // reliable checkpoint when a dir is configured (survives executor
    // loss), else localCheckpoint with the blocks tracked so
    // Caching.releaseAll frees them deterministically instead of at
    // ContextCleaner GC time.
    // r14 (optimization round, guide §2.4): checkpoint the edge frame
    // ALREADY partitioned on `b` — every propagation round joins on
    // undirected.b = labels.id, and LogicalRDD preserves the checkpoint's
    // output partitioning, so the big frame stops re-exchanging once per
    // round (only the node-sized label frame moves).
    val undirected = graft.Caching.checkpoint(
      e.union(e.select(col("b").as("a"), col("a").as("b"))).distinct()
        .repartition(col("b")))

    // r15 (guide §2: one shuffle less per fixpoint): the label INIT is
    // fused with the first propagation step. The old init built
    // labels₀ = (id, id) with a distinct — one aggregation-shaped job —
    // and then round 1 computed min(self, neighbors) with a join + agg.
    // But min(self, neighbors) is computable DIRECTLY from the
    // undirected edge frame with the SAME single aggregation the
    // distinct cost: group by a, comp = least(a, min(b)). Every CC call
    // therefore saves one full round (join + union + agg + driver count
    // + checkpoint) — for the star-like duplicate graphs (diameter 2-3)
    // that is ~25% of the fixpoint. Fixpoint and output are unchanged
    // (the min-label fixpoint is unique; ComponentsSpec's 100-seed
    // union-find pin covers this form).
    var labels = undirected.groupBy(col("a"))
      .agg(least(col("a"), min(col("b"))).as("comp"))
      .select(col("a").as("id"), col("comp")).persist()
    var converged = false
    var i = 0
    while (!converged && i < maxIter) {
      // candidate for each vertex: the smallest neighbor label (+ its own)
      val viaNeighbors = undirected
        .join(labels, undirected("b") === labels("id"))
        .select(col("a").as("id"), col("comp"))
      // convergence check IN the propagation round (saves the extra
      // confirmation round a sum-fixpoint needs): the own-label branch of
      // the union is tagged with the vertex's PREVIOUS label (`own`);
      // every id has exactly one tagged row, so after the min-aggregation
      // `comp < own` ⇔ this round lowered the label. One integer-exact
      // scalar per round reaches the driver, same as before.
      val viaSelf = labels.select(col("id"), col("comp"))
        .withColumn("own", col("comp"))
      // LAZY checkpoint: the changed-count action right below
      // materializes it, so an eager checkpoint would run a second job
      val next = graft.Caching.checkpoint(
        viaNeighbors.withColumn("own", lit(null).cast("long"))
          .union(viaSelf)
          .groupBy("id").agg(min("comp").as("comp"), min("own").as("own")),
        eager = false) // truncate lineage every round; count() below runs it
      val changed = Option(next
        .agg(sum(when(col("comp") < col("own"), 1L).otherwise(0L)))
        .head().get(0)).map(_.asInstanceOf[Long]).getOrElse(0L)
      labels.unpersist()
      labels = next.select("id", "comp")
      converged = changed == 0L
      i += 1
    }
    if (!converged)
      // returning partially-propagated labels would silently split one
      // true component into several "groups" — fail loudly instead
      throw new IllegalStateException(
        s"connectedComponents did not converge within $maxIter rounds — " +
          "the graph's diameter exceeds the budget; raise maxIter")
    (labels, i)
  }

  /** Alternating large-star/small-star connected components (the
    * two-phase MapReduce algorithm of Kiveris et al., "Connected
    * Components in MapReduce and Beyond", SoCC'14 — public literature):
    * min-label propagation above costs O(diameter) rounds, so a
    * chain-heavy graph (near-dup docs often chain A~B~C~… through
    * borderline pairs) pays the chain length; star alternation contracts
    * components to stars centered at their minimum in O(log n) rounds
    * regardless of diameter.
    *
    * Per round, each one distinct + aggregation + join (same shuffle
    * class as a min-label round):
    *  - LARGE-STAR: every node's strictly-larger neighbors re-attach to
    *    `m = min(Γ⁺(u))` — long tails fold toward minima;
    *  - SMALL-STAR: every node's smaller-or-equal neighbors (plus the
    *    node) re-attach to that minimum — stars flatten.
    *
    * Fixpoint = every edge is (v, component-min), read off directly as
    * the label frame. Same API and output contract as
    * [[connectedComponents]] (ComponentsSpec property-pins equivalence
    * on random graphs); same lazy `localCheckpoint` lineage hygiene; the
    * only driver-side values per round are two counts. Measured
    * head-to-head on the SCALE.md corpora — star wins on chains
    * (rounds ~log n vs ~n), min-label wins slightly on the star-like
    * duplicate clusters real corpora produce, which is why min-label
    * stays the [[resolveDuplicates]] default. */
  def connectedComponentsStar(edges: DataFrame, maxIter: Int = 32)
      : DataFrame =
    starWithRounds(edges, maxIter)._1

  private[graft] def starWithRounds(edges: DataFrame, maxIter: Int = 32)
      : (DataFrame, Int) = {
    val Array(sc, dc) = edges.columns
    var e = edges.select(col(sc).cast("long").as("x"),
        col(dc).cast("long").as("y"))
      .filter(col("x") =!= col("y"))
      .select(greatest(col("x"), col("y")).as("hi"),
        least(col("x"), col("y")).as("lo"))
      .distinct()
    // eager checkpoint for the same reason as minLabelWithRounds: the
    // round-0 edge frame must never re-derive the caller's upstream
    // plan if storage is evicted mid-iteration
    e = graft.Caching.checkpoint(e)
    var eCount = e.count()
    var converged = false
    var i = 0
    while (!converged && i < maxIter) {
      // LARGE-STAR: for each node u, strictly-larger neighbors v attach
      // to m = min(Γ(u) ∪ {u}). Each canonical edge is emitted exactly
      // once (by its smaller endpoint's group), so no distinct blowup.
      val nbrs = e.select(col("hi").as("u"), col("lo").as("v"))
        .union(e.select(col("lo").as("u"), col("hi").as("v")))
      val mins = nbrs.groupBy("u").agg(min("v").as("mn"))
        .select(col("u"), least(col("u"), col("mn")).as("m"))
      val large = nbrs.join(mins, "u").filter(col("v") > col("u"))
        .select(col("v").as("hi"), col("m").as("lo"))
        .distinct()
      // SMALL-STAR: keyed on the larger endpoint; its smaller neighbors
      // (and itself) attach to their minimum.
      val smallN = large.select(col("hi").as("u"), col("lo").as("v"))
      val mins2 = smallN.groupBy("u").agg(min("v").as("m"))
      val next = graft.Caching.checkpoint(
        smallN.join(mins2, "u").filter(col("v") =!= col("m"))
          .select(col("v").as("hi"), col("m").as("lo"))
          .union(mins2.select(col("u").as("hi"), col("m").as("lo")))
          .distinct(),
        eager = false) // truncate lineage every round
        .persist()
      val nextCount = next.count()
      converged = nextCount == eCount && next.except(e).isEmpty
      e.unpersist()
      e = next
      eCount = nextCount
      i += 1
    }
    if (!converged)
      throw new IllegalStateException(
        s"connectedComponentsStar did not converge within $maxIter " +
          "rounds — raise maxIter (O(log n) expected)")
    // fixpoint: e is a star forest (v, component-min); centers label
    // themselves
    val labels = e.select(col("hi").as("id"), col("lo").as("comp"))
      .union(e.select(col("lo").as("id"), col("lo").as("comp")).distinct())
    (labels, i)
  }

  /** Full dedup resolution: candidate pairs → per-document verdict.
    * Returns (id, keeper): every id in a duplicate group points at the
    * group's smallest id (keeper == id for the keeper itself).
    *
    * r14 (optimization round): memoized per (canonicalized pairs plan,
    * schema) for the session epoch — the Dedup.bandGraph discipline.
    * The CC fixpoint runs DRIVER-SIDE jobs at build time, so without the
    * memo every re-build of the same query re-ran the whole loop (the
    * q_semdedup probe spent 1.3 s of its 1.4 s median there). The memo
    * clears with Caching.releaseAll, so a resolution can never outlive
    * the checkpoint blocks it is built on. */
  def resolveDuplicates(pairs: DataFrame): DataFrame = {
    if (!hooked) synchronized {
      if (!hooked) {
        graft.Caching.onReleaseAll(() => resolved.clear())
        hooked = true
      }
    }
    val key = (pairs.queryExecution.analyzed.canonicalized, pairs.schema)
    resolved.computeIfAbsent(key, _ => {
      val cc = connectedComponents(pairs)
      cc.select(col("id"), col("comp").as("keeper"))
    })
  }

  private val resolved = new java.util.concurrent.ConcurrentHashMap[
    (org.apache.spark.sql.catalyst.plans.logical.LogicalPlan,
      org.apache.spark.sql.types.StructType), DataFrame]()
  @volatile private var hooked = false

  /** BLOCK-LOCAL dedup resolution (r15, guide §2 "remove the shuffle
    * loop when the data is already partitioned as needed"): when every
    * edge is confined to a block (both endpoints share the block
    * columns — q_semdedup's pairs join requires label and sub equal, and
    * each vertex belongs to exactly ONE (label, sub)), connected
    * components can NEVER span blocks, so the global O(diameter)
    * fixpoint — with its per-round join + aggregation + driver-side
    * count barrier — collapses to ONE aggregation: group the edges by
    * block and run an in-memory union-find per block. Per-block edge
    * volume is bounded by the caller's blocking cap (subclusterByCap:
    * block size ≤ max(32, ceil(√n)), so ≤ n edges per block — the same
    * Θ(n^1.5) budget SCALE.md already grants the pairs join that FEEDS
    * this), so the collect_list buffer is as bounded as the join output
    * itself. Union-find keeps the smaller root, so the emitted keeper is
    * the component minimum — EXACTLY [[resolveDuplicates]]' contract
    * (ComponentsSpec pins the equivalence on the fixture pairs and on
    * random blocked graphs); vertices in no edge are not emitted, also
    * as in [[resolveDuplicates]].
    *
    * Scale note: this is a Scala UDF (off-codegen) over a grouped edge
    * list — the trade is deliberate: one exchange of (block, a, b)
    * triples replaces `rounds` global shuffles PLUS `rounds` driver
    * round-trips of the label frame, and the UDF's O(E α(V)) per block
    * beats re-scanning the edge frame once per round long before any
    * interpreter overhead matters.
    *
    * @param pairs     edge frame carrying `blockCols` ++ (src, dst)
    * @return (id, keeper) exactly as [[resolveDuplicates]] */
  def resolveDuplicatesBlocked(pairs: DataFrame, src: String, dst: String,
      blockCols: Seq[String]): DataFrame = {
    require(blockCols.nonEmpty, "blocked resolution needs block columns")
    val ccUdf = udf((es: Seq[org.apache.spark.sql.Row]) => {
      val parent = scala.collection.mutable.LongMap.empty[Long]
      def find(x: Long): Long = {
        var r = x
        while (parent.getOrElse(r, r) != r) r = parent(r)
        var c = x // path compression
        while (parent.getOrElse(c, c) != r) { val n = parent(c); parent(c) = r; c = n }
        r
      }
      es.foreach { e =>
        val a = e.getLong(0); val b = e.getLong(1)
        parent.getOrElseUpdate(a, a); parent.getOrElseUpdate(b, b)
        val ra = find(a); val rb = find(b)
        // smaller root wins → the final root of every tree is the
        // component's minimum id (keeper contract)
        if (ra < rb) parent(rb) = ra else if (rb < ra) parent(ra) = rb
      }
      parent.keys.toArray.sorted.map(id => (id, find(id)))
    })
    pairs
      .groupBy(blockCols.map(col): _*)
      .agg(collect_list(struct(col(src).cast("long"),
        col(dst).cast("long"))).as("__es"))
      .select(explode(ccUdf(col("__es"))).as("__kv"))
      .select(col("__kv._1").as("id"), col("__kv._2").as("keeper"))
  }
}
