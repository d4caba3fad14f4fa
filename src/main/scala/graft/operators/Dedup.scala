package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.MinHashAgg

/** Deduplication operators for corpus-scale pipelines (SURVEY §2.10 L1/L2).
  *
  * These are the xxhash/FNV scale-path implementations exposed as reusable
  * plan builders; the md5-flavored `q_*` declared queries exist because
  * their hashes must be reproducible inside DuckDB for the oracle. Shapes:
  *
  *  - exact: one shuffle keyed on a 256-bit content hash — skew-free.
  *  - minhashLsh: shingle → k-wide signature (single aggregation pass,
  *    map-side combinable) → band buckets → candidate pairs only where a
  *    band collides. Sub-quadratic; the shuffle carries one signature per
  *    doc plus one row per (doc, band).
  *  - simhash: 64-bit signature per doc; near-dup = small Hamming
  *    distance. One explode over tokens, two aggregations.
  */
object Dedup {
  /** Exact dedup: one keeper (min id) per identical content. */
  def exact(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.withColumn("__h", sha2(col(textCol), 256))
      .groupBy(col("__h").as("content_hash"))
      .agg(min(idCol).as("keeper"), count(lit(1)).as("dups"))

  /** Word n-gram shingles: (id, gram) rows via posexplode + lead —
    * codegen-friendly (no higher-order functions). */
  def shingles(df: DataFrame, idCol: String, textCol: String, n: Int)
      : DataFrame = {
    val w = Window.partitionBy(idCol).orderBy("__pos")
    // r15 (guide §2.3/§2.5): fan the DOC rows out on the id BEFORE the
    // explode — the window below needs hash(idCol) distribution anyway,
    // so this moves the one exchange from the exploded token stream to
    // the raw doc rows (fewer bytes) and parallelizes the explode map
    // on a single-file scan. Identity on an already-parallel scan.
    val tok = graft.Tables.fanout(df, idCol).select(col(idCol),
      posexplode(split(col(textCol), " ")).as(Seq("__pos", "__w")))
    val withLeads = (1 until n).foldLeft(tok)((d, i) =>
      d.withColumn(s"__w$i", lead(col("__w"), i).over(w)))
    withLeads.filter(col(s"__w${n - 1}").isNotNull)
      .select(col(idCol),
        concat_ws(" ", (col("__w") +: (1 until n).map(i => col(s"__w$i"))): _*)
          .as("gram"))
      .distinct()
  }

  /** MinHash-LSH candidate pairs: docs whose signatures collide in at
    * least one of `bands` bands (k hashes total, k % bands == 0). Returns
    * (id_a, id_b, n_bands) with id_a < id_b. These are CANDIDATES — before
    * deleting against them, either require a high `n_bands` (n_bands ==
    * bands ≈ exact/near-exact duplicates) or verify with exact shingle
    * Jaccard; feeding raw candidates to [[Components.resolveDuplicates]]
    * clusters merely-similar documents too. */
  def minhashLsh(df: DataFrame, idCol: String, textCol: String,
      shingleN: Int = 3, k: Int = 64, bands: Int = 16): DataFrame = {
    require(k % bands == 0, "bands must divide k")
    val rowsPerBand = k / bands
    val sig = udaf(new MinHashAgg(k))
    val sigs = shingles(df, idCol, textCol, shingleN)
      .groupBy(idCol).agg(sig(col("gram")).as("sig"))
    val banded = sigs.select(col(idCol),
      posexplode(transform(sequence(lit(0), lit(bands - 1)),
        b => slice(col("sig"), b * rowsPerBand + 1, lit(rowsPerBand))))
        .as(Seq("band", "band_sig")))
    banded.as("a").join(banded.as("b"),
        col("a.band") === col("b.band") &&
        col("a.band_sig") === col("b.band_sig") &&
        col(s"a.$idCol") < col(s"b.$idCol"))
      .groupBy(col(s"a.$idCol").as("id_a"), col(s"b.$idCol").as("id_b"))
      .agg(count(lit(1)).as("n_bands"))
  }

  /** Exact-Jaccard verification of candidate pairs: computes the true
    * shingle Jaccard for ONLY the candidate pairs (never all-pairs) and
    * keeps those ≥ `threshold`. The standard second stage after
    * [[minhashLsh]]; its output is safe to feed to
    * [[Components.resolveDuplicates]].
    *
    * Storage note: the shingle frame is cached via [[graft.Caching]] (it
    * feeds the size aggregate and both pair joins — 3 uses; measured 4.6×
    * on the bench). The registry shares ONE entry across repeated calls
    * with the same inputs and `graft.Caching.releaseAll()` drops it —
    * long-lived hosts call that between queries. */
  def verifyJaccard(pairs: DataFrame, df: DataFrame, idCol: String,
      textCol: String, shingleN: Int, threshold: Double): DataFrame = {
    val g = graft.Caching.cache(shingles(df, idCol, textCol, shingleN))
    val sizes = g.groupBy(idCol).agg(count(lit(1)).as("__n"))
    val p = pairs.select(col("id_a"), col("id_b"))
    val inter = p
      .join(g.select(col(idCol).as("id_a"), col("gram")), "id_a")
      .join(g.select(col(idCol).as("id_b"), col("gram").as("__g2")), "id_b")
      .filter(col("gram") === col("__g2"))
      .groupBy("id_a", "id_b").agg(count(lit(1)).as("__i"))
    p.join(inter, Seq("id_a", "id_b"), "left")
      .na.fill(0L, Seq("__i"))
      .join(sizes.select(col(idCol).as("id_a"), col("__n").as("__na")), "id_a")
      .join(sizes.select(col(idCol).as("id_b"), col("__n").as("__nb")), "id_b")
      .withColumn("jaccard", col("__i").cast("double") /
        (col("__na") + col("__nb") - col("__i")))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }

  /** 64-bit SimHash signature per document — ONE aggregation pass with 64
    * sign-sum columns (map-side combinable), no per-bit explode: the
    * explode form pushed 64× the token count through the shuffle and was
    * the measured bottleneck at a 20× corpus scale-up. */
  def simhash(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    // r15: same fanout rationale as shingles — the groupBy(idCol)
    // needs hash(idCol) anyway; exchange raw docs, explode in parallel
    val tok = graft.Tables.fanout(df, idCol).select(col(idCol),
        explode(split(col(textCol), " ")).as("__w"))
      .withColumn("__h", xxhash64(col("__w")))
    val bitSums = (0 until 64).map(i =>
      sum(when(expr(s"shiftright(__h, $i) & 1") === 1, 1).otherwise(-1))
        .as(s"__b$i"))
    tok.groupBy(idCol).agg(bitSums.head, bitSums.tail: _*)
      .select(col(idCol),
        (0 until 64).map(i =>
          when(col(s"__b$i") > 0, lit(1L << i)).otherwise(0L))
          .reduce(_ + _).as("simhash"))
  }

  /** Hamming distance between two 64-bit signatures (for simhash pairs). */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** The shared near-dup band graph (r14, verdict #2): ONE band
    * self-join, many readouts. Seven of the library's dedup/graph
    * queries (resolve, keep-best, cluster histogram, split-leakage,
    * source-overlap matrix, degree power-law, PageRank) and the
    * triangle counter all consume the same md5-minhash band-collision
    * graph; built independently, each pays the gram→minhash→band
    * pipeline plus the band self-join (~0.8–1.2 s at sf0.1 each — and
    * at 100 TB, a full corpus pass each). A real pipeline materializes
    * the graph ONCE. [[Dedup.bandGraph]] memoizes per (canonicalized
    * docs plan, schema), so any number of consumers composed in one
    * session share:
    *
    *  - [[bands]]   (doc_id, band, band_sig) — cached;
    *  - [[edges]]   (da, db), da < db, distinct — the candidate-pair
    *                frame, cached (band-equi join, never all-pairs);
    *  - [[components]] (id, comp) — connected components over the
    *                edges, computed on FIRST touch (the CC loop runs
    *                jobs; lazy so edge-only consumers never pay it)
    *                and then shared;
    *  - [[resolution]] (id, keeper) — the deletion verdict frame.
    *
    * Lifecycle: all four ride [[graft.Caching]]; `releaseAll()` drops
    * the blocks AND this registry (a clear hook), so a stale graph can
    * never hand out frames over released storage. Do not hold a
    * BandGraph reference across a releaseAll — re-call bandGraph. */
  final class BandGraph private[operators] (docs: DataFrame) {
    val bands: DataFrame =
      graft.Caching.cache(graft.queries.TextOps.bandRows(docs))
    // r14 (optimization round): the edge frame is a CHECKPOINT, not a
    // cache — lineage truncation makes it a leaf, so the nine consumers'
    // plans (triangles' three-way self-join, pagerank's matvec, the
    // dedup readouts) stop carrying — and re-analyzing/re-canonicalizing
    // — the whole minhash pipeline on every build (q_triangles spent
    // ~0.7 s of driver time per run there). Also closes the r12
    // eviction-recompute class for every edge consumer, not just the
    // iterating ones.
    val edges: DataFrame = graft.Caching.checkpoint(
      bands.as("a").join(bands.as("b"),
          col("a.band") === col("b.band") &&
          col("a.band_sig") === col("b.band_sig") &&
          col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("da"), col("b.doc_id").as("db"))
        .distinct())
    lazy val components: DataFrame =
      Components.connectedComponents(edges)
    lazy val resolution: DataFrame =
      components.select(col("id"), col("comp").as("keeper"))
  }

  private val graphs = new java.util.concurrent.ConcurrentHashMap[
    (org.apache.spark.sql.catalyst.plans.logical.LogicalPlan,
      org.apache.spark.sql.types.StructType), BandGraph]()
  @volatile private var hooked = false

  /** Memoized [[BandGraph]] over a documents-shaped frame (doc_id,
    * text, …): repeated calls with a structurally identical input plan
    * return the SAME graph, so its band self-join and component
    * fixpoint run once per session epoch (epoch = until
    * `Caching.releaseAll()`). */
  def bandGraph(docs: DataFrame): BandGraph = {
    if (!hooked) synchronized {
      if (!hooked) {
        graft.Caching.onReleaseAll(() => graphs.clear())
        hooked = true
      }
    }
    // schema joins the key for the same reason as Caching's registry:
    // canonicalization normalizes attribute names away
    val key = (docs.queryExecution.analyzed.canonicalized, docs.schema)
    graphs.computeIfAbsent(key, _ => new BandGraph(docs))
  }
}
