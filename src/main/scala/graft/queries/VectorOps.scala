package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.GraftFunctions

/** T4 — similarity search over the `embeddings` table (SURVEY §2.10 L3).
  *
  * The kernel is [[graft.functions.CosineSimilarity]] — a custom Catalyst
  * expression with whole-stage codegen (one fused primitive loop, no
  * intermediate arrays; ~8× the throughput of the zip_with/aggregate
  * composition it replaced). Oracles reproduce identical double math in
  * DuckDB with explicit per-index sums, deliberately NOT DuckDB's float32
  * `list_cosine_similarity` (float32 rounding would break hash parity at
  * the 4-dp rounding boundary).
  *
  * Scale path (100 TB): brute-force top-k broadcasts the query vector and
  * is one scan + TakeOrdered; near-dup pairs are blocked (label here; LSH
  * buckets in general) so the join is sub-quadratic; IVF restricts the
  * scan to the best cluster — same plans, bigger constants.
  */
object VectorOps {
  private def T(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.table(s, dir, n)

  private def cos(a: String, b: String): Column =
    expr(s"cosine_sim($a, $b)")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // L3 — brute-force cosine top-k against one query vector (vec_id 0).
    // The 1-row query side is broadcast; no collect, no shuffle of the
    // candidate scan; LIMIT plans as TakeOrderedAndProject.
    "q_cosine_topk" -> ((s, dir) => {
      GraftFunctions.register(s)
      val e = T(s, dir, "embeddings")
      val q = e.filter(col("vec_id") === 0)
        .select(col("embedding").as("qv"))
      e.filter(col("vec_id") =!= 0)
        .crossJoin(broadcast(q))
        .select(col("vec_id"), round(cos("embedding", "qv"), 4).as("cs"))
        .orderBy(desc("cs"), asc("vec_id"))
        .limit(10)
    }),

    // MMR diversified top-k (r12; Carbonell & Goldstein, SIGIR 1998):
    // from the C=8 most query-relevant vectors, greedily pick k=4
    // maximizing λ·rel − (1−λ)·max-sim-to-already-picked (λ = 0.7) —
    // the standard redundancy-aware reranker a curation/retrieval
    // pipeline runs AFTER the ANN stage so near-duplicate hits don't
    // crowd the result list. Plan: the corpus is touched once by the
    // broadcast-query scoring scan ending in TakeOrdered(C); the C×C
    // candidate similarity matrix is a broadcast self-join (56 rows);
    // the greedy then runs on the driver over those C rows (the
    // k-means/BPE bounded-collect discipline — C and k are literals,
    // the collect is constant-size at any corpus scale). Determinism:
    // rel and sims round at 4 dp BEFORE the greedy; both engines
    // evaluate λ·rel − (1−λ)·maxsim from identical rounded doubles
    // (bit-identical IEEE), ties break to the lower vec_id; the oracle
    // unrolls the same greedy as k−1 argmax CTE rounds. Streaming
    // stance: MMR is per-query reranking, not a standing computation —
    // it runs inside each query's request path (the candidate scan is
    // the only corpus touch, servable by the maintained ANN index).
    "q_mmr_topk" -> ((s, dir) => {
      import s.implicits._
      GraftFunctions.register(s)
      val e = T(s, dir, "embeddings")
      val qv = e.filter(col("vec_id") === 0)
        .select(col("embedding").as("qv"))
      val cand = graft.Caching.cache(
        e.filter(col("vec_id") =!= 0)
          .crossJoin(broadcast(qv))
          .select(col("vec_id"), col("embedding"),
            fround(cos("embedding", "qv"), 4).as("rel"))
          .orderBy(desc("rel"), asc("vec_id")).limit(8))
      val sims = cand
        .select(col("vec_id").as("a"), col("embedding").as("ea"))
        .join(broadcast(cand.select(col("vec_id").as("b"),
          col("embedding").as("eb"))), col("a") =!= col("b"))
        .select(col("a"), col("b"), fround(cos("ea", "eb"), 4).as("sim"))
      // r14: both collects are C=8-bounded driver values — epoch-memoized.
      // r15 (ADVICE r14 #3): the key carries the parameterization (query
      // vec_id 0, candidate budget 8) so a future caller with different
      // parameters can never collide into this entry within an epoch.
      val (simMap, remaining0) =
        graft.Caching.memoEpoch(("mmrInputs", s, dir, 0L, 8)) {
          (sims.collect()
            .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2))
            .toMap,
            cand.select("vec_id", "rel").collect()
              .map(r => r.getLong(0) -> r.getDouble(1)).toList)
        }
      var remaining = remaining0
      val picked =
        scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Double,
          Double)]
      var selected = List.empty[Long]
      for (rk <- 1 to 4 if remaining.nonEmpty) {
        val best = remaining.map { case (id, rel) =>
          val mmr =
            if (selected.isEmpty) rel
            else 0.7 * rel -
              0.3 * selected.map(sid => simMap((id, sid))).max
          (id, rel, mmr)
        }.minBy { case (id, _, mmr) => (-mmr, id) }
        picked += ((rk.toLong, best._1, best._2,
          math.floor(best._3 * 1e4 + 0.5) / 1e4))
        selected = best._1 :: selected
        remaining = remaining.filterNot(_._1 == best._1)
      }
      picked.toSeq.toDF("rk", "vec_id", "rel", "mmr").orderBy("rk")
    }),

    // L3h (r12) — HARD-NEGATIVE mining: for each of the 40 budget
    // queries (q_ann_recall's fixed TakeOrdered sample), the single most
    // similar vector with a DIFFERENT label — the contrastive-training
    // negative a retrieval/embedding pipeline mines per anchor (the
    // near-miss that teaches the boundary). Plan: query side broadcast,
    // base never shuffled, the label inequality filters map-side, and
    // the per-query argmax is ONE max_by aggregation (map-combined — no
    // window, no sort) on the shared (cs DESC, vec_id ASC) determinism
    // grid. O(Q·n) like the recall audits.
    "q_hard_negatives" -> ((s, dir) => {
      GraftFunctions.register(s)
      val e = T(s, dir, "embeddings")
      val q = e.orderBy(asc("vec_id")).limit(40)
        .select(col("vec_id").as("qid"), col("label").as("qlabel"),
          col("embedding").as("qv"))
      e.crossJoin(broadcast(q))
        .filter(col("label") =!= col("qlabel"))
        .select(col("qid"), col("vec_id"), col("label"),
          round(cos("embedding", "qv"), 4).as("cs"))
        .groupBy("qid")
        .agg(max_by(struct(col("vec_id"), col("label"), col("cs")),
          struct(col("cs"), -col("vec_id"))).as("neg"))
        .select(col("qid"), col("neg.vec_id").as("vec_id"),
          col("neg.label").cast("long").as("label"), col("neg.cs").as("cs"))
        .orderBy("qid")
    }),

    // L3f — Matryoshka-style two-stage retrieval (r8): coarse top-50 on
    // the PREFIX 16 dims (an MRL-truncated embedding — Kusupati et al.
    // 2022, "Matryoshka Representation Learning"), then a full 64-dim
    // rerank to top-10. The coarse stage scores a quarter of the vector
    // per candidate and is the only full-scan pass; just 50 rows reach
    // the full-width kernel. At 100 TB this is the standard
    // cheap-filter/exact-rerank split — the coarse column could even be
    // stored as its own (pruned) parquet column so the scan never reads
    // the full vectors. Both stages rank on the 4-dp-rounded score with
    // vec_id tie-break (deterministic across engines).
    "q_mrl_topk" -> ((s, dir) => {
      GraftFunctions.register(s)
      val e = T(s, dir, "embeddings")
      val q = e.filter(col("vec_id") === 0)
        .select(col("embedding").as("qv"),
          slice(col("embedding"), 1, 16).as("qv16"))
      val coarse = e.filter(col("vec_id") =!= 0)
        .crossJoin(broadcast(q))
        .select(col("vec_id"), col("embedding"), col("qv"),
          round(expr("cosine_sim(slice(embedding, 1, 16), qv16)"), 4)
            .as("cs16"))
        .orderBy(desc("cs16"), asc("vec_id"))
        .limit(50)
      coarse
        .select(col("vec_id"), col("cs16"),
          round(cos("embedding", "qv"), 4).as("cs"))
        .orderBy(desc("cs"), asc("vec_id"))
        .limit(10)
    }),

    // L3g (r11) — HYBRID retrieval via Reciprocal Rank Fusion (Cormack,
    // Clarke & Buettcher 2009, public — the standard dense+lexical
    // combiner in RAG/search stacks): the dense arm ranks by cosine to
    // item 0's embedding, the lexical arm by Okapi BM25 against item
    // 0's token set (q_bm25's exact scorer, summed over the query
    // terms), and each doc's fused score is Σ 1/(60 + rank_arm) over
    // the arms that retrieved it (missing arm contributes 0 — RRF's
    // defining property: no score calibration between arms, ranks
    // only). Scale shape: both arms end in a rank-limited top-100
    // (TakeOrdered, never a global sort of the corpus); ranks come
    // from operators.Ranking's window-FREE global row number over the
    // 100-row frames; the fusion join is 100×100 at most, independent
    // of corpus size. The lexical model (df/avgdl) is the corpus-wide
    // broadcast constant frame q_bm25 already uses; query terms are a
    // broadcast semi-side. Ranks rank on the ROUNDED scores with
    // doc_id tie-break, so both engines see identical orders.
    "q_rrf_fusion" -> ((s, dir) => {
      GraftFunctions.register(s)
      val e = T(s, dir, "embeddings")
      val d = T(s, dir, "documents")
      val q = e.filter(col("vec_id") === 0)
        .select(col("embedding").as("qv"))
      val dense = e.filter(col("vec_id") =!= 0)
        .crossJoin(broadcast(q))
        .select(col("vec_id").as("doc_id"),
          round(cos("embedding", "qv"), 4).as("cs"))
        .orderBy(desc("cs"), asc("doc_id")).limit(100)
      val dr = graft.operators.Ranking
        .withGlobalRank(dense, "rd", desc("cs"), asc("doc_id"))
        .select("doc_id", "rd")
      // lexical arm — q_bm25's scorer (k1=1.2, b=0.75, Lucene +1 idf),
      // restricted to doc 0's terms and summed per candidate doc
      val tf = graft.Caching.cache(
        graft.Tables.fanout(d, "doc_id") // r15: parallel tokenize map
          .select(col("doc_id"),
            explode(split(lower(col("text")), " ")).as("w"))
        .groupBy("doc_id", "w").agg(count(lit(1)).as("tf")))
      val qterms = tf.filter(col("doc_id") === 0).select("w")
      val dfreq = tf.groupBy("w").agg(count(lit(1)).as("df"))
      val dl = tf.groupBy("doc_id").agg(sum("tf").as("dl"))
      val corpus = dl.select(count(lit(1)).as("n"),
        (sum("dl").cast("double") / count(lit(1))).as("avgdl"))
      val idf = log(lit(1.0) +
        (col("n") - col("df") + lit(0.5)) / (col("df") + lit(0.5)))
      val tfPart = col("tf") * lit(2.2) /
        (col("tf") + lit(1.2) * (lit(0.25) + lit(0.75) * col("dl") / col("avgdl")))
      val lex = tf.filter(col("doc_id") =!= 0)
        .join(broadcast(qterms), "w")
        .join(dfreq, "w").join(dl, "doc_id")
        .crossJoin(broadcast(corpus))
        .withColumn("s1", fround(idf * tfPart, 4))
        .groupBy("doc_id").agg(fround(sum("s1"), 4).as("bs"))
        .orderBy(desc("bs"), asc("doc_id")).limit(100)
      val lr = graft.operators.Ranking
        .withGlobalRank(lex, "rl", desc("bs"), asc("doc_id"))
        .select("doc_id", "rl")
      dr.join(lr, Seq("doc_id"), "full_outer")
        .withColumn("rrf", fround(
          coalesce(lit(1.0) / (lit(60) + col("rd")), lit(0.0)) +
            coalesce(lit(1.0) / (lit(60) + col("rl")), lit(0.0)), 6))
        .select(col("doc_id"), col("rd"), col("rl"), col("rrf"))
        .orderBy(desc("rrf"), asc("doc_id"))
        .limit(20)
    }),

    // Near-dup pairs, blocked by label (stand-in for an LSH bucket): only
    // within-block pairs are scored — sub-quadratic at scale.
    "q_embed_neardup" -> ((s, dir) => {
      GraftFunctions.register(s)
      val e = T(s, dir, "embeddings")
      val a = e.select(col("vec_id").as("ia"), col("label"),
        col("embedding").as("va"))
      val b = e.select(col("vec_id").as("ib"), col("label").as("lb"),
        col("embedding").as("vb"))
      a.join(b, col("label") === col("lb") && col("ia") < col("ib"))
        .select(col("ia"), col("ib"), round(cos("va", "vb"), 4).as("cs"))
        .orderBy(desc("cs"), asc("ia"), asc("ib"))
        .limit(20)
    }),

    // IVF-style ANN: coarse quantizer = per-label centroid (deterministic
    // stand-in for k-means); probe the best cluster only, then exact
    // cosine within it. Demonstrates the two-stage ANN plan shape.
    "q_ann_ivf" -> ((s, dir) => {
      GraftFunctions.register(s)
      val e = T(s, dir, "embeddings")
      val cents = e
        .select(col("label"),
          posexplode(transform(col("embedding"), _.cast("double")))
            .as(Seq("pos", "x")))
        .groupBy("label", "pos")
        .agg(avg("x").as("cx"))
        .groupBy("label")
        .agg(transform(array_sort(collect_list(struct(col("pos"), col("cx")))),
          p => p.getField("cx")).as("cv"))
      val q = e.filter(col("vec_id") === 0).select(col("embedding").as("qv"))
      val qd = q.select(transform(col("qv"), _.cast("double")).as("qvd"))
      val best = cents.crossJoin(broadcast(qd))
        .select(col("label"), cos("cv", "qvd").as("ccs"))
        .orderBy(desc("ccs"), asc("label"))
        .limit(1)
        .select(col("label").as("best_label"))
      e.filter(col("vec_id") =!= 0)
        .join(broadcast(best), col("label") === col("best_label"))
        .crossJoin(broadcast(q))
        .select(col("vec_id"), col("label").cast("long").as("label"),
          round(cos("embedding", "qv"), 4).as("cs"))
        .orderBy(desc("cs"), asc("vec_id"))
        .limit(10)
    }),

    // ANN RECALL@10 (r11) — the acceptance metric every approximate
    // index deployment reports: per query (every 50th vec_id), the
    // exact brute-force top-10 is the ground truth and the IVF
    // restriction (candidates only from the query's best centroid
    // cell) is the candidate set; recall = |IVF ∩ truth| / |truth|.
    // Both rankings run on the 4-dp-rounded cosine with vec_id
    // tiebreak (the shared determinism discipline), so the sets are
    // bit-identical cross-engine and recall is EXACT — this is the
    // measurement that justifies (or vetoes) shipping the IVF path at
    // 100 TB, computed by the engine itself. Plan: one brute scored
    // frame (query side broadcast, base never shuffled) feeds both the
    // truth ranking and — filtered by the broadcast best-cell frame —
    // the IVF ranking; the intersection joins two |q|·10-row frames.
    "q_ann_recall" -> ((s, dir) => {
      GraftFunctions.register(s)
      val e = T(s, dir, "embeddings")
      // FIXED query budget (r12): the 40 lowest vec_ids — a TakeOrdered,
      // never a scan fraction — so the brute-force truth side is O(Q·n)
      // with Q a driver constant and the query broadcast is constant-size
      // at ANY corpus scale (the audit SCALE.md describes, now as written)
      val q = e.orderBy(asc("vec_id")).limit(40)
        .select(col("vec_id").as("qid"), col("embedding").as("qv"))
      // per-label mean centroids (the q_ann_ivf trainer frame)
      val cents = e
        .select(col("label"),
          posexplode(transform(col("embedding"), _.cast("double")))
            .as(Seq("pos", "x")))
        .groupBy("label", "pos")
        .agg(avg("x").as("cx"))
        .groupBy("label")
        .agg(transform(array_sort(collect_list(struct(col("pos"), col("cx")))),
          p => p.getField("cx")).as("cv"))
      val wBest = Window.partitionBy("qid")
        .orderBy(desc("ccs"), asc("label"))
      val best = q.crossJoin(broadcast(cents))
        .withColumn("qvd",
          transform(col("qv"), (x: Column) => x.cast("double")))
        .select(col("qid"), col("label"),
          fround(cos("cv", "qvd"), 6).as("ccs"))
        .withColumn("rn", row_number().over(wBest))
        .filter(col("rn") === 1)
        .select(col("qid").as("bqid"), col("label").as("best_label"))
      val scored = graft.Caching.cache(e.crossJoin(broadcast(q))
        .filter(col("vec_id") =!= col("qid"))
        .select(col("qid"), col("vec_id"), col("label"),
          round(cos("embedding", "qv"), 4).as("cs")))
      val wq = Window.partitionBy("qid").orderBy(desc("cs"), asc("vec_id"))
      val truth = scored.withColumn("rn", row_number().over(wq))
        .filter(col("rn") <= 10).select("qid", "vec_id")
      val ivf = scored
        .join(broadcast(best), col("qid") === col("bqid") &&
          col("label") === col("best_label"))
        .withColumn("rn", row_number().over(wq))
        .filter(col("rn") <= 10).select("qid", "vec_id")
      truth.join(ivf, Seq("qid", "vec_id"), "left_semi")
        .groupBy("qid").agg(count(lit(1)).as("hits"))
        .join(truth.groupBy("qid").agg(count(lit(1)).as("n_true")),
          Seq("qid"), "right")
        .select(col("qid"), coalesce(col("hits"), lit(0L)).as("hits"),
          col("n_true"),
          fround(coalesce(col("hits"), lit(0L)).cast("double") /
            col("n_true"), 4).as("recall"))
        .orderBy("qid")
    }),

    // Recall vs nprobe (r11) — the IVF TUNING curve: q_ann_recall's
    // measurement repeated per probe depth (nprobe ∈ {1, 2, 4} best
    // cells) so the readout is the actual knob an operator turns:
    // recall@10 must be monotone in nprobe by construction (candidate
    // sets nest), and the mean across queries per nprobe is the curve
    // dashboards plot. Same cached brute-scored frame feeds the truth
    // and ALL probe depths — the probe restriction is a broadcast
    // (qid, label) semi filter, so adding a depth adds no scan.
    "q_recall_nprobe" -> ((s, dir) => {
      GraftFunctions.register(s)
      val e = T(s, dir, "embeddings")
      // same FIXED 40-query budget as q_ann_recall (O(Q·n) truth side)
      val q = e.orderBy(asc("vec_id")).limit(40)
        .select(col("vec_id").as("qid"), col("embedding").as("qv"))
      val cents = e
        .select(col("label"),
          posexplode(transform(col("embedding"), _.cast("double")))
            .as(Seq("pos", "x")))
        .groupBy("label", "pos")
        .agg(avg("x").as("cx"))
        .groupBy("label")
        .agg(transform(array_sort(collect_list(struct(col("pos"), col("cx")))),
          p => p.getField("cx")).as("cv"))
      val wBest = Window.partitionBy("qid")
        .orderBy(desc("ccs"), asc("label"))
      val ranked = q.crossJoin(broadcast(cents))
        .withColumn("qvd",
          transform(col("qv"), (x: Column) => x.cast("double")))
        .select(col("qid"), col("label"),
          fround(cos("cv", "qvd"), 6).as("ccs"))
        .withColumn("crk", row_number().over(wBest))
      val scored = graft.Caching.cache(e.crossJoin(broadcast(q))
        .filter(col("vec_id") =!= col("qid"))
        .select(col("qid"), col("vec_id"), col("label"),
          round(cos("embedding", "qv"), 4).as("cs")))
      val wq = Window.partitionBy("qid").orderBy(desc("cs"), asc("vec_id"))
      val truth = scored.withColumn("rn", row_number().over(wq))
        .filter(col("rn") <= 10).select("qid", "vec_id")
      val nTrue = truth.groupBy("qid").agg(count(lit(1)).as("n_true"))
      val perProbe = Seq(1, 2, 4).map { np =>
        val cells = ranked.filter(col("crk") <= np)
          .select(col("qid").as("bqid"), col("label").as("blabel"))
        val ivf = scored
          .join(broadcast(cells), col("qid") === col("bqid") &&
            col("label") === col("blabel"))
          .withColumn("rn", row_number().over(wq))
          .filter(col("rn") <= 10).select("qid", "vec_id")
        truth.join(ivf, Seq("qid", "vec_id"), "left_semi")
          .groupBy("qid").agg(count(lit(1)).as("hits"))
          .join(nTrue, Seq("qid"), "right")
          .select(lit(np.toLong).as("nprobe"), col("qid"),
            coalesce(col("hits"), lit(0L)).as("hits"), col("n_true"))
      }
      perProbe.reduce(_ unionByName _)
        .groupBy("nprobe")
        .agg(count(lit(1)).as("n_queries"),
          sum("hits").as("hits"),
          sum("n_true").as("n_true"),
          fround(sum("hits").cast("double") / sum("n_true"), 4)
            .as("recall"))
        .orderBy("nprobe")
    }),

    // k-NN *join* — top-3 neighbors for each of the FIXED 40 budget
    // queries (r13: moved off the `vec_id % 50` corpus-fraction query
    // set onto the same TakeOrdered budget as q_ann_recall, verdict
    // #3 — a fraction makes the truth side n²/50 and the query
    // broadcast grow with the corpus; the budget keeps them O(Q·n)
    // and constant-size at ANY scale). The query side broadcasts; the
    // base scan is never shuffled — per-query ranking happens in a
    // window over the scored pairs (qid-partitioned: 40·k rows
    // survive). At 100 TB the same plan holds with an LSH/IVF
    // candidate filter replacing the broadcast cross product
    // (Similarity.ivfTopK); brute force IS the oracle-checkable
    // baseline SURVEY §2.10 L3 calls for.
    "q_knn_join" -> ((s, dir) => {
      GraftFunctions.register(s)
      val e = T(s, dir, "embeddings")
      val q = e.orderBy(asc("vec_id")).limit(40)
        .select(col("vec_id").as("qid"), col("embedding").as("qv"))
      val scored = e.crossJoin(broadcast(q))
        .filter(col("vec_id") =!= col("qid"))
        .select(col("qid"), col("vec_id"),
          round(cos("embedding", "qv"), 4).as("cs"))
      val w = Window.partitionBy("qid").orderBy(desc("cs"), asc("vec_id"))
      scored.withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select(col("qid"), col("vec_id"), col("cs"),
          col("rn").cast("long").as("rn"))
        .orderBy("qid", "rn")
    }),

    // L3c — int8 scalar quantization (r7): per-vector max-abs codes +
    // scale (Similarity.quantizeInt8, map-only). The key pins the full
    // numeric contract: the scale, the exact code checksum (integer —
    // engine-portable), and the max reconstruction error. 4× smaller
    // vectors is the first compression rung of a 100 TB vector store.
    "q_embed_quant" -> ((s, dir) => {
      val q = graft.operators.Similarity.quantizeInt8(
        T(s, dir, "embeddings"), "embedding")
      q.select(col("vec_id"),
        fround(col("scale"), 6).as("scale6"),
        expr("aggregate(codes, 0L, (a, c) -> a + CAST(c AS BIGINT))")
          .as("code_sum"),
        fround(expr(
          "aggregate(zip_with(embedding, codes, (x, c) -> " +
            "abs(CAST(x AS DOUBLE) - CAST(c AS DOUBLE) * scale)), " +
            "CAST(0.0 AS DOUBLE), (m, e) -> greatest(m, e))"), 6)
          .as("max_err6"))
        .orderBy("vec_id")
    }),

    // L3d — asymmetric quantized search (r7): full-precision query
    // against the int8-reconstructed base, top-10 by cosine. The
    // shortlist a production pipeline would re-rank with float vectors;
    // here the whole point is that the quantized scan alone already
    // agrees with the oracle at 4 dp.
    "q_quant_topk" -> ((s, dir) => {
      GraftFunctions.register(s)
      val e = graft.operators.Similarity.quantizeInt8(
        T(s, dir, "embeddings"), "embedding")
      val q = e.filter(col("vec_id") === 0)
        .select(transform(col("embedding"), _.cast("double")).as("qv"))
      e.filter(col("vec_id") =!= 0)
        .withColumn("recon",
          graft.operators.Similarity.dequantizeInt8("codes", "scale"))
        .crossJoin(broadcast(q))
        .select(col("vec_id"), round(cos("recon", "qv"), 4).as("cs"))
        .orderBy(desc("cs"), asc("vec_id"))
        .limit(10)
    }),

    // k-NN label purity (r12): the fraction of each budget query's 5
    // nearest neighbors sharing its label, aggregated per label — the
    // standard embedding-quality probe (a good encoder puts same-label
    // points together; purity collapsing is the first symptom of a bad
    // encoder or a broken preprocessing step). Same FIXED 40-query
    // budget as q_ann_recall (O(Q·n) truth side, constant broadcast);
    // the per-query rank is qid-partitioned (40·k rows survive). At
    // 100 TB the same audit runs with the ANN index as the candidate
    // generator — brute force IS the oracle-checkable baseline.
    "q_knn_purity" -> ((s, dir) => {
      GraftFunctions.register(s)
      val e = T(s, dir, "embeddings")
      val q = e.orderBy(asc("vec_id")).limit(40)
        .select(col("vec_id").as("qid"),
          col("label").cast("long").as("qlabel"),
          col("embedding").as("qv"))
      val w = Window.partitionBy("qid").orderBy(desc("cs"), asc("vec_id"))
      e.crossJoin(broadcast(q))
        .filter(col("vec_id") =!= col("qid"))
        .select(col("qid"), col("qlabel"),
          col("label").cast("long").as("label"), col("vec_id"),
          round(cos("embedding", "qv"), 4).as("cs"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 5)
        .groupBy("qid", "qlabel")
        .agg(sum((col("label") === col("qlabel")).cast("long"))
          .as("hits"))
        .groupBy(col("qlabel").as("label"))
        .agg(count(lit(1)).as("n_queries"),
          sum("hits").as("hits"),
          fround(sum("hits").cast("double") / (count(lit(1)) * 5), 4)
            .as("purity"))
        .orderBy("label")
    }),

    // Per-label centroids (the IVF coarse quantizer as a first-class op,
    // long form). One explode + one partial-aggregated shuffle on
    // (label, pos): the map side reduces 64·N element rows down to
    // 64·|labels| partials — at 100 TB this is the canonical way to
    // average vectors without any driver materialization.
    "q_embed_centroid" -> ((s, dir) => {
      T(s, dir, "embeddings")
        .select(col("label").cast("long").as("label"),
          posexplode(col("embedding")).as(Seq("pos", "x")))
        .groupBy("label", "pos")
        .agg(fround(avg(col("x").cast("double")), 4).as("c"),
          count(lit(1)).as("n"))
        .select(col("label"), col("pos").cast("long").as("pos"),
          col("c"), col("n"))
        .orderBy("label", "pos")
    }),

    // Embedding drift monitor (r12): per label, the cosine between the
    // centroid of the even-vec_id half and the odd-vec_id half — the
    // readout a training pipeline watches to catch upstream encoder or
    // distribution drift between two batches/snapshots of the same
    // corpus slice (here the deterministic parity split stands in for
    // "yesterday vs today"). Plan: ONE explode + one map-combined agg
    // on (label, pos) with BOTH split centroids as conditional
    // averages in the same pass (avg ignores the other parity's NULLs)
    // — 64·|labels| partials regardless of corpus size, no self-join,
    // the corpus touched exactly once — then the cosine folds the
    // 64·|labels| frame per label. Centroid components round at 6 dp
    // BEFORE the dot product (the q_embed_cov discipline: avg drift
    // ~1e-12), the cosine at 4 dp after.
    // STREAMING stance (r13, verdict #7): the (label, pos) conditional
    // sums/counts are keyed aggs — incrementally maintainable as a
    // streaming aggregation (sums commute; the parity split becomes
    // the stream's window/batch tag); the cosine readout re-derives
    // per trigger from the 64·|labels| centroid frame — constant-size
    // regardless of corpus scale, the q_psi/q_seasonal_anom readout
    // stance.
    "q_centroid_drift" -> ((s, dir) => {
      val x = col("x").cast("double")
      val even = pmod(col("vec_id"), lit(2L)) === 0L
      T(s, dir, "embeddings")
        .select(col("label").cast("long").as("label"), col("vec_id"),
          posexplode(col("embedding")).as(Seq("pos", "x")))
        .groupBy("label", "pos")
        .agg(fround(avg(when(even, x)), 6).as("c0"),
          fround(avg(when(!even, x)), 6).as("c1"),
          sum(even.cast("long")).as("n_even"),
          sum((!even).cast("long")).as("n_odd"))
        .groupBy("label")
        .agg(max("n_even").as("n_even"), max("n_odd").as("n_odd"),
          sum(col("c0") * col("c1")).as("dp"),
          sum(col("c0") * col("c0")).as("na"),
          sum(col("c1") * col("c1")).as("nb"))
        .select(col("label"), col("n_even"), col("n_odd"),
          fround(col("dp") / (sqrt(col("na")) * sqrt(col("nb"))), 4)
            .as("drift_cos"))
        .orderBy("label")
    }),

    // Embedding covariance matrix (r11) — the PCA / whitening /
    // Mahalanobis front half, as ONE single-pass aggregation:
    // [[graft.functions.VecMomentsAgg]] folds every vector into a flat
    // (d²+d+1)-double moment buffer (Gram sums, mean sums, n) with
    // map-side combine — each task ships exactly one buffer through the
    // shuffle regardless of row count; cov(i,j) = Sᵢⱼ/n − (Sᵢ/n)(Sⱼ/n)
    // derives in closed form from the single output row, exploded to
    // the upper triangle (i ≤ j, 2080 rows at d=64). The DuckDB oracle
    // recomputes the same double sums positionally. 6-dp rounding
    // absorbs summation-order drift (values O(0.01–1), drift ~1e-12).
    "q_embed_cov" -> ((s, dir) => {
      val d = 64
      val agg = udaf(new graft.functions.VecMomentsAgg(d))
      T(s, dir, "embeddings")
        .agg(agg(col("embedding")).as("m"))
        .select(explode(expr(
          s"""flatten(transform(sequence(0, ${d - 1}), i ->
              transform(sequence(i, ${d - 1}), j ->
                named_struct(
                  'i', CAST(i AS BIGINT), 'j', CAST(j AS BIGINT),
                  'cov', m[i * $d + j] / m[${d * d + d}]
                    - (m[${d * d} + i] / m[${d * d + d}])
                      * (m[${d * d} + j] / m[${d * d + d}])))))"""))
          .as("e"))
        .select(col("e.i").as("i"), col("e.j").as("j"),
          fround(col("e.cov"), 6).as("cov"))
        .orderBy("i", "j")
    }),

    // Embedding outlier screen (r11): per-vector diagonal Mahalanobis
    // distance Σᵢ (xᵢ−μᵢ)²/σᵢ² — the practical "drop corrupted /
    // out-of-distribution embeddings" gate (full-covariance Mahalanobis
    // needs Σ⁻¹; the diagonal form is what pipelines deploy at scale).
    // Plan: the per-coordinate stats frame is 64 rows — computed by one
    // map-combined agg and BROADCAST into a map-side score + per-vector
    // sum; top-20 is TakeOrdered. Zero shuffles proportional to vector
    // count beyond the per-vector sum's hash agg. σ² = 0 coordinates
    // contribute 0 (guard mirrored in the oracle).
    "q_embed_outlier" -> ((s, dir) => {
      val e = T(s, dir, "embeddings")
      val xs = e.select(col("vec_id"),
        posexplode(col("embedding")).as(Seq("pos", "xf")))
        .select(col("vec_id"), col("pos"),
          col("xf").cast("double").as("x"))
      val stats = xs.groupBy("pos")
        .agg(sum(col("x")).as("sx"),
          sum(col("x") * col("x")).as("sxx"),
          count(lit(1)).as("n"))
        .select(col("pos"), (col("sx") / col("n")).as("mu"),
          (col("sxx") / col("n") -
            (col("sx") / col("n")) * (col("sx") / col("n"))).as("v"))
      xs.join(broadcast(stats), "pos")
        .groupBy("vec_id")
        .agg(fround(sum(when(col("v") === 0d, 0d).otherwise(
          (col("x") - col("mu")) * (col("x") - col("mu")) / col("v"))),
          4).as("md2"))
        .orderBy(desc("md2"), asc("vec_id")).limit(20)
    }),

    // SemDeDup (Abbas et al. 2023, arXiv:2303.09540 — public): semantic
    // dedup INSIDE coarse clusters. Cluster = label (the deterministic
    // coarse-quantizer stand-in q_ann_ivf established); within each
    // cluster, pairs whose 4-dp-rounded cosine clears the threshold
    // form the semantic-dup graph; connected components name each
    // group's min-id representative, and every vector reports its
    // representative + a keep flag — the frame a curation pass deletes
    // against. The threshold (0.35) sits at the fixture's 99.9th
    // within-cluster percentile so real groups form; rounding BEFORE
    // the comparison keeps the boundary decision bit-identical across
    // engines (the shared fround discipline).
    //
    // Scale (r9 — the r8 verdict's conditional scale-killer, now
    // bounded): the paper's own argument needs cluster count ∝ N; a
    // FIXED label set makes the per-cluster pair term (N/k)² —
    // quadratic. So any cluster larger than `cap` is Voronoi-SPLIT on
    // its own ceil(n/cap) lowest-id members as sub-quantizer seeds
    // (exactly the q_kmeans assignment discipline: 4-dp-rounded d2,
    // min-seed-id tiebreak, one assignment round), and the dup-pair
    // join keys on (label, subcluster). The cap is ADAPTIVE (r10):
    // effective cap = max(32, ceil(sqrt(n))) per label, read off the
    // seed-selection window's own count — at a fixed cap the
    // assignment term n·ceil(n/cap) is Θ(n²/cap) (r9 measured 1.87);
    // with cap ∝ √n assignment AND pairs are both Θ(n^1.5) (CurveProbe
    // `semsub`, SCALE.md). Assignment scores against a broadcast
    // per-label seed array (one small row per label; argmin is a
    // map-side array_min over structs — no explode, no shuffle). Seed
    // SELECTION ranks (vec_id, label) only — a 2-column pruned window,
    // the trainer-side artifact build (at real scale seeds come from
    // the q_kmeans trainer; lowest-ids is the deterministic fixture
    // stand-in, k ∝ N either way). Pairs missed across subcluster
    // boundaries are the paper's own documented recall trade for
    // k ∝ N. Floor 32 keeps every fixture label (50–220 rows, all
    // under 32² = 1024) in the r9 regime — oracle results unchanged —
    // while still exercising the split at every test scale.
    // Components is the same O(diameter) loop as q_dedup_resolve.
    "q_semdedup" -> ((s, dir) => {
      GraftFunctions.register(s)
      val e = T(s, dir, "embeddings")
      val assigned = graft.Caching.cache(
        graft.operators.Similarity.subclusterByCap(
          s, e, "vec_id", "label", "embedding", cap = 32)
          .select(col("vec_id"), col("label"), col("sub"),
            col("embedding")))
      val a = assigned.select(col("vec_id").as("ia"), col("label"),
        col("sub"), col("embedding").as("va"))
      val b = assigned.select(col("vec_id").as("ib"),
        col("label").as("lb"), col("sub").as("sb"),
        col("embedding").as("vb"))
      val pairs = a.join(b, col("label") === col("lb") &&
          col("sub") === col("sb") && col("ia") < col("ib"))
        .filter(fround(cos("va", "vb"), 4) >= 0.35)
        .select(col("label"), col("sub"), col("ia"), col("ib"))
      // r15: every edge is confined to its (label, sub) block (the join
      // requires both equal and each vector has exactly one assignment),
      // so components cannot span blocks — the global O(diameter)
      // fixpoint (one join + agg + driver count PER ROUND) collapses to
      // one grouped union-find pass (Components.resolveDuplicatesBlocked;
      // equivalence spec-pinned + oracle-diffed at 3 SFs).
      val res = graft.operators.Components.resolveDuplicatesBlocked(
        pairs, "ia", "ib", Seq("label", "sub"))
      e.select(col("vec_id"))
        .join(res, col("vec_id") === col("id"), "left")
        .select(col("vec_id"),
          coalesce(col("keeper"), col("vec_id")).as("rep_id"))
        .withColumn("keep",
          (col("rep_id") === col("vec_id")).cast("long"))
        .orderBy("vec_id")
    }),

    // Hyperplane-LSH bucketing, oracle-checkable twin of
    // Similarity.lshBuckets/lshCandidates (which use splitmix64 float
    // planes — no SQL twin): 2 tables × 8 md5-derived integer planes
    // (Similarity.md5Planes), bucket = the 8-bit sign pattern, plus the
    // bucket occupancy. This is the L3 scale path when no coarse
    // quantizer exists: bucketing is pure map-side (16 codegen'd
    // dot_products per row, one scan via stack), and the only shuffle
    // is the occupancy count — at 100 TB candidates come from a
    // bucket-equi self-join exactly like q_minhash_band's. The sign
    // decision rounds the dot at 4 dp first (shared fround discipline)
    // so the boundary bit is identical across engines.
    "q_lsh_bucket" -> ((s, dir) => {
      GraftFunctions.register(s)
      val tables = 2; val bits = 8
      val planes = graft.operators.Similarity.md5Planes(tables * bits, 64)
      def bucket(t: Int): Column = (0 until bits).map { b =>
        val w = planes(t * bits + b)
        when(fround(expr(s"dot_product(embedding, " +
          s"array(${w.mkString("D,")}D))"), 4) >= 0, lit(1L << b))
          .otherwise(lit(0L))
      }.reduce(_ + _)
      T(s, dir, "embeddings")
        .select(col("vec_id"), bucket(0).as("b0"), bucket(1).as("b1"))
        .selectExpr("vec_id",
          "stack(2, 0L, b0, 1L, b1) AS (tbl, bucket)")
        .withColumn("n_bucket", count(lit(1))
          .over(Window.partitionBy("tbl", "bucket")))
        .orderBy("vec_id", "tbl")
    }),

    // Lloyd's k-means over the embedding column (k=4, two assignment
    // rounds), fully deterministic: the seeds ARE vectors 0..3 (exact
    // float values — identical in any engine), and the recomputed means
    // are rounded at 4 dp BEFORE round 2, so the second round's inputs
    // are bit-identical across engines. Each round collects the k×64
    // centroid scalars to the driver (the same bounded per-round driver
    // traffic Spark MLlib's KMeans accepts) and re-broadcasts them as
    // LITERALS, so assignment is pure map-side: k codegen'd dot_product
    // calls per row in the scan stage, argmin via least() over
    // (d2, cluster) structs — the base table is never shuffled for
    // assignment. Mean recompute is q_embed_centroid's shape: one
    // posexplode + a map-combined (cluster, pos) aggregation. This is
    // the coarse quantizer q_ann_ivf stubbed with labels, now as a real
    // trained stage — and the clustering rung under SemDeDup/mixture
    // curation at 100 TB (k and dim bounded, data side linear scans).
    "q_kmeans" -> ((s, dir) => {
      GraftFunctions.register(s)
      val k = 4
      val e = T(s, dir, "embeddings")
        .select(col("vec_id"),
          transform(col("embedding"), _.cast("double")).as("xd"))
      def collectCents(df: DataFrame): Seq[(Long, Seq[Double])] =
        df.collect().map(r => (r.getLong(0), r.getSeq[Double](1)))
          .toSeq.sortBy(_._1)
      def assign(cents: Seq[(Long, Seq[Double])]): DataFrame = {
        val best = cents.map { case (c, cv) =>
          val cc = cv.map(x => x * x).sum // sequential, = the kernel's order
          struct(
            fround(call_function("dot_product", col("xd"), col("xd"))
              - lit(2.0) * call_function("dot_product", col("xd"), typedLit(cv))
              + lit(cc), 4).as("d2"),
            lit(c).as("cluster"))
        }.reduce(least(_, _)) // struct order = (d2, cluster): min-id tiebreak
        e.select(col("vec_id"), col("xd"),
          best.getField("cluster").as("cluster"), best.getField("d2").as("d2"))
      }
      // r14: both Lloyd-round centroid collects are deterministic driver
      // values — epoch-memoized (Caching.memoEpoch) like the PQ books.
      // r15 (ADVICE r14 #3): k is in the key — bpeRounds' discipline.
      val c1 = graft.Caching.memoEpoch(("kmeansCents", s, dir, k)) {
        val c0 = collectCents(e.filter(col("vec_id") < k)
          .select(col("vec_id"), col("xd")))
        collectCents(assign(c0)
          .select(col("cluster"),
            posexplode(col("xd")).as(Seq("pos", "x")))
          .groupBy("cluster", "pos").agg(fround(avg("x"), 4).as("cx"))
          .groupBy("cluster")
          .agg(transform(
            array_sort(collect_list(struct(col("pos"), col("cx")))),
            p => p.getField("cx")).as("cv")))
      }
      assign(c1)
        .withColumn("n", count(lit(1)).over(Window.partitionBy("cluster")))
        .select(col("vec_id"), col("cluster"), col("d2"), col("n"))
        .orderBy("vec_id")
    }),

    // L3e — product quantization + asymmetric distance (Jégou et al.,
    // TPAMI 2011 — public; the FAISS IVF-PQ rung): the 64-dim vector
    // splits into M=4 subspaces of 16 dims, each with its own K=4
    // codebook (seeds = vectors 0..3's subvectors, one deterministic
    // Lloyd refinement exactly like q_kmeans: means rounded at 4 dp,
    // 4-dp-rounded d2 with min-k tiebreak). Codes are 4 small ints —
    // 64× smaller than the float vector — and query scoring is ADC:
    // the M×K lookup table ||q_m - c_mk||² is computed ONCE per query
    // on the driver (256 scalars) and baked into the plan as a literal
    // when-chain, so the scan does M lookups + adds per vector instead
    // of 64 multiplies. Codebook training collects M×K×16 = 256 scalars
    // per round (the same bounded driver traffic q_kmeans accepts);
    // assignment and scoring never shuffle the base table — at 100 TB
    // this rides an IVF cell restriction (q_ann_ivf) in front, which is
    // exactly the billion-scale layout. Output pins codes AND the 4-dp
    // ADC for every vector.
    "q_ann_pq" -> ((s, dir) =>
      pqScored(s, dir, identity).drop("label").orderBy("vec_id")),

    // L3f — IVF-PQ (r8): the full FAISS-style billion-scale layout,
    // composed from the two oracle-proven stages. The coarse quantizer
    // (per-label centroid, q_ann_ivf's) picks the query's best cell;
    // PQ codebooks train on the FULL corpus (codebooks are global —
    // per-cell books would be a different, residual-PQ design); ADC
    // scores ONLY the best cell's vectors and returns the 10 nearest
    // by quantized distance. At 100 TB the cell restriction bounds the
    // scan and the ADC bounds the arithmetic — the scan stage does M
    // lookups per surviving vector, nothing else.
    "q_ann_ivfpq" -> ((s, dir) => {
      GraftFunctions.register(s)
      val e = T(s, dir, "embeddings")
      val cents = e
        .select(col("label"),
          posexplode(transform(col("embedding"), _.cast("double")))
            .as(Seq("pos", "x")))
        .groupBy("label", "pos")
        .agg(avg("x").as("cx"))
        .groupBy("label")
        .agg(transform(array_sort(collect_list(struct(col("pos"), col("cx")))),
          p => p.getField("cx")).as("cv"))
      val qd = e.filter(col("vec_id") === 0)
        .select(transform(col("embedding"), _.cast("double")).as("qvd"))
      val best = cents.crossJoin(broadcast(qd))
        .select(col("label"), cos("cv", "qvd").as("ccs"))
        .orderBy(desc("ccs"), asc("label"))
        .limit(1)
        .select(col("label").cast("long").as("best_label"))
      pqScored(s, dir, base => base
          .join(broadcast(best), col("label") === col("best_label"))
          .filter(col("vec_id") =!= 0)
          .drop("best_label"))
        .orderBy(asc("adc"), asc("vec_id"))
        .limit(10)
    }),

    // nDCG@10 of the IVF ranking (r13; Järvelin & Kekäläinen 2002,
    // public): q_ann_recall says how many of the true top-10 the index
    // returns; nDCG says whether it returns them in the right ORDER —
    // the graded metric retrieval deployments actually gate on (an
    // index that finds all 10 but inverts the head scores worse here,
    // identically on recall). Relevance grades are the brute-force
    // ranks (truth rank i ⇒ rel 11−i, else 0); DCG folds the IVF
    // candidate list's positions; IDCG is the closed-form constant
    // Σ(11−i)/log2(i+1) since every query has exactly ten graded
    // docs. Same plan skeleton and FIXED 40-query budget as
    // q_ann_recall (one brute scored frame feeds both rankings;
    // O(Q·n) truth side, constant broadcasts); rank inputs are the
    // 4-dp-rounded cosine + vec_id tiebreak, so both engines rank
    // bit-identically and the 4-dp fround only absorbs the final
    // log-sum order.
    "q_ndcg_ivf" -> ((s, dir) => {
      GraftFunctions.register(s)
      val e = T(s, dir, "embeddings")
      val q = e.orderBy(asc("vec_id")).limit(40)
        .select(col("vec_id").as("qid"), col("embedding").as("qv"))
      val cents = e
        .select(col("label"),
          posexplode(transform(col("embedding"), _.cast("double")))
            .as(Seq("pos", "x")))
        .groupBy("label", "pos")
        .agg(avg("x").as("cx"))
        .groupBy("label")
        .agg(transform(array_sort(collect_list(struct(col("pos"), col("cx")))),
          p => p.getField("cx")).as("cv"))
      val wBest = Window.partitionBy("qid")
        .orderBy(desc("ccs"), asc("label"))
      val best = q.crossJoin(broadcast(cents))
        .withColumn("qvd",
          transform(col("qv"), (x: Column) => x.cast("double")))
        .select(col("qid"), col("label"),
          fround(cos("cv", "qvd"), 6).as("ccs"))
        .withColumn("rn", row_number().over(wBest))
        .filter(col("rn") === 1)
        .select(col("qid").as("bqid"), col("label").as("best_label"))
      val scored = graft.Caching.cache(e.crossJoin(broadcast(q))
        .filter(col("vec_id") =!= col("qid"))
        .select(col("qid"), col("vec_id"), col("label"),
          round(cos("embedding", "qv"), 4).as("cs")))
      val wq = Window.partitionBy("qid").orderBy(desc("cs"), asc("vec_id"))
      val truth = scored.withColumn("rn", row_number().over(wq))
        .filter(col("rn") <= 10)
        .select(col("qid"), col("vec_id"),
          (lit(11) - col("rn")).cast("double").as("rel"))
      val ivf = scored
        .join(broadcast(best), col("qid") === col("bqid") &&
          col("label") === col("best_label"))
        .withColumn("pos", row_number().over(wq))
        .filter(col("pos") <= 10).select("qid", "vec_id", "pos")
      val idcg = (1 to 10)
        .map(i => (11 - i) / (math.log(i + 1.0) / math.log(2.0))).sum
      ivf.join(truth, Seq("qid", "vec_id"), "left")
        .groupBy("qid")
        .agg(sum(coalesce(col("rel"), lit(0.0)) /
          log2(col("pos") + lit(1))).as("dcg0"))
        .select(col("qid"), fround(col("dcg0"), 4).as("dcg"),
          fround(col("dcg0") / lit(idcg), 4).as("ndcg"))
        .orderBy("qid")
    })
  )

  /** Shared PQ pipeline (Jégou et al., TPAMI 2011): trains the global
    * M=4 × K=4 codebooks on the FULL corpus (seeds = vectors 0..3's
    * subvectors + one 4-dp-deterministic Lloyd refinement), then scores
    * `restrict(base)` — base is (vec_id, label, xd) — with per-subspace
    * argmin codes and the plan-literal ADC table for query vector 0.
    * Training collects M×K×16 = 256 scalars per round (the bounded
    * driver traffic q_kmeans accepts); scoring is map-side. */
  private def pqScored(s: SparkSession, dir: String,
      restrict: DataFrame => DataFrame): DataFrame = {
    GraftFunctions.register(s)
    val M = 4; val K = 4L; val sub = 16
    val e = graft.Caching.cache(
      T(s, dir, "embeddings").select(col("vec_id"),
        col("label").cast("long").as("label"),
        transform(col("embedding"), _.cast("double")).as("xd")))
    // argmin-code column for subspace m against a (k → centroid) book
    def codeCol(m: Int, book: Seq[(Long, Seq[Double])]): Column = {
      val sl = slice(col("xd"), m * sub + 1, sub)
      book.map { case (k, cv) =>
        val cc = cv.map(x => x * x).sum // sequential = the kernel's order
        struct(
          fround(call_function("dot_product", sl, sl)
            - lit(2.0) * call_function("dot_product", sl, typedLit(cv))
            + lit(cc), 4).as("d2"),
          lit(k).as("k"))
      }.reduce(least(_, _)).getField("k") // (d2, k): min-k tiebreak
    }
    // r14 (optimization round): the codebook training collects (seed
    // rows + one Lloyd round) are deterministic driver values — memoize
    // them for the epoch (Caching.memoEpoch, cleared at releaseAll) so a
    // re-built query skips the two training jobs. r15 (ADVICE r14 #3):
    // the key carries (M, K, sub) so a differently-parameterized caller
    // within one epoch can never read this entry's codebooks.
    val (c1, qv) = graft.Caching.memoEpoch(("pqBooks", s, dir, M, K, sub)) {
      val seeds = e.filter(col("vec_id") < K)
        .select(col("vec_id"), col("xd")).collect()
        .map(r => (r.getLong(0), r.getSeq[Double](1))).toSeq.sortBy(_._1)
      val c0 = (0 until M).map { m =>
        seeds.map { case (k, v) =>
          (k, v.slice(m * sub, (m + 1) * sub)) }
      }
      // one Lloyd round per subspace: explode once, route each element to
      // its subspace's assigned cluster, 4-dp-round the means (so round-2
      // inputs are bit-identical across engines)
      val c1rows = e.select(col("xd") +:
          (0 until M).map(m => codeCol(m, c0(m)).as(s"k$m")): _*)
        .select(col("k0"), col("k1"), col("k2"), col("k3"),
          posexplode(col("xd")).as(Seq("pos", "x")))
        .select((col("pos") / sub).cast("int").as("m"),
          element_at(array(col("k0"), col("k1"), col("k2"), col("k3")),
            (col("pos") / sub).cast("int") + 1).as("cl"),
          (col("pos") % sub).as("j"), col("x"))
        .groupBy("m", "cl", "j").agg(fround(avg("x"), 4).as("cx"))
        .collect().map(r =>
          ((r.getInt(0), r.getLong(1)), (r.getInt(2), r.getDouble(3))))
      val cb = (0 until M).map { m =>
        c1rows.filter(_._1._1 == m).groupBy(_._1._2).map { case (k, rs) =>
          (k, rs.map(_._2).sortBy(_._1).map(_._2).toSeq)
        }.toSeq.sortBy(_._1)
      }
      // ADC query vector: vec_id 0, already in the seed collect
      // (vec_id < K, K = 4); `.get` keeps fail-loudly-if-absent
      (cb, seeds.find(_._1 == 0L).get._2)
    }
    val adc = (0 until M).map { m =>
      val qsub = qv.slice(m * sub, (m + 1) * sub)
      val qq = qsub.map(x => x * x).sum
      val terms = c1(m).map { case (k, cv) =>
        val qc = qsub.zip(cv).map { case (a, b) => a * b }.sum
        (k, qq - 2.0 * qc + cv.map(x => x * x).sum)
      }
      terms.tail.foldLeft(
        when(col(s"code_$m") === terms.head._1, lit(terms.head._2))) {
        case (acc, (k, t)) => acc.when(col(s"code_$m") === k, lit(t))
      }
    }.reduce(_ + _)
    restrict(e)
      .select(col("vec_id") +: col("label") +:
        (0 until M).map(m =>
          codeCol(m, c1(m)).cast("long").as(s"code_$m")): _*)
      .withColumn("adc", fround(adc, 4))
  }

  // Shared oracle scaffolding: explicit double dot products via an index
  // join — identical fold math to CosineSimilarity's loop (error << 1e-12,
  // rounded at 4 dp; safe regardless of summation order).
  val oracles: Map[String, String] = Map(
    "q_mmr_topk" -> mmrOracle,
    "q_knn_purity" ->
      """WITH q AS (
           SELECT vec_id AS qid, CAST(label AS BIGINT) AS qlabel,
             embedding AS qv
           FROM embeddings ORDER BY vec_id LIMIT 40),
         d AS (
           SELECT q.qid, q.qlabel, e.vec_id,
             CAST(e.label AS BIGINT) AS label,
             round(sum(CAST(e.embedding[i.i + 1] AS DOUBLE)
                     * CAST(q.qv[i.i + 1] AS DOUBLE))
               / (sqrt(sum(CAST(e.embedding[i.i + 1] AS DOUBLE)
                         * CAST(e.embedding[i.i + 1] AS DOUBLE)))
                * sqrt(sum(CAST(q.qv[i.i + 1] AS DOUBLE)
                         * CAST(q.qv[i.i + 1] AS DOUBLE)))), 4) AS cs
           FROM embeddings e, q, (SELECT unnest(range(64)) AS i) i
           WHERE e.vec_id <> q.qid
           GROUP BY 1, 2, 3, 4),
         r AS (
           SELECT qid, qlabel, label,
             row_number() OVER (PARTITION BY qid
               ORDER BY cs DESC, vec_id) AS rn
           FROM d),
         h AS (
           SELECT qid, qlabel,
             sum(CASE WHEN label = qlabel THEN 1 ELSE 0 END) AS hits
           FROM r WHERE rn <= 5 GROUP BY 1, 2)
         SELECT qlabel AS label, count(*) AS n_queries,
           CAST(sum(hits) AS BIGINT) AS hits,
           floor(CAST(sum(hits) AS DOUBLE) / (count(*) * 5)
                 * 1e4 + 0.5) / 1e4 AS purity
         FROM h GROUP BY 1 ORDER BY 1""",
    "q_cosine_topk" ->
      """WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
         d AS (
           SELECT e.vec_id,
             sum(CAST(e.embedding[i.i + 1] AS DOUBLE)
               * CAST(q.qe[i.i + 1] AS DOUBLE)) AS dp,
             sum(CAST(e.embedding[i.i + 1] AS DOUBLE)
               * CAST(e.embedding[i.i + 1] AS DOUBLE)) AS na,
             sum(CAST(q.qe[i.i + 1] AS DOUBLE)
               * CAST(q.qe[i.i + 1] AS DOUBLE)) AS nb
           FROM embeddings e, q, (SELECT unnest(range(64)) AS i) i
           WHERE e.vec_id <> 0
           GROUP BY e.vec_id)
         SELECT vec_id, round(dp / (sqrt(na) * sqrt(nb)), 4) AS cs
         FROM d ORDER BY cs DESC, vec_id LIMIT 10""",
    "q_mrl_topk" ->
      """WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
         c0 AS (
           SELECT e.vec_id,
             sum(CAST(e.embedding[i.i + 1] AS DOUBLE)
               * CAST(q.qe[i.i + 1] AS DOUBLE)) AS dp,
             sum(CAST(e.embedding[i.i + 1] AS DOUBLE)
               * CAST(e.embedding[i.i + 1] AS DOUBLE)) AS na,
             sum(CAST(q.qe[i.i + 1] AS DOUBLE)
               * CAST(q.qe[i.i + 1] AS DOUBLE)) AS nb
           FROM embeddings e, q, (SELECT unnest(range(16)) AS i) i
           WHERE e.vec_id <> 0
           GROUP BY e.vec_id),
         c AS (
           SELECT vec_id, round(dp / (sqrt(na) * sqrt(nb)), 4) AS cs16
           FROM c0 ORDER BY cs16 DESC, vec_id LIMIT 50),
         f0 AS (
           SELECT c.vec_id, c.cs16,
             sum(CAST(e.embedding[i.i + 1] AS DOUBLE)
               * CAST(q.qe[i.i + 1] AS DOUBLE)) AS dp,
             sum(CAST(e.embedding[i.i + 1] AS DOUBLE)
               * CAST(e.embedding[i.i + 1] AS DOUBLE)) AS na,
             sum(CAST(q.qe[i.i + 1] AS DOUBLE)
               * CAST(q.qe[i.i + 1] AS DOUBLE)) AS nb
           FROM c JOIN embeddings e ON e.vec_id = c.vec_id,
             q, (SELECT unnest(range(64)) AS i) i
           GROUP BY c.vec_id, c.cs16)
         SELECT vec_id, cs16, round(dp / (sqrt(na) * sqrt(nb)), 4) AS cs
         FROM f0 ORDER BY cs DESC, vec_id LIMIT 10""",
    "q_rrf_fusion" ->
      """WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
         d0 AS (
           SELECT e.vec_id AS doc_id,
             round(sum(CAST(e.embedding[i.i + 1] AS DOUBLE)
                 * CAST(q.qe[i.i + 1] AS DOUBLE))
               / (sqrt(sum(CAST(e.embedding[i.i + 1] AS DOUBLE)
                     * CAST(e.embedding[i.i + 1] AS DOUBLE)))
                 * sqrt(sum(CAST(q.qe[i.i + 1] AS DOUBLE)
                     * CAST(q.qe[i.i + 1] AS DOUBLE)))), 4) AS cs
           FROM embeddings e, q, (SELECT unnest(range(64)) AS i) i
           WHERE e.vec_id <> 0
           GROUP BY e.vec_id),
         dr AS (
           SELECT doc_id,
             row_number() OVER (ORDER BY cs DESC, doc_id) AS rd
           FROM d0 QUALIFY rd <= 100),
         tok AS (
           SELECT doc_id, unnest(string_split(lower(text), ' ')) AS w
           FROM documents),
         tf AS (SELECT doc_id, w, count(*) AS tf FROM tok GROUP BY 1, 2),
         qt AS (SELECT DISTINCT w FROM tf WHERE doc_id = 0),
         dfreq AS (SELECT w, count(*) AS df FROM tf GROUP BY 1),
         dl AS (SELECT doc_id, CAST(sum(tf) AS BIGINT) AS dl
                FROM tf GROUP BY 1),
         corpus AS (SELECT count(*) AS n,
                      CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl FROM dl),
         sc AS (
           SELECT tf.doc_id,
             floor(ln(1.0 + (n - df + 0.5) / (df + 0.5))
                   * (tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl)))
                   * 1e4 + 0.5) / 1e4 AS s1
           FROM tf JOIN qt USING (w) JOIN dfreq USING (w)
             JOIN dl USING (doc_id), corpus
           WHERE tf.doc_id <> 0),
         bs AS (SELECT doc_id, floor(sum(s1) * 1e4 + 0.5) / 1e4 AS bs
                FROM sc GROUP BY doc_id),
         lr AS (
           SELECT doc_id,
             row_number() OVER (ORDER BY bs DESC, doc_id) AS rl
           FROM bs QUALIFY rl <= 100)
         SELECT coalesce(dr.doc_id, lr.doc_id) AS doc_id, dr.rd, lr.rl,
           floor((coalesce(CAST(1.0 AS DOUBLE) / (60 + dr.rd), 0.0)
                  + coalesce(CAST(1.0 AS DOUBLE) / (60 + lr.rl), 0.0))
                 * 1e6 + 0.5) / 1e6 AS rrf
         FROM dr FULL OUTER JOIN lr ON dr.doc_id = lr.doc_id
         ORDER BY rrf DESC, doc_id LIMIT 20""",
    "q_embed_neardup" ->
      """WITH p AS (
           SELECT a.vec_id AS ia, b.vec_id AS ib,
             a.embedding AS va, b.embedding AS vb
           FROM embeddings a JOIN embeddings b
             ON a.label = b.label AND a.vec_id < b.vec_id),
         d AS (
           SELECT ia, ib,
             sum(CAST(va[i.i + 1] AS DOUBLE) * CAST(vb[i.i + 1] AS DOUBLE))
               AS dp,
             sum(CAST(va[i.i + 1] AS DOUBLE) * CAST(va[i.i + 1] AS DOUBLE))
               AS na,
             sum(CAST(vb[i.i + 1] AS DOUBLE) * CAST(vb[i.i + 1] AS DOUBLE))
               AS nb
           FROM p, (SELECT unnest(range(64)) AS i) i
           GROUP BY ia, ib)
         SELECT ia, ib, round(dp / (sqrt(na) * sqrt(nb)), 4) AS cs
         FROM d ORDER BY cs DESC, ia, ib LIMIT 20""",
    "q_ann_ivf" ->
      """WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
         cent AS (
           SELECT label, i.i AS pos, avg(CAST(embedding[i.i + 1] AS DOUBLE))
             AS cx
           FROM embeddings, (SELECT unnest(range(64)) AS i) i
           GROUP BY label, i.i),
         cscore AS (
           SELECT c.label,
             sum(c.cx * CAST(q.qe[c.pos + 1] AS DOUBLE)) /
               (sqrt(sum(c.cx * c.cx)) *
                sqrt(sum(CAST(q.qe[c.pos + 1] AS DOUBLE)
                       * CAST(q.qe[c.pos + 1] AS DOUBLE)))) AS ccs
           FROM cent c, q GROUP BY c.label),
         best AS (SELECT label FROM cscore ORDER BY ccs DESC, label LIMIT 1),
         d AS (
           SELECT e.vec_id, e.label,
             sum(CAST(e.embedding[i.i + 1] AS DOUBLE)
               * CAST(q.qe[i.i + 1] AS DOUBLE)) AS dp,
             sum(CAST(e.embedding[i.i + 1] AS DOUBLE)
               * CAST(e.embedding[i.i + 1] AS DOUBLE)) AS na,
             sum(CAST(q.qe[i.i + 1] AS DOUBLE)
               * CAST(q.qe[i.i + 1] AS DOUBLE)) AS nb
           FROM embeddings e, q, (SELECT unnest(range(64)) AS i) i
           WHERE e.vec_id <> 0 AND e.label = (SELECT label FROM best)
           GROUP BY e.vec_id, e.label)
         SELECT vec_id, CAST(label AS BIGINT) AS label,
           round(dp / (sqrt(na) * sqrt(nb)), 4) AS cs
         FROM d ORDER BY cs DESC, vec_id LIMIT 10""",
    "q_ann_recall" ->
      """WITH q AS (
           SELECT vec_id AS qid, embedding AS qv FROM embeddings
           ORDER BY vec_id LIMIT 40),
         cent AS (
           SELECT label, i.i AS pos, avg(CAST(embedding[i.i + 1] AS DOUBLE))
             AS cx
           FROM embeddings, (SELECT unnest(range(64)) AS i) i
           GROUP BY label, i.i),
         cscore AS (
           SELECT q.qid, c.label,
             floor(sum(c.cx * CAST(q.qv[c.pos + 1] AS DOUBLE)) /
               (sqrt(sum(c.cx * c.cx)) *
                sqrt(sum(CAST(q.qv[c.pos + 1] AS DOUBLE)
                       * CAST(q.qv[c.pos + 1] AS DOUBLE))))
               * 1000000 + 0.5) / 1000000 AS ccs
           FROM cent c, q GROUP BY q.qid, c.label),
         best AS (
           SELECT qid, label AS best_label FROM (
             SELECT qid, label,
               row_number() OVER (PARTITION BY qid
                 ORDER BY ccs DESC, label) AS rn
             FROM cscore) WHERE rn = 1),
         d AS (
           SELECT q.qid, e.vec_id, e.label,
             round(sum(CAST(e.embedding[i.i + 1] AS DOUBLE)
                     * CAST(q.qv[i.i + 1] AS DOUBLE)) /
               (sqrt(sum(CAST(e.embedding[i.i + 1] AS DOUBLE)
                       * CAST(e.embedding[i.i + 1] AS DOUBLE))) *
                sqrt(sum(CAST(q.qv[i.i + 1] AS DOUBLE)
                       * CAST(q.qv[i.i + 1] AS DOUBLE)))), 4) AS cs
           FROM embeddings e, q, (SELECT unnest(range(64)) AS i) i
           WHERE e.vec_id <> q.qid
           GROUP BY q.qid, e.vec_id, e.label),
         truth AS (
           SELECT qid, vec_id FROM (
             SELECT qid, vec_id,
               row_number() OVER (PARTITION BY qid
                 ORDER BY cs DESC, vec_id) AS rn
             FROM d) WHERE rn <= 10),
         ivf AS (
           SELECT qid, vec_id FROM (
             SELECT d.qid, d.vec_id,
               row_number() OVER (PARTITION BY d.qid
                 ORDER BY d.cs DESC, d.vec_id) AS rn
             FROM d JOIN best b
               ON d.qid = b.qid AND d.label = b.best_label)
           WHERE rn <= 10)
         SELECT t.qid,
           CAST(count(i.vec_id) AS BIGINT) AS hits,
           count(*) AS n_true,
           floor(CAST(count(i.vec_id) AS DOUBLE) / count(*)
             * 10000 + 0.5) / 10000 AS recall
         FROM truth t LEFT JOIN ivf i
           ON t.qid = i.qid AND t.vec_id = i.vec_id
         GROUP BY t.qid ORDER BY t.qid""",
    "q_recall_nprobe" ->
      """WITH q AS (
           SELECT vec_id AS qid, embedding AS qv FROM embeddings
           ORDER BY vec_id LIMIT 40),
         cent AS (
           SELECT label, i.i AS pos, avg(CAST(embedding[i.i + 1] AS DOUBLE))
             AS cx
           FROM embeddings, (SELECT unnest(range(64)) AS i) i
           GROUP BY label, i.i),
         cscore AS (
           SELECT q.qid, c.label,
             floor(sum(c.cx * CAST(q.qv[c.pos + 1] AS DOUBLE)) /
               (sqrt(sum(c.cx * c.cx)) *
                sqrt(sum(CAST(q.qv[c.pos + 1] AS DOUBLE)
                       * CAST(q.qv[c.pos + 1] AS DOUBLE))))
               * 1000000 + 0.5) / 1000000 AS ccs
           FROM cent c, q GROUP BY q.qid, c.label),
         ranked AS (
           SELECT qid, label,
             row_number() OVER (PARTITION BY qid
               ORDER BY ccs DESC, label) AS crk
           FROM cscore),
         d AS (
           SELECT q.qid, e.vec_id, e.label,
             round(sum(CAST(e.embedding[i.i + 1] AS DOUBLE)
                     * CAST(q.qv[i.i + 1] AS DOUBLE)) /
               (sqrt(sum(CAST(e.embedding[i.i + 1] AS DOUBLE)
                       * CAST(e.embedding[i.i + 1] AS DOUBLE))) *
                sqrt(sum(CAST(q.qv[i.i + 1] AS DOUBLE)
                       * CAST(q.qv[i.i + 1] AS DOUBLE)))), 4) AS cs
           FROM embeddings e, q, (SELECT unnest(range(64)) AS i) i
           WHERE e.vec_id <> q.qid
           GROUP BY q.qid, e.vec_id, e.label),
         truth AS (
           SELECT qid, vec_id FROM (
             SELECT qid, vec_id,
               row_number() OVER (PARTITION BY qid
                 ORDER BY cs DESC, vec_id) AS rn
             FROM d) WHERE rn <= 10),
         np AS (SELECT unnest([1, 2, 4]) AS nprobe),
         ivf AS (
           SELECT nprobe, qid, vec_id FROM (
             SELECT n.nprobe, d.qid, d.vec_id,
               row_number() OVER (PARTITION BY n.nprobe, d.qid
                 ORDER BY d.cs DESC, d.vec_id) AS rn
             FROM np n
             JOIN ranked r ON r.crk <= n.nprobe
             JOIN d ON d.qid = r.qid AND d.label = r.label)
           WHERE rn <= 10),
         per AS (
           SELECT n.nprobe, t.qid,
             CAST(count(i.vec_id) AS BIGINT) AS hits,
             count(*) AS n_true
           FROM np n
           CROSS JOIN truth t
           LEFT JOIN ivf i ON i.nprobe = n.nprobe AND t.qid = i.qid
             AND t.vec_id = i.vec_id
           GROUP BY n.nprobe, t.qid)
         SELECT CAST(nprobe AS BIGINT) AS nprobe,
           count(*) AS n_queries,
           CAST(sum(hits) AS BIGINT) AS hits,
           CAST(sum(n_true) AS BIGINT) AS n_true,
           floor(CAST(sum(hits) AS DOUBLE) / sum(n_true) * 10000 + 0.5)
             / 10000 AS recall
         FROM per GROUP BY 1 ORDER BY 1""",
    "q_hard_negatives" ->
      """WITH q AS (
           SELECT vec_id AS qid, label AS qlabel, embedding AS qv
           FROM embeddings ORDER BY vec_id LIMIT 40),
         d AS (
           SELECT q.qid, e.vec_id, e.label,
             round(sum(CAST(e.embedding[i.i + 1] AS DOUBLE)
                     * CAST(q.qv[i.i + 1] AS DOUBLE)) /
               (sqrt(sum(CAST(e.embedding[i.i + 1] AS DOUBLE)
                       * CAST(e.embedding[i.i + 1] AS DOUBLE))) *
                sqrt(sum(CAST(q.qv[i.i + 1] AS DOUBLE)
                       * CAST(q.qv[i.i + 1] AS DOUBLE)))), 4) AS cs
           FROM embeddings e, q, (SELECT unnest(range(64)) AS i) i
           WHERE e.label <> q.qlabel
           GROUP BY q.qid, e.vec_id, e.label)
         SELECT qid, vec_id, CAST(label AS BIGINT) AS label, cs FROM (
           SELECT qid, vec_id, label, cs,
             row_number() OVER (PARTITION BY qid
               ORDER BY cs DESC, vec_id) AS rn
           FROM d) WHERE rn = 1 ORDER BY qid""",
    "q_knn_join" ->
      """WITH q AS (
           SELECT vec_id AS qid, embedding AS qv FROM embeddings
           ORDER BY vec_id LIMIT 40),
         d AS (
           SELECT q.qid, e.vec_id,
             sum(CAST(e.embedding[i.i + 1] AS DOUBLE)
               * CAST(q.qv[i.i + 1] AS DOUBLE)) AS dp,
             sum(CAST(e.embedding[i.i + 1] AS DOUBLE)
               * CAST(e.embedding[i.i + 1] AS DOUBLE)) AS na,
             sum(CAST(q.qv[i.i + 1] AS DOUBLE)
               * CAST(q.qv[i.i + 1] AS DOUBLE)) AS nb
           FROM embeddings e, q, (SELECT unnest(range(64)) AS i) i
           WHERE e.vec_id <> q.qid
           GROUP BY q.qid, e.vec_id),
         r AS (
           SELECT qid, vec_id,
             round(dp / (sqrt(na) * sqrt(nb)), 4) AS cs
           FROM d)
         SELECT qid, vec_id, cs, rn FROM (
           SELECT qid, vec_id, cs,
             row_number() OVER (PARTITION BY qid
                                ORDER BY cs DESC, vec_id) AS rn
           FROM r) t
         WHERE rn <= 3 ORDER BY qid, rn""",
    "q_embed_quant" ->
      """WITH m AS (
           SELECT e.vec_id,
             max(abs(CAST(e.embedding[i.i + 1] AS DOUBLE))) / 127.0 AS s
           FROM embeddings e, (SELECT unnest(range(64)) AS i) i
           GROUP BY e.vec_id),
         c AS (
           SELECT e.vec_id, m.s,
             CASE WHEN m.s = 0.0 THEN CAST(0 AS BIGINT)
               ELSE CAST(floor(CAST(e.embedding[i.i + 1] AS DOUBLE) / m.s
                               + 0.5) AS BIGINT) END AS code,
             CAST(e.embedding[i.i + 1] AS DOUBLE) AS x
           FROM embeddings e
           JOIN m ON e.vec_id = m.vec_id,
           (SELECT unnest(range(64)) AS i) i)
         SELECT vec_id, floor(s * 1000000 + 0.5) / 1000000 AS scale6,
           CAST(sum(code) AS BIGINT) AS code_sum,
           floor(max(abs(x - code * s)) * 1000000 + 0.5) / 1000000
             AS max_err6
         FROM c GROUP BY vec_id, s ORDER BY vec_id""",
    "q_quant_topk" ->
      """WITH m AS (
           SELECT e.vec_id,
             max(abs(CAST(e.embedding[i.i + 1] AS DOUBLE))) / 127.0 AS s
           FROM embeddings e, (SELECT unnest(range(64)) AS i) i
           GROUP BY e.vec_id),
         q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
         d AS (
           SELECT e.vec_id,
             sum((CASE WHEN m.s = 0.0 THEN 0.0
                  ELSE floor(CAST(e.embedding[i.i + 1] AS DOUBLE) / m.s
                             + 0.5) * m.s END)
               * CAST(q.qe[i.i + 1] AS DOUBLE)) AS dp,
             sum((CASE WHEN m.s = 0.0 THEN 0.0
                  ELSE floor(CAST(e.embedding[i.i + 1] AS DOUBLE) / m.s
                             + 0.5) * m.s END)
               * (CASE WHEN m.s = 0.0 THEN 0.0
                  ELSE floor(CAST(e.embedding[i.i + 1] AS DOUBLE) / m.s
                             + 0.5) * m.s END)) AS na,
             sum(CAST(q.qe[i.i + 1] AS DOUBLE)
               * CAST(q.qe[i.i + 1] AS DOUBLE)) AS nb
           FROM embeddings e JOIN m ON e.vec_id = m.vec_id,
             q, (SELECT unnest(range(64)) AS i) i
           WHERE e.vec_id <> 0
           GROUP BY e.vec_id)
         SELECT vec_id, round(dp / (sqrt(na) * sqrt(nb)), 4) AS cs
         FROM d ORDER BY cs DESC, vec_id LIMIT 10""",
    "q_embed_centroid" ->
      """SELECT CAST(label AS BIGINT) AS label, i.i AS pos,
           floor(avg(CAST(embedding[i.i + 1] AS DOUBLE)) * 10000 + 0.5)
             / 10000 AS c,
           count(*) AS n
         FROM embeddings, (SELECT unnest(range(64)) AS i) i
         GROUP BY label, i.i ORDER BY label, pos""",
    "q_centroid_drift" ->
      """WITH x AS (
           SELECT CAST(label AS BIGINT) AS label, vec_id, i.i AS pos,
             CAST(embedding[i.i + 1] AS DOUBLE) AS x
           FROM embeddings, (SELECT unnest(range(64)) AS i) i),
         c AS (
           SELECT label, pos,
             floor(avg(CASE WHEN vec_id % 2 = 0 THEN x END) * 1e6 + 0.5)
               / 1e6 AS c0,
             floor(avg(CASE WHEN vec_id % 2 = 1 THEN x END) * 1e6 + 0.5)
               / 1e6 AS c1,
             CAST(sum(CASE WHEN vec_id % 2 = 0 THEN 1 ELSE 0 END)
               AS BIGINT) AS n_even,
             CAST(sum(CASE WHEN vec_id % 2 = 1 THEN 1 ELSE 0 END)
               AS BIGINT) AS n_odd
           FROM x GROUP BY 1, 2)
         SELECT label, max(n_even) AS n_even, max(n_odd) AS n_odd,
           floor(sum(c0 * c1)
                 / (sqrt(sum(c0 * c0)) * sqrt(sum(c1 * c1)))
                 * 1e4 + 0.5) / 1e4 AS drift_cos
         FROM c GROUP BY label ORDER BY label""",
    "q_embed_cov" ->
      """WITH xv AS (
           SELECT vec_id, i.i AS i,
             CAST(embedding[CAST(i.i AS INT) + 1] AS DOUBLE) AS xi
           FROM embeddings, (SELECT unnest(range(64)) AS i) i),
         nn AS (SELECT count(*) AS n FROM embeddings),
         s AS (SELECT i, sum(xi) AS si FROM xv GROUP BY i),
         p AS (SELECT a.i AS i, b.i AS j, sum(a.xi * b.xi) AS sij
               FROM xv a JOIN xv b
                 ON a.vec_id = b.vec_id AND a.i <= b.i
               GROUP BY a.i, b.i)
         SELECT p.i, p.j,
           floor((sij / nn.n - (sa.si / nn.n) * (sb.si / nn.n))
                 * 1000000 + 0.5) / 1000000 AS cov
         FROM p JOIN s sa ON sa.i = p.i JOIN s sb ON sb.i = p.j
         CROSS JOIN nn ORDER BY p.i, p.j""",
    "q_embed_outlier" ->
      """WITH x AS (
           SELECT vec_id, i.i AS pos,
             CAST(embedding[CAST(i.i AS INT) + 1] AS DOUBLE) AS x
           FROM embeddings, (SELECT unnest(range(64)) AS i) i),
         st AS (SELECT pos, sum(x) AS sx, sum(x * x) AS sxx,
                  count(*) AS n
                FROM x GROUP BY pos),
         mv AS (SELECT pos, sx / n AS mu,
                  sxx / n - (sx / n) * (sx / n) AS v
                FROM st)
         SELECT vec_id,
           floor(sum(CASE WHEN v = 0 THEN 0.0
                     ELSE (x - mu) * (x - mu) / v END)
                 * 10000 + 0.5) / 10000 AS md2
         FROM x JOIN mv USING (pos)
         GROUP BY vec_id ORDER BY md2 DESC, vec_id LIMIT 20""",
    "q_semdedup" ->
      """WITH RECURSIVE i AS (SELECT unnest(range(64)) AS i),
         k AS (SELECT label,
                 (count(*) + greatest(32,
                    CAST(ceil(sqrt(count(*))) AS BIGINT)) - 1)
                 // greatest(32,
                    CAST(ceil(sqrt(count(*))) AS BIGINT)) AS k2
               FROM embeddings GROUP BY 1),
         rk AS (SELECT vec_id, label,
                  row_number() OVER (PARTITION BY label ORDER BY vec_id)
                    AS rk
                FROM embeddings),
         sd AS (SELECT r.label, r.vec_id AS sid, e.embedding AS sv
                FROM rk r JOIN k USING (label)
                JOIN embeddings e ON e.vec_id = r.vec_id
                WHERE r.rk <= k.k2),
         dd AS (SELECT e.vec_id, e.label, s.sid,
                  floor((sum(CAST(e.embedding[i.i + 1] AS DOUBLE)
                           * CAST(e.embedding[i.i + 1] AS DOUBLE))
                       - 2 * sum(CAST(e.embedding[i.i + 1] AS DOUBLE)
                             * CAST(s.sv[i.i + 1] AS DOUBLE))
                       + sum(CAST(s.sv[i.i + 1] AS DOUBLE)
                           * CAST(s.sv[i.i + 1] AS DOUBLE)))
                    * 10000 + 0.5) / 10000 AS d2
                FROM embeddings e JOIN sd s ON e.label = s.label, i
                GROUP BY 1, 2, 3),
         asg AS (SELECT vec_id, label, sid AS sub FROM (
                   SELECT vec_id, label, sid,
                     row_number() OVER (PARTITION BY vec_id
                       ORDER BY d2, sid) AS rn
                   FROM dd) t WHERE rn = 1),
         p AS (
           SELECT a.vec_id AS ia, b.vec_id AS ib,
             ea.embedding AS va, eb.embedding AS vb
           FROM asg a JOIN asg b
             ON a.label = b.label AND a.sub = b.sub
            AND a.vec_id < b.vec_id
           JOIN embeddings ea ON ea.vec_id = a.vec_id
           JOIN embeddings eb ON eb.vec_id = b.vec_id),
         d AS (
           SELECT ia, ib,
             sum(CAST(va[i.i + 1] AS DOUBLE) * CAST(vb[i.i + 1] AS DOUBLE))
               AS dp,
             sum(CAST(va[i.i + 1] AS DOUBLE) * CAST(va[i.i + 1] AS DOUBLE))
               AS na,
             sum(CAST(vb[i.i + 1] AS DOUBLE) * CAST(vb[i.i + 1] AS DOUBLE))
               AS nb
           FROM p, (SELECT unnest(range(64)) AS i) i
           GROUP BY ia, ib),
         ed AS (
           SELECT ia, ib FROM d
           WHERE floor(dp / (sqrt(na) * sqrt(nb)) * 10000 + 0.5) / 10000
                 >= 0.35),
         e AS (SELECT ia AS a, ib AS b FROM ed
               UNION SELECT ib, ia FROM ed),
         reach AS (
           SELECT DISTINCT a AS id, a AS lbl FROM e
           UNION
           SELECT e.a, r.lbl FROM e JOIN reach r ON r.id = e.b),
         cc AS (SELECT id, min(lbl) AS keeper FROM reach GROUP BY id)
         SELECT v.vec_id, coalesce(cc.keeper, v.vec_id) AS rep_id,
           CAST(coalesce(cc.keeper, v.vec_id) = v.vec_id AS BIGINT) AS keep
         FROM embeddings v LEFT JOIN cc ON cc.id = v.vec_id
         ORDER BY v.vec_id""",
    "q_lsh_bucket" ->
      """WITH w AS (
           SELECT t.t, b.b, j.j,
             CAST(CAST(('0x' || substr(md5((t.t * 8 + b.b) || ':' || j.j),
               1, 8)) AS UBIGINT) % 7 AS BIGINT) - 3 AS wt
           FROM (SELECT unnest(range(2)) AS t) t,
                (SELECT unnest(range(8)) AS b) b,
                (SELECT unnest(range(64)) AS j) j),
         d AS (
           SELECT e.vec_id, w.t, w.b,
             floor(sum(CAST(e.embedding[w.j + 1] AS DOUBLE) * w.wt)
                   * 10000 + 0.5) / 10000 AS dot
           FROM embeddings e, w
           GROUP BY 1, 2, 3),
         bk AS (
           SELECT vec_id, t,
             CAST(sum(CASE WHEN dot >= 0 THEN 1 << b ELSE 0 END)
               AS BIGINT) AS bucket
           FROM d GROUP BY 1, 2)
         SELECT vec_id, t AS tbl, bucket,
           count(*) OVER (PARTITION BY t, bucket) AS n_bucket
         FROM bk ORDER BY vec_id, tbl""",
    "q_kmeans" ->
      """WITH i AS (SELECT unnest(range(64)) AS i),
         c0 AS (SELECT vec_id AS c, embedding AS cv FROM embeddings
                WHERE vec_id < 4),
         d1 AS (
           SELECT e.vec_id, c0.c,
             floor((sum(CAST(e.embedding[i.i + 1] AS DOUBLE)
                      * CAST(e.embedding[i.i + 1] AS DOUBLE))
               - 2 * sum(CAST(e.embedding[i.i + 1] AS DOUBLE)
                       * CAST(c0.cv[i.i + 1] AS DOUBLE))
               + sum(CAST(c0.cv[i.i + 1] AS DOUBLE)
                   * CAST(c0.cv[i.i + 1] AS DOUBLE))) * 10000 + 0.5)
               / 10000 AS d2
           FROM embeddings e, c0, i GROUP BY 1, 2),
         a1 AS (
           SELECT vec_id, c AS cluster FROM (
             SELECT vec_id, c,
               row_number() OVER (PARTITION BY vec_id ORDER BY d2, c) AS rn
             FROM d1) t WHERE rn = 1),
         c1 AS (
           SELECT a1.cluster AS c, i.i AS pos,
             floor(avg(CAST(e.embedding[i.i + 1] AS DOUBLE)) * 10000 + 0.5)
               / 10000 AS cx
           FROM embeddings e JOIN a1 USING (vec_id) CROSS JOIN i
           GROUP BY 1, 2),
         cn AS (SELECT c, sum(cx * cx) AS cc FROM c1 GROUP BY 1),
         d2r AS (
           SELECT e.vec_id, c1.c,
             floor((sum(CAST(e.embedding[c1.pos + 1] AS DOUBLE)
                      * CAST(e.embedding[c1.pos + 1] AS DOUBLE))
               - 2 * sum(CAST(e.embedding[c1.pos + 1] AS DOUBLE) * c1.cx)
               + min(cn.cc)) * 10000 + 0.5) / 10000 AS d2
           FROM embeddings e CROSS JOIN c1 JOIN cn ON cn.c = c1.c
           GROUP BY 1, 2),
         a2 AS (
           SELECT vec_id, cluster, d2 FROM (
             SELECT vec_id, c AS cluster, d2,
               row_number() OVER (PARTITION BY vec_id ORDER BY d2, c) AS rn
             FROM d2r) t WHERE rn = 1)
         SELECT vec_id, cluster, d2,
           count(*) OVER (PARTITION BY cluster) AS n
         FROM a2 ORDER BY vec_id""",
    "q_ann_pq" -> s"""$pqOracleCtes
         SELECT cp.vec_id, code_0, code_1, code_2, code_3, adc.adc
         FROM cp JOIN adc USING (vec_id) ORDER BY vec_id""",
    "q_ann_ivfpq" -> s"""$pqOracleCtes,
         cent AS (
           SELECT label, i2.i AS pos,
             avg(CAST(embedding[i2.i + 1] AS DOUBLE)) AS cx
           FROM embeddings, (SELECT unnest(range(64)) AS i) i2
           GROUP BY label, i2.i),
         cscore AS (
           SELECT c.label,
             sum(c.cx * CAST(q.qe[c.pos + 1] AS DOUBLE)) /
               (sqrt(sum(c.cx * c.cx)) *
                sqrt(sum(CAST(q.qe[c.pos + 1] AS DOUBLE)
                       * CAST(q.qe[c.pos + 1] AS DOUBLE)))) AS ccs
           FROM cent c, q GROUP BY c.label),
         best AS (SELECT label FROM cscore ORDER BY ccs DESC, label
                  LIMIT 1)
         SELECT cp.vec_id, CAST(v.label AS BIGINT) AS label,
           code_0, code_1, code_2, code_3, adc.adc
         FROM cp JOIN adc USING (vec_id)
         JOIN embeddings v ON v.vec_id = cp.vec_id
         WHERE v.label = (SELECT label FROM best) AND cp.vec_id <> 0
         ORDER BY adc.adc, cp.vec_id LIMIT 10""",
    "q_ndcg_ivf" ->
      """WITH q AS (
           SELECT vec_id AS qid, embedding AS qv FROM embeddings
           ORDER BY vec_id LIMIT 40),
         cent AS (
           SELECT label, i.i AS pos, avg(CAST(embedding[i.i + 1] AS DOUBLE))
             AS cx
           FROM embeddings, (SELECT unnest(range(64)) AS i) i
           GROUP BY label, i.i),
         cscore AS (
           SELECT q.qid, c.label,
             floor(sum(c.cx * CAST(q.qv[c.pos + 1] AS DOUBLE)) /
               (sqrt(sum(c.cx * c.cx)) *
                sqrt(sum(CAST(q.qv[c.pos + 1] AS DOUBLE)
                       * CAST(q.qv[c.pos + 1] AS DOUBLE))))
               * 1000000 + 0.5) / 1000000 AS ccs
           FROM cent c, q GROUP BY q.qid, c.label),
         best AS (
           SELECT qid, label AS best_label FROM (
             SELECT qid, label,
               row_number() OVER (PARTITION BY qid
                 ORDER BY ccs DESC, label) AS rn
             FROM cscore) WHERE rn = 1),
         d AS (
           SELECT q.qid, e.vec_id, e.label,
             round(sum(CAST(e.embedding[i.i + 1] AS DOUBLE)
                     * CAST(q.qv[i.i + 1] AS DOUBLE)) /
               (sqrt(sum(CAST(e.embedding[i.i + 1] AS DOUBLE)
                       * CAST(e.embedding[i.i + 1] AS DOUBLE))) *
                sqrt(sum(CAST(q.qv[i.i + 1] AS DOUBLE)
                       * CAST(q.qv[i.i + 1] AS DOUBLE)))), 4) AS cs
           FROM embeddings e, q, (SELECT unnest(range(64)) AS i) i
           WHERE e.vec_id <> q.qid
           GROUP BY q.qid, e.vec_id, e.label),
         truth AS (
           SELECT qid, vec_id, 11 - rn AS rel FROM (
             SELECT qid, vec_id,
               row_number() OVER (PARTITION BY qid
                 ORDER BY cs DESC, vec_id) AS rn
             FROM d) WHERE rn <= 10),
         ivf AS (
           SELECT qid, vec_id, rn AS pos FROM (
             SELECT d.qid, d.vec_id,
               row_number() OVER (PARTITION BY d.qid
                 ORDER BY d.cs DESC, d.vec_id) AS rn
             FROM d JOIN best b
               ON d.qid = b.qid AND d.label = b.best_label)
           WHERE rn <= 10),
         idcg AS (
           SELECT sum((11 - i) / log2(i + 1.0)) AS v
           FROM (SELECT unnest(range(1, 11)) AS i))
         SELECT i.qid,
           floor(sum(coalesce(t.rel, 0) / log2(i.pos + 1.0))
             * 1e4 + 0.5) / 1e4 AS dcg,
           floor(sum(coalesce(t.rel, 0) / log2(i.pos + 1.0))
             / (SELECT v FROM idcg) * 1e4 + 0.5) / 1e4 AS ndcg
         FROM ivf i LEFT JOIN truth t
           ON i.qid = t.qid AND i.vec_id = t.vec_id
         GROUP BY i.qid ORDER BY i.qid""")

  /** The q_mmr_topk oracle: the same greedy the Spark key runs on its
    * collected C-row candidate frame, unrolled as k−1 argmax CTE rounds
    * (the pagerankIters pattern) — each round scores the not-yet-picked
    * candidates against the selected set and takes the
    * (mmr DESC, id) head. */
  private def mmrOracle: String = {
    val rounds = (2 to 4).map { t =>
      val prev = t - 1
      s"""p$t AS (
           SELECT c.id, c.rel, max(s.sim) AS ms
           FROM cand c JOIN sims s ON s.a = c.id
           JOIN sel$prev sp ON s.b = sp.id
           WHERE c.id NOT IN (SELECT id FROM sel$prev)
           GROUP BY c.id, c.rel),
         s$t AS (
           SELECT $t AS rk, id, rel,
             floor((0.7 * rel - 0.3 * ms) * 1e4 + 0.5) / 1e4 AS mmr
           FROM p$t ORDER BY 0.7 * rel - 0.3 * ms DESC, id LIMIT 1),
         sel$t AS (SELECT id FROM sel$prev
                   UNION ALL SELECT id FROM s$t)"""
    }.mkString(",\n         ")
    s"""WITH q AS (SELECT embedding AS qe FROM embeddings
                   WHERE vec_id = 0),
         i AS (SELECT unnest(range(64)) AS i),
         sc AS (
           SELECT e.vec_id AS id,
             floor(sum(CAST(e.embedding[i.i + 1] AS DOUBLE)
                     * CAST(q.qe[i.i + 1] AS DOUBLE))
               / (sqrt(sum(CAST(e.embedding[i.i + 1] AS DOUBLE)
                         * CAST(e.embedding[i.i + 1] AS DOUBLE)))
                * sqrt(sum(CAST(q.qe[i.i + 1] AS DOUBLE)
                         * CAST(q.qe[i.i + 1] AS DOUBLE))))
               * 1e4 + 0.5) / 1e4 AS rel
           FROM embeddings e, q, i
           WHERE e.vec_id <> 0 GROUP BY e.vec_id),
         cand AS (SELECT id, rel FROM sc ORDER BY rel DESC, id LIMIT 8),
         sims AS (
           SELECT ca.id AS a, cb.id AS b,
             floor(sum(CAST(ea.embedding[i.i + 1] AS DOUBLE)
                     * CAST(eb.embedding[i.i + 1] AS DOUBLE))
               / (sqrt(sum(CAST(ea.embedding[i.i + 1] AS DOUBLE)
                         * CAST(ea.embedding[i.i + 1] AS DOUBLE)))
                * sqrt(sum(CAST(eb.embedding[i.i + 1] AS DOUBLE)
                         * CAST(eb.embedding[i.i + 1] AS DOUBLE))))
               * 1e4 + 0.5) / 1e4 AS sim
           FROM cand ca JOIN cand cb ON ca.id <> cb.id
           JOIN embeddings ea ON ea.vec_id = ca.id
           JOIN embeddings eb ON eb.vec_id = cb.id, i
           GROUP BY ca.id, cb.id),
         s1 AS (SELECT 1 AS rk, id, rel, rel AS mmr FROM cand
                ORDER BY rel DESC, id LIMIT 1),
         sel1 AS (SELECT id FROM s1),
         $rounds
         SELECT CAST(rk AS BIGINT) AS rk, id AS vec_id, rel, mmr
         FROM (SELECT * FROM s1 UNION ALL SELECT * FROM s2
               UNION ALL SELECT * FROM s3 UNION ALL SELECT * FROM s4)
         ORDER BY rk"""
  }

  /** Shared PQ oracle CTEs — the DuckDB twin of [[pqScored]]'s codebook
    * training, code assignment, and ADC table (ends at `cp`/`adc`). */
  private def pqOracleCtes: String =
      """WITH ij AS (
           SELECT m.m, j.j FROM (SELECT unnest(range(4)) AS m) m,
             (SELECT unnest(range(16)) AS j) j),
         c0 AS (SELECT vec_id AS k, embedding AS cv FROM embeddings
                WHERE vec_id < 4),
         d1 AS (
           SELECT e.vec_id, ij.m, c0.k,
             floor((sum(CAST(e.embedding[ij.m*16 + ij.j + 1] AS DOUBLE)
                      * CAST(e.embedding[ij.m*16 + ij.j + 1] AS DOUBLE))
               - 2 * sum(CAST(e.embedding[ij.m*16 + ij.j + 1] AS DOUBLE)
                       * CAST(c0.cv[ij.m*16 + ij.j + 1] AS DOUBLE))
               + sum(CAST(c0.cv[ij.m*16 + ij.j + 1] AS DOUBLE)
                   * CAST(c0.cv[ij.m*16 + ij.j + 1] AS DOUBLE)))
               * 10000 + 0.5) / 10000 AS d2
           FROM embeddings e, c0, ij GROUP BY 1, 2, 3),
         a1 AS (
           SELECT vec_id, m, k AS cl FROM (
             SELECT vec_id, m, k,
               row_number() OVER (PARTITION BY vec_id, m
                                  ORDER BY d2, k) AS rn
             FROM d1) t WHERE rn = 1),
         c1 AS (
           SELECT a1.m, a1.cl, ij.j,
             floor(avg(CAST(e.embedding[a1.m*16 + ij.j + 1] AS DOUBLE))
                   * 10000 + 0.5) / 10000 AS cx
           FROM embeddings e JOIN a1 USING (vec_id)
           JOIN ij ON ij.m = a1.m
           GROUP BY 1, 2, 3),
         cn AS (SELECT m, cl, sum(cx * cx) AS cc FROM c1 GROUP BY 1, 2),
         d2r AS (
           SELECT e.vec_id, c1.m, c1.cl,
             floor((sum(CAST(e.embedding[c1.m*16 + c1.j + 1] AS DOUBLE)
                      * CAST(e.embedding[c1.m*16 + c1.j + 1] AS DOUBLE))
               - 2 * sum(CAST(e.embedding[c1.m*16 + c1.j + 1] AS DOUBLE)
                       * c1.cx)
               + min(cn.cc)) * 10000 + 0.5) / 10000 AS d2
           FROM embeddings e CROSS JOIN c1
           JOIN cn ON cn.m = c1.m AND cn.cl = c1.cl
           GROUP BY 1, 2, 3),
         codes AS (
           SELECT vec_id, m, cl AS code FROM (
             SELECT vec_id, m, cl,
               row_number() OVER (PARTITION BY vec_id, m
                                  ORDER BY d2, cl) AS rn
             FROM d2r) t WHERE rn = 1),
         q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
         qterm AS (
           SELECT c1.m, c1.cl,
             sum(CAST(q.qe[c1.m*16 + c1.j + 1] AS DOUBLE)
               * CAST(q.qe[c1.m*16 + c1.j + 1] AS DOUBLE))
             - 2 * sum(CAST(q.qe[c1.m*16 + c1.j + 1] AS DOUBLE) * c1.cx)
             + sum(c1.cx * c1.cx) AS term
           FROM c1, q GROUP BY 1, 2),
         adc AS (
           SELECT codes.vec_id,
             floor(sum(qterm.term) * 10000 + 0.5) / 10000 AS adc
           FROM codes JOIN qterm
             ON qterm.m = codes.m AND qterm.cl = codes.code
           GROUP BY 1),
         cp AS (
           SELECT vec_id,
             max(CASE WHEN m = 0 THEN code END) AS code_0,
             max(CASE WHEN m = 1 THEN code END) AS code_1,
             max(CASE WHEN m = 2 THEN code END) AS code_2,
             max(CASE WHEN m = 3 THEN code END) AS code_3
           FROM codes GROUP BY 1)"""
}
