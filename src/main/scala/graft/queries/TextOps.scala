package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** T4 — LLM-training-pipeline text operators over `documents`
  * (SURVEY §2.10; mandated by BASELINE.json's north star).
  *
  * Codegen discipline, and its one measured exception: Spark's
  * higher-order array functions (transform/filter/aggregate) are
  * CodegenFallback — interpreted — so hot paths prefer codegen-capable
  * shapes (plain split(), multi-column min() aggregation for MinHash).
  * n-grams are the exception: the interpreted transform/slice build in
  * [[gramRows]] is map-only, while the codegen'd alternative (posexplode
  * + window lead()) shuffles AND sorts the whole token stream — measured
  * at sf0.1, the shuffle costs more than the interpretation (warm jaccard
  * 1.39 s → 0.87 s after the switch). Exchange elimination outranks
  * codegen when the two conflict. (documents.text is verified clean
  * single-space-separated at every SF, so split() alone tokenizes
  * exactly — asserted in ScalaTest.)
  *
  * Where the oracle needs cross-engine-identical hashing we use md5
  * (bit-identical in Spark and DuckDB); the xxhash64-based scale variants
  * (q_simhash, graft.functions.MinHashAgg) have engine-specific values →
  * oracle omitted per SURVEY §7.5, ScalaTest-covered instead.
  */
object TextOps {
  private def T(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.table(s, dir, n)

  /** Whitespace tokens (text is clean: no empty tokens at any SF). */
  private def toks(c: Column): Column = split(c, " ")

  /** One row per word n-gram: (doc_id, lang, gram). The grams are built
    * entirely with array higher-order functions (transform/slice over the
    * token array) — ZERO exchange and no per-doc sort, vs the previous
    * posexplode + window-lead() formulation whose partitionBy(doc_id)
    * shuffle-and-sort dominated every gram-based query. At 100 TB this is
    * the difference between a map-only gram stage and a full shuffle of
    * the token stream. */
  private[graft] def gramRows(d: DataFrame, n: Int): DataFrame =
    graft.Tables.fanout(d, "doc_id") // parallelize the gram map stage
      .select(col("doc_id"), col("lang"), toks(col("text")).as("__ws"))
      .select(col("doc_id"), col("lang"), explode(expr(
        // sequence(0, m) would generate a DESCENDING range for m < 0
        // (doc shorter than n words) — guard with an empty array
        s"""CASE WHEN size(__ws) < $n THEN array()
            ELSE transform(sequence(0, size(__ws) - $n),
                 i -> array_join(slice(__ws, i + 1, $n), ' ')) END"""))
        .as("gram"))

  /** (doc_id, h0..h15) — the raw 16-hash min-hash signature frame, one
    * aggregation pass (map-side partial min — the shuffle carries one
    * row per doc, not per gram). r12: factored out of [[bandRows]] so
    * the estimate-vs-exact audit key can read the hashes directly. */
  private[graft] def minhashSigs(d: DataFrame): DataFrame = {
    // the distinct looks redundant (min() is idempotent under duplicate
    // grams) but is kept deliberately: it shrinks the md5×16 work to
    // distinct grams. r14: gramRows now fans the scan out by doc_id
    // up front, so BOTH the distinct and the groupBy(doc_id) below
    // reuse that partitioning — the gram-level exchange this comment
    // previously justified (and the sig-level one) fold into the one
    // raw-row exchange; gram building AND the md5 mins run on every
    // core. Plan: plans/r14/q_minhash_band_{before,after2}.txt.
    val g = gramRows(d, 3).select("doc_id", "gram").distinct()
    val mins = (0 until 16).map(i =>
      min(md5(concat(lit(s"$i:"), col("gram")))).as(s"h$i"))
    g.groupBy("doc_id").agg(mins.head, mins.tail: _*)
  }

  /** Fold a [[minhashSigs]] frame into the 4-band LSH rows. */
  private[graft] def bandsOfSigs(sig: DataFrame): DataFrame = {
    val bands = (0 until 4).map(b => struct(
      lit(b.toLong).as("band"),
      md5(concat_ws("|", (0 until 4).map(j => col(s"h${4 * b + j}")): _*))
        .as("band_sig")))
    sig.select(col("doc_id"), explode(array(bands: _*)).as("bs"))
      .select(col("doc_id"), col("bs.band").as("band"),
        col("bs.band_sig").as("band_sig"))
  }

  private[graft] def bandRows(d: DataFrame): DataFrame =
    bandsOfSigs(minhashSigs(d))

  /** (doc_id, simhash) — the 32-bit md5-based simhash signature frame
    * shared by q_simhash (the signature surface) and q_simhash_pairs
    * (pigeonhole near-dup extraction): token hash = first 8 md5 hex chars
    * as an integer (bit-identical in DuckDB), frequency-weighted sign
    * sums per bit, one aggregation pass. */
  private[graft] def simhashFrame(d: DataFrame): DataFrame = {
    val tok = graft.Tables.fanout(d, "doc_id") // parallel token+md5 map
      .select(col("doc_id"), explode(toks(col("text"))).as("w"))
      .withColumn("h", conv(substring(md5(col("w")), 1, 8), 16, 10)
        .cast("long"))
    val sums = (0 until 32).map(j =>
      sum(when(col("h").bitwiseAND(lit(1L << j)) =!= 0L, 1L)
        .otherwise(-1L)).as(s"s$j"))
    tok.groupBy("doc_id").agg(sums.head, sums.tail: _*)
      .select(col("doc_id"),
        (0 until 32).map(j =>
          when(col(s"s$j") > 0, lit(1L << j)).otherwise(0L))
          .reduce(_ + _).as("simhash"))
  }

  /** The matching DuckDB SQL for [[simhashFrame]] — a CTE chain ending in
    * `sh(doc_id, simhash)`, shared by both simhash oracles. */
  private def simhashOracleCtes: String = {
    val sums = (0 until 32).map(j =>
      s"sum(CASE WHEN (h & ${1L << j}) <> 0 THEN 1 ELSE -1 END) AS s$j")
      .mkString(", ")
    val bits = (0 until 32).map(j =>
      s"(CASE WHEN s$j > 0 THEN ${1L << j} ELSE 0 END)").mkString(" + ")
    s"""WITH tok AS (
          SELECT doc_id, unnest(string_split(text, ' ')) AS w
          FROM documents),
        h AS (
          SELECT doc_id,
            CAST(('0x' || substr(md5(w), 1, 8)) AS UBIGINT) AS h
          FROM tok),
        b AS (SELECT doc_id, $sums FROM h GROUP BY doc_id),
        sh AS (SELECT doc_id, $bits AS simhash FROM b)"""
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // L1 — exact dedup: content hash → keeper (min doc_id) + group size.
    // At 100 TB: single shuffle on the 256-bit hash; skew-free by design.
    "q_dedup_exact" -> ((s, dir) => {
      T(s, dir, "documents")
        .withColumn("h", sha2(col("text"), 256))
        .groupBy("h")
        .agg(min("doc_id").as("keeper"), count(lit(1)).as("dups"))
        .orderBy("h")
    }),

    // L1b — the BASELINE.md minhash_dedup_proxy shape verbatim
    // (countDistinct(text) per lang) for apples-to-apples BENCH; the real
    // dedup ops are q_dedup_exact / q_minhash_band / operators.Dedup.
    "q_dedup_proxy" -> ((s, dir) => {
      T(s, dir, "documents")
        .groupBy("lang")
        .agg(countDistinct(col("text")).as("nd_text"),
          count(lit(1)).as("cnt"))
        .orderBy("lang")
    }),

    // L2 — MinHash signatures + LSH banding, cross-engine-checkable via
    // md5-derived permutation hashes: 16 hashes, 4 bands × 4 rows.
    // All 16 min-hashes are computed in ONE aggregation pass (map-side
    // partial min → the shuffle carries one row per doc, not per gram).
    // Joining on (band, band_sig) yields candidate pairs sub-quadratically.
    "q_minhash_band" -> ((s, dir) =>
      bandRows(T(s, dir, "documents")).orderBy("doc_id", "band")),

    // L2a2 (r11) — cross-source duplication matrix: per unordered
    // (source_a, source_b) pair, how many near-dup CANDIDATE pairs link
    // them — the corpus-level report curation teams act on ("crawl X
    // largely duplicates crawl Y: dedup them together / drop one side")
    // before any doc-level resolution runs. Pairs come from the SAME
    // band-equi graph every dedup key uses (never all-pairs; a hot
    // band_sig is bounded by the band-join shape q_dedup_resolve
    // measured); sources attach via two doc-equi joins against the slim
    // (doc_id, source) projection — shuffle ∝ pairs + docs — and the
    // output is at most |sources|² rows, orders of magnitude below doc
    // cardinality at any scale.
    // STREAMING stance (r12): the band frame streams exactly as a keyed
    // min-agg per (doc, band) — the maintained-frame pattern the CDC
    // stance documents — and each NEW doc's bands join only against the
    // maintained frame, so candidate pairs arrive incrementally; the
    // matrix itself is then a keyed counter. The declared key stays the
    // batch report (its consumer cadence is the crawl snapshot, not the
    // event).
    "q_source_overlap" -> ((s, dir) => {
      val d = T(s, dir, "documents")
      val pairs = graft.operators.Dedup.bandGraph(d).edges
      val src = d.select(col("doc_id"), col("source"))
      pairs
        .join(src.withColumnRenamed("doc_id", "da")
          .withColumnRenamed("source", "sa"), "da")
        .join(src.withColumnRenamed("doc_id", "db")
          .withColumnRenamed("source", "sb"), "db")
        .select(least(col("sa"), col("sb")).as("source_a"),
          greatest(col("sa"), col("sb")).as("source_b"))
        .groupBy("source_a", "source_b")
        .agg(count(lit(1)).as("dup_pairs"))
        .orderBy("source_a", "source_b")
    }),

    // L2a3 (r12) — LSH estimate-vs-exact AUDIT: for every band-candidate
    // pair, the 16-hash min-hash Jaccard ESTIMATE (matching mins / 16,
    // Broder 1997's unbiased estimator) against the EXACT 3-gram
    // Jaccard — the dedup twin of q_ann_recall: the measurement that
    // justifies (or vetoes) the banding threshold, computed by the
    // engine itself. Plan: the cached signature frame serves BOTH the
    // band fold (candidate generation) and the per-pair hash compare;
    // exact Jaccard joins the gram frame only on CANDIDATE docs
    // (shuffle bounded by the band-equi pair volume, never all-pairs).
    // est/jac/err are ratios of exact integers rounded on the shared
    // 4-dp grid; err is computed from the UNROUNDED ratios.
    "q_minhash_est_audit" -> ((s, dir) => {
      val d = T(s, dir, "documents")
      val sig = graft.Caching.cache(minhashSigs(d))
      val bands = bandsOfSigs(sig)
      val pairs = bands.as("a").join(bands.as("b"),
          col("a.band") === col("b.band") &&
          col("a.band_sig") === col("b.band_sig") &&
          col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("da"), col("b.doc_id").as("db"))
        .distinct()
      val sa = sig.toDF(sig.columns.map(c =>
        if (c == "doc_id") "da" else c + "_a").toIndexedSeq: _*)
      val sb = sig.toDF(sig.columns.map(c =>
        if (c == "doc_id") "db" else c + "_b").toIndexedSeq: _*)
      val est = pairs.join(sa, "da").join(sb, "db")
        .select(col("da"), col("db"),
          (0 until 16).map(i =>
            when(col(s"h${i}_a") === col(s"h${i}_b"), 1L).otherwise(0L))
            .reduce(_ + _).as("mh_match"))
      val g = graft.Caching.cache(
        gramRows(d, 3).select("doc_id", "gram").distinct())
      val sizes = g.groupBy("doc_id").agg(count(lit(1)).as("n"))
      val inter = pairs
        .join(g.select(col("doc_id").as("da"), col("gram")), "da")
        .join(g.select(col("doc_id").as("db"), col("gram")),
          Seq("db", "gram"))
        .groupBy("da", "db").agg(count(lit(1)).as("inter"))
      est.join(inter, Seq("da", "db"), "left")
        .na.fill(0L, Seq("inter"))
        .join(sizes.select(col("doc_id").as("da"), col("n").as("na")),
          "da")
        .join(sizes.select(col("doc_id").as("db"), col("n").as("nb")),
          "db")
        .select(col("da"), col("db"), col("mh_match"), col("inter"),
          fround(col("mh_match") / 16.0, 4).as("est_sim"),
          fround(col("inter") / (col("na") + col("nb") - col("inter")), 4)
            .as("jac"),
          fround(col("mh_match") / 16.0 -
            col("inter") / (col("na") + col("nb") - col("inter")), 4)
            .as("err"))
        .orderBy("da", "db")
    }),

    // L2b — SimHash, oracle-checked 32-bit variant: token hash = first 8
    // md5 hex chars parsed as an integer (bit-identical in both engines),
    // frequency-weighted sign sums per bit, one aggregation pass (32
    // map-side-combinable sum columns — the shuffle carries one row per
    // doc). The xxhash64 64-bit scale variant is operators.Dedup.simhash
    // (ScalaTest-pinned); this declared key proves the algorithm
    // cross-engine.
    "q_simhash" -> ((s, dir) =>
      simhashFrame(T(s, dir, "documents")).orderBy("doc_id")),

    // L2b2 — simhash NEAR-DUP PAIRS via pigeonhole blocking (r6): the
    // signature alone (q_simhash) doesn't find duplicates — this key
    // extracts the pairs within Hamming distance 3, SUB-QUADRATICALLY.
    // Pigeonhole: split the 32-bit simhash into 4 byte chunks; any pair
    // within distance 3 must agree on >= 1 whole chunk, so candidates
    // come from 4 chunk-equality joins (one equi shuffle on (chunk#,
    // value)) — never all pairs. bit_count(a XOR b) then filters exactly;
    // the DuckDB oracle recomputes with the O(n²) predicate directly.
    "q_simhash_pairs" -> ((s, dir) => {
      val sh = graft.Caching.cache(simhashFrame(T(s, dir, "documents")))
      def chunked(id: String, hc: String) = sh
        .select(col("doc_id").as(id), col("simhash").as(hc),
          posexplode(array((0 until 4).map(c =>
            shiftright(col("simhash"), 8 * c).bitwiseAND(lit(255L))): _*))
            .as(Seq("c", "v")))
      chunked("a", "ha").join(chunked("b", "hb"), Seq("c", "v"))
        .filter(col("a") < col("b"))
        .select("a", "b", "ha", "hb").distinct() // pairs agree on 2+ chunks
        .withColumn("dist",
          bit_count(col("ha").bitwiseXOR(col("hb"))).cast("long"))
        .filter(col("dist") <= 3)
        .select("a", "b", "dist")
        .orderBy("a", "b")
    }),

    // L2c — n-gram Jaccard near-dup via a true inverted index: grams
    // group per (lang, gram) posting list, UNIQUE grams (the vast
    // majority of word 4-grams) are dropped before any pair exists —
    // they can't contribute to an intersection — and the surviving
    // short lists explode to ordered doc pairs. One shuffle of the gram
    // frame total, vs two sides of a self-join; the language blocking
    // keeps posting lists (and so pair counts) sub-quadratic at corpus
    // scale. Pair generation is df-CAPPED via [[operators.Postings]]
    // (r11): a gram shared by >128 docs is boilerplate whose df² pair
    // term would dominate the job while carrying ~zero Jaccard signal —
    // dropped before the explode, mirrored in the oracle, mass
    // reported by q_posting_df. Sizes still count ALL distinct grams
    // (the denominators stay exact). Top-50 pairs.
    "q_ngram_jaccard" -> ((s, dir) => {
      // collect_set fuses per-doc gram dedup INTO the posting-list
      // aggregation: the gram frame shuffles exactly ONCE (on
      // (lang, gram)); doc sizes then derive from the posting lists
      // themselves (number of lists containing the doc == its distinct
      // gram count), so no second pass over the token stream. persist:
      // the postings feed both the sizes branch and the pair branch.
      val posts = graft.Caching.cache(graft.operators.Postings
        .postingLists(gramRows(T(s, dir, "documents"), 4),
          Seq("lang", "gram")))
      // r15: sizes feeds TWO joins (na, nb) — uncached the posting-list
      // explode + per-doc agg ran twice per execution (twin probe stages)
      val sizes = graft.Caching.cache(
        posts.select(explode(col("ds")).as("doc_id"))
          .groupBy("doc_id").agg(count(lit(1)).as("n")))
      val pairs = graft.operators.Postings.pairCounts(posts)
      pairs
        .join(sizes.withColumnRenamed("doc_id", "da")
          .withColumnRenamed("n", "na"), "da")
        .join(sizes.withColumnRenamed("doc_id", "db")
          .withColumnRenamed("n", "nb"), "db")
        .withColumn("jac", fround(col("inter").cast("double") /
          (col("na") + col("nb") - col("inter")), 4))
        .select("da", "db", "jac")
        .orderBy(desc("jac"), asc("da"), asc("db"))
        .limit(50)
    }),

    // Shingle CONTAINMENT (r10): the asymmetric near-dup signal Jaccard
    // misses — a short doc fully embedded in a long one scores low
    // Jaccard but containment(A in B) = |A∩B|/|A| ≈ 1 (the
    // Broder-style measure dedup pipelines use to catch sub-document
    // duplication: quotes, boilerplate wrappers, excerpt pages). Same
    // single-shuffle posting-list plan as q_ngram_jaccard (grams
    // aggregate once on (lang, gram); pairs explode only multi-doc
    // df-capped postings via [[operators.Postings]] — never all-pairs,
    // never a hot-gram df² term), emitting both directions plus
    // cmax = inter/min(|A|,|B|), the symmetric screen. Top-50 by
    // (cmax, da, db) — deterministic, TakeOrdered.
    "q_containment" -> ((s, dir) => {
      val posts = graft.Caching.cache(graft.operators.Postings
        .postingLists(gramRows(T(s, dir, "documents"), 4),
          Seq("lang", "gram")))
      // r15: sizes feeds TWO joins (na, nb) — uncached the posting-list
      // explode + per-doc agg ran twice per execution (twin probe stages)
      val sizes = graft.Caching.cache(
        posts.select(explode(col("ds")).as("doc_id"))
          .groupBy("doc_id").agg(count(lit(1)).as("n")))
      val pairs = graft.operators.Postings.pairCounts(posts)
      pairs
        .join(sizes.withColumnRenamed("doc_id", "da")
          .withColumnRenamed("n", "na"), "da")
        .join(sizes.withColumnRenamed("doc_id", "db")
          .withColumnRenamed("n", "nb"), "db")
        .withColumn("c_ab",
          fround(col("inter").cast("double") / col("na"), 4))
        .withColumn("c_ba",
          fround(col("inter").cast("double") / col("nb"), 4))
        .withColumn("cmax", fround(col("inter").cast("double") /
          least(col("na"), col("nb")), 4))
        .select("da", "db", "c_ab", "c_ba", "cmax")
        .orderBy(desc("cmax"), asc("da"), asc("db"))
        .limit(50)
    }),

    // TF-IDF — the classic training-data relevance score, fully
    // distributed: tf and df are two hash aggregations over the token
    // stream, the corpus size joins in as a broadcast single-row cross
    // join (no driver-side count()), and the top-50 is TakeOrdered.
    "q_tfidf" -> ((s, dir) => {
      val d = T(s, dir, "documents")
      // persist: tf feeds both the document-frequency branch and the
      // final join — without it the token explode + aggregation runs twice
      // r15 (guide §2.5): fanout parallelizes the tokenize map — identity
      // on a multi-file scan
      val tf = graft.Caching.cache(
        graft.Tables.fanout(d, "doc_id").select(col("doc_id"),
          explode(toks(lower(col("text")))).as("w"))
        .groupBy("doc_id", "w").agg(count(lit(1)).as("tf")))
      val dfreq = tf.groupBy("w").agg(count(lit(1)).as("df"))
      val ndocs = d.select(countDistinct("doc_id").as("n"))
      tf.join(dfreq, "w")
        .crossJoin(broadcast(ndocs))
        .withColumn("tfidf", fround(col("tf") *
          log(col("n").cast("double") / col("df")), 4))
        .select("doc_id", "w", "tf", "df", "tfidf")
        .orderBy(desc("tfidf"), asc("w"), asc("doc_id"))
        .limit(50)
    }),

    // Simpson diversity per language (r14; Simpson 1949, public): the
    // probability two token occurrences drawn without replacement are
    // DIFFERENT types — 1 − Σ nᵢ(nᵢ−1)/(N(N−1)) — the concentration
    // complement to q_token_zipf's slope (a corpus dominated by few
    // types scores low; the repetition smell mixing audits read).
    // Exact-integer numerator terms (nᵢ(nᵢ−1) sums as longs — safe to
    // ~3e9 tokens per lang; the denominator multiplies as DOUBLE so
    // 100 TB token counts cannot overflow, and IEEE products of exact
    // ints are engine-identical). One token agg touches the corpus;
    // the per-lang fold runs on vocab-bounded rows.
    "q_simpson" -> ((s, dir) => {
      val cnt = T(s, dir, "documents")
        .select(col("lang"), explode(toks(lower(col("text")))).as("w"))
        .groupBy("lang", "w").agg(count(lit(1)).as("c"))
      cnt.groupBy("lang")
        .agg(count(lit(1)).as("vocab"), sum("c").as("n_tokens"),
          sum(col("c") * (col("c") - 1)).as("ss"))
        .select(col("lang"), col("vocab"), col("n_tokens"),
          fround(lit(1.0) - col("ss").cast("double") /
            (col("n_tokens").cast("double") *
              (col("n_tokens") - 1).cast("double")), 4)
            .as("simpson_div"))
        .orderBy("lang")
    }),

    // Herfindahl–Hirschman source-concentration index per language
    // (r14; public antitrust statistic): Σ share² of docs by source
    // within the language — the single-number "is this language's data
    // all one crawl?" screen that complements q_mutual_info's global
    // dependence readout. Shares are exact-integer ratios; the fold
    // runs on |langs|·|sources| cells.
    "q_herfindahl" -> ((s, dir) => {
      val cells = T(s, dir, "documents")
        .groupBy("lang", "source").agg(count(lit(1)).as("n"))
      val tot = cells.groupBy("lang").agg(sum("n").as("nl"))
      cells.join(broadcast(tot), "lang")
        .groupBy("lang").agg(count(lit(1)).as("n_sources"),
          max("nl").as("n_docs"),
          fround(sum(pow(col("n").cast("double") / col("nl"), 2)), 4)
            .as("hhi"))
        .orderBy("lang")
    }),

    // Out-of-vocabulary rate per language (r14): the fraction of
    // held-out token OCCURRENCES whose type never appears in the
    // training split's vocabulary — the tokenizer/domain-shift
    // diagnostic run before freezing a vocab (reads with q_bpe_train
    // and q_distinct_n). The split is the q_split_hash md5 bucket
    // (buckets 1–12 train, 13–16 held ≈ 3/4 vs 1/4), so the same
    // partition every split key uses. Scale: one token pass each side;
    // the membership join keys on (lang, w) — bounded by train VOCAB
    // (Heaps-sublinear), never by corpus volume.
    "q_oov_rate" -> ((s, dir) => {
      val tok = T(s, dir, "documents")
        .select(col("lang"), col("doc_id"),
          explode(toks(lower(col("text")))).as("w"))
        .withColumn("b", instr(lit("0123456789abcdef"),
          substring(md5(col("doc_id").cast("string")), 1, 1))
          .cast("long"))
      val train = tok.filter(col("b") <= 12)
        .select("lang", "w").distinct()
      tok.filter(col("b") > 12)
        .join(train.withColumn("seen", lit(1L)), Seq("lang", "w"),
          "left")
        .groupBy("lang").agg(count(lit(1)).as("held_tokens"),
          sum(when(col("seen").isNull, 1L).otherwise(0L))
            .as("oov_tokens"))
        .select(col("lang"), col("held_tokens"), col("oov_tokens"),
          fround(col("oov_tokens").cast("double") / col("held_tokens"),
            4).as("oov_rate"))
        .orderBy("lang")
    }),

    // Jensen–Shannon divergence between the train and held splits per
    // language (r14; Lin 1991, public): where q_oov_rate counts tokens
    // the vocab has never seen, JSD measures how far the WHOLE token
    // distribution shifted — the symmetric, finite (no smoothing
    // needed: 0·ln0 = 0 and the mixture is positive wherever either
    // side is) divergence mixing audits threshold on. Determinism: the
    // ln argument reduces to 2·c0·n1/(c0·n1 + c1·n0) — products of
    // exact integers evaluated in DOUBLE with the same association on
    // both engines (and overflow-safe at 100 TB counts); the
    // vocab-row double sum rounds at 4 dp (the q_mutual_info
    // discipline). One token pass; the fold is vocab-bounded per lang.
    "q_js_split" -> ((s, dir) => {
      val tok = T(s, dir, "documents")
        .select(col("lang"), col("doc_id"),
          explode(toks(lower(col("text")))).as("w"))
        .withColumn("b", instr(lit("0123456789abcdef"),
          substring(md5(col("doc_id").cast("string")), 1, 1))
          .cast("long"))
      val cnt = tok.groupBy("lang", "w")
        .agg(sum((col("b") <= 12).cast("long")).as("c0"),
          sum((col("b") > 12).cast("long")).as("c1"))
      val tot = cnt.groupBy("lang")
        .agg(sum("c0").as("n0"), sum("c1").as("n1"))
      val den = col("c0").cast("double") * col("n1") +
        col("c1").cast("double") * col("n0")
      cnt.join(broadcast(tot), "lang")
        .select(col("lang"), col("n0"), col("n1"),
          when(col("c0") > 0, col("c0").cast("double") / col("n0") *
            log(lit(2.0) * col("c0") * col("n1") / den))
            .otherwise(lit(0.0)).as("tp"),
          when(col("c1") > 0, col("c1").cast("double") / col("n1") *
            log(lit(2.0) * col("c1") * col("n0") / den))
            .otherwise(lit(0.0)).as("tq"))
        .groupBy("lang")
        .agg(max("n0").as("n_train_tokens"),
          max("n1").as("n_held_tokens"),
          fround((sum("tp") + sum("tq")) / 2.0, 4).as("jsd"))
        .orderBy("lang")
    }),

    // L4b — n-gram language-model statistics: top-20 word bigrams per
    // language by OCCURRENCE count (not per-doc distinct — an LM counts
    // every occurrence). Map-only gram stage, one partial+final hash agg,
    // TakeOrdered for the top slice.
    "q_ngram_freq" -> ((s, dir) => {
      gramRows(T(s, dir, "documents"), 2)
        .groupBy("lang", "gram").agg(count(lit(1)).as("cnt"))
        .orderBy(desc("cnt"), asc("lang"), asc("gram"))
        .limit(20)
    }),

    // L4c — train/test CONTAMINATION detection (r7): for every training
    // document, how many of its distinct word 4-grams also occur in the
    // benchmark set (here: doc_id % 25 == 0 — the held-out split a real
    // pipeline would read from a second table). The contaminated-doc
    // report is THE standard pre-training hygiene check before a dataset
    // ships. Scale shape: the benchmark gram set is small by
    // construction (benchmarks are ~thousands of docs, not billions) —
    // it broadcasts; the training side is one map-only gram stage + one
    // distinct agg; no all-pairs anything.
    "q_contamination" -> ((s, dir) => {
      // delegates to the parameterized verb (one plan, two surfaces);
      // the key adds the fixture's doc_id%25 split, the 4-dp round, and
      // re-sorts on the ROUNDED frac so the order is oracle-deterministic
      val d = T(s, dir, "documents").select("doc_id", "text")
      graft.operators.TextPipeline.contamination(
          d.filter(col("doc_id") % 25 =!= 0),
          d.filter(col("doc_id") % 25 === 0), 4)
        .withColumn("frac", fround(col("frac"), 4))
        .orderBy(desc("frac"), asc("doc_id"))
    }),

    // L4d — bigram-LM document scoring (r7): the perplexity-proxy
    // quality filter. Train a per-language bigram MLE on the corpus
    // (P(w2|w1) = count(w1 w2) / count(w1 ·)), then score every doc by
    // its mean log-probability — low scorers are the repetitive/garbled
    // docs a quality gate drops. Two hash aggs build the model; scoring
    // joins the doc's bigram occurrences back (model side is
    // vocab²-bounded — the small side at 100 TB).
    "q_lm_score" -> ((s, dir) => {
      // delegates to the parameterized verb (one plan, two surfaces);
      // the key adds the 4-dp round for the oracle hash
      graft.operators.TextPipeline.lmScore(
          T(s, dir, "documents").select("doc_id", "lang", "text"))
        .select(col("doc_id"), col("n_bigrams"),
          fround(col("avg_logp"), 4).as("avg_logp"))
        .orderBy("doc_id")
    }),

    // L4e — CCNet perplexity split (r8): partition each language's
    // corpus into head/middle/tail thirds by the bigram-LM mean
    // log-prob (q_lm_score's scorer; Wenzek et al. 2020) — the CCNet
    // curation recipe keeps head+middle for training and drops the
    // tail. Ranking is on the 4-dp ROUNDED score (fp noise collapses
    // into ties, ties break on doc_id) so the partition is
    // deterministic cross-engine; one window rank per language on top
    // of the LM plan, ntile computed arithmetically in the same
    // WindowExec pass.
    "q_ccnet_split" -> ((s, dir) => {
      graft.operators.TextPipeline.ccnetSplit(
          T(s, dir, "documents").select("doc_id", "lang", "text"))
        .withColumn("bucket",
          when(col("bucket_id") === 1, "head")
            .when(col("bucket_id") === 2, "middle")
            .otherwise("tail"))
        .select("doc_id", "lang", "avg_logp", "bucket_id", "bucket")
        .orderBy("doc_id")
    }),

    // L4 — tokenize + global top-20 word counts.
    "q_text_tokens" -> ((s, dir) => {
      T(s, dir, "documents")
        .select(explode(toks(lower(col("text")))).as("w"))
        .groupBy("w")
        .agg(count(lit(1)).as("cnt"))
        .orderBy(desc("cnt"), asc("w"))
        .limit(20)
    }),

    // Language ID — corpus-derived classifier: score each doc's distinct
    // words against each language's top-50 word list, argmax wins.
    "q_lang_id" -> ((s, dir) => {
      val d = T(s, dir, "documents")
      val tok = graft.Tables.fanout(d, "doc_id") // r15: parallel tokenize
        .select(col("doc_id"), col("lang"),
          explode(toks(col("text"))).as("w"))
      // one aggregation pass over the exploded tokens feeds BOTH branches
      // (per-doc distinct words AND per-language counts) — the persisted
      // frame is per-doc word counts, far smaller than the token stream
      val tokc = graft.Caching.cache(
        tok.groupBy(col("doc_id"), col("lang"), col("w"))
          .agg(count(lit(1)).as("c")))
      val docwords = tokc.select("doc_id", "w")
      val langtop = tokc.groupBy(col("lang").as("cand"), col("w"))
        .agg(sum("c").as("cnt"))
        .withColumn("rn", row_number().over(
          Window.partitionBy("cand").orderBy(desc("cnt"), asc("w"))))
        .filter(col("rn") <= 50)
        .select("cand", "w")
      // langtop is BOUNDED tiny (|langs| x 50 rows at any data scale) but
      // sits behind a window filter Catalyst can't size — broadcast it
      // explicitly so the data-proportional docwords frame never shuffles
      // for this join. Measured flat at sf0.1 (the doc_id re-shuffle
      // after the join dominates either way); the avoided exchange is the
      // one that grows with the corpus.
      val scores = docwords.join(broadcast(langtop), "w")
        .groupBy("doc_id", "cand")
        .agg(count(lit(1)).as("score"))
      val wpick = Window.partitionBy("doc_id")
        .orderBy(desc("score"), asc("cand"))
      val pred = scores.withColumn("rn", row_number().over(wpick))
        .filter(col("rn") === 1)
        .select(col("doc_id"), col("cand").as("pred_lang"))
      d.select("doc_id", "lang").join(pred, Seq("doc_id"), "left")
        .withColumn("pred_lang", coalesce(col("pred_lang"), lit("unk")))
        .withColumn("hit",
          (col("pred_lang") === col("lang")).cast("int").cast("long"))
        .select("doc_id", "lang", "pred_lang", "hit")
        .orderBy("doc_id")
    }),

    // Quality scoring: type-token ratio + avg word length, weighted.
    "q_quality_score" -> ((s, dir) => {
      T(s, dir, "documents")
        .withColumn("t", toks(col("text")))
        .withColumn("nw", size(col("t")).cast("long"))
        .withColumn("uniq", size(array_distinct(col("t"))).cast("long"))
        .withColumn("ttr",
          fround(col("uniq").cast("double") / col("nw"), 4))
        .withColumn("awl",
          fround((length(col("text")) - (col("nw") - 1)).cast("double") /
            col("nw"), 4))
        .withColumn("score",
          fround(lit(0.6) * col("ttr") +
            lit(0.4) * least(col("awl") / 8.0, lit(1.0)), 4))
        .select("doc_id", "nw", "uniq", "ttr", "awl", "score")
        .orderBy("doc_id")
    }),

    // Token counting: whitespace tokens + BPE-ish regex tokens.
    "q_token_count" -> ((s, dir) => {
      T(s, dir, "documents")
        .select(col("doc_id"),
          size(toks(col("text"))).cast("long").as("ws_tokens"),
          size(regexp_extract_all(col("text"), lit("[a-z0-9]+"), lit(0)))
            .cast("long").as("re_tokens"),
          col("n_chars"))
        .orderBy("doc_id")
    }),

    // Duplicate-cluster statistics (r8): the dedup OBSERVABILITY view —
    // how big are the exact-duplicate clusters, how many docs do they
    // absorb? (A curation run reports this before deleting anything.)
    // Group sizes over the text hash, then a bounded histogram over
    // sizes: two integer-exact aggs, output rows = distinct cluster
    // sizes (a handful at any scale).
    "q_dup_stats" -> ((s, dir) => {
      T(s, dir, "documents")
        .groupBy(md5(col("text")).as("h"))
        .agg(count(lit(1)).as("sz"))
        .groupBy("sz")
        .agg(count(lit(1)).as("n_clusters"),
          sum("sz").as("n_docs"))
        .orderBy("sz")
    }),

    // Exact heavy hitters (r8): tokens exceeding 0.5 % of all token
    // occurrences — the "which items dominate the corpus" screen. The
    // threshold test is EXACT integer arithmetic (cnt * 200 > total, no
    // float share in the predicate), so the row set is cross-engine
    // deterministic; the reported share rounds after the fact. Two hash
    // aggs (token counts + a broadcast 1-row total). At 100 TB the
    // bounded-memory single-pass alternative is the Misra–Gries sketch
    // (operators.FreqSketch — guarantee-tested, deliberately not an
    // oracle key since its counter values are merge-order-dependent).
    "q_heavy_hitters" -> ((s, dir) => {
      val tok = T(s, dir, "documents")
        .select(explode(toks(lower(col("text")))).as("w"))
      val counts = tok.groupBy("w").agg(count(lit(1)).as("cnt"))
      val total = counts.agg(sum("cnt").as("total"))
      counts.crossJoin(broadcast(total))
        .filter(col("cnt") * 200 > col("total"))
        .select(col("w"), col("cnt"),
          fround(col("cnt").cast("double") / col("total"), 6).as("share"))
        .orderBy(desc("cnt"), asc("w"))
    }),

    // Zipf rank-frequency fit per language (r8): the corpus-health
    // diagnostic a curation pipeline runs after ingest — rank each
    // language's tokens by frequency, fit ln(freq) ~ ln(rank) over the
    // top 100, report slope/intercept/r2 (natural text sits near slope
    // -1; synthetic or template-heavy corpora flatten). The regression
    // inputs ln(exact int) are bit-identical across engines, so the
    // 4-dp fround is stable. One token agg + one bounded window over
    // lang×100 rows — the heavy explode happens exactly once.
    "q_token_zipf" -> ((s, dir) => {
      val freq = T(s, dir, "documents")
        .select(col("lang"), explode(toks(lower(col("text")))).as("w"))
        .groupBy("lang", "w").agg(count(lit(1)).as("cnt"))
      val wr = Window.partitionBy("lang")
        .orderBy(desc("cnt"), asc("w"))
      freq.withColumn("rank", row_number().over(wr))
        .filter(col("rank") <= 100)
        .groupBy("lang")
        .agg(count(lit(1)).as("n_tokens"),
          fround(regr_slope(log(col("cnt")), log(col("rank"))), 4)
            .as("slope"),
          fround(regr_intercept(log(col("cnt")), log(col("rank"))), 4)
            .as("icept"),
          fround(regr_r2(log(col("cnt")), log(col("rank"))), 4).as("r2"))
        .orderBy("lang")
    }),

    // Document fingerprint: min-md5 over word 5-grams (winnowing-lite).
    // Every doc has ≥10 words at every SF, so the 5-gram set is never
    // empty (asserted in ScalaTest).
    "q_doc_fingerprint" -> ((s, dir) => {
      gramRows(T(s, dir, "documents"), 5)
        .groupBy("doc_id")
        .agg(min(md5(col("gram"))).as("fp"),
          count(lit(1)).as("n_grams"))
        .orderBy("doc_id")
    }),

    // L5 — per-language / per-source corpus stats.
    "q_doc_stats" -> ((s, dir) => {
      T(s, dir, "documents")
        .groupBy("lang", "source")
        .agg(count(lit(1)).as("cnt"),
          fround(avg("n_chars"), 2).as("avg_chars"),
          max("n_chars").as("max_chars"))
        .orderBy("lang", "source")
    }),

    // Deterministic train/val/test split — hash the stable doc key, not
    // rand(): reproducible across runs/engines/partitionings, and at 100 TB
    // the assignment streams with the scan (no shuffle, no state). Bucket =
    // first md5 hex nibble → 16 buckets → 12/2/2 train/val/test.
    "q_split_hash" -> ((s, dir) => {
      T(s, dir, "documents")
        .withColumn("bucket",
          instr(lit("0123456789abcdef"),
            substring(md5(col("doc_id").cast("string")), 1, 1))
            .cast("long"))
        .withColumn("split",
          when(col("bucket") <= 12, "train")
            .when(col("bucket") <= 14, "val")
            .otherwise("test"))
        .select("doc_id", "bucket", "split")
        .orderBy("doc_id")
    }),

    // Multimodal plumbing token: opaque binary column + typed metadata.
    // (The full decode/feature pipeline is graft.multimodal — REAL ImageIO
    // decode for image kinds, REAL javax.sound decode for audio kinds,
    // REAL GIF frame sampling; only video features keep the documented
    // stub. ScalaTest-covered; binary payloads aren't SQL-portable beyond
    // byte length + digest, checked here.)
    "q_multimodal_meta" -> ((s, dir) => {
      T(s, dir, "documents")
        .withColumn("payload", col("text").cast("binary"))
        .select(col("doc_id"),
          octet_length(col("payload")).cast("long").as("nbytes"),
          sha2(col("payload"), 256).as("digest"))
        .orderBy("doc_id")
    }),

    // L4d — Okapi BM25 (Lucene-style +1 idf; k1=1.2, b=0.75): the
    // retrieval scorer a curation pipeline uses for query-based corpus
    // slicing, where q_tfidf is the raw relevance signal. Same plan
    // shape as q_tfidf: tf and df are two hash aggregations over the
    // token stream, doc length joins back per-doc, the corpus constants
    // (N, avgdl) broadcast as a single row — no driver-side count(),
    // top-50 is TakeOrdered. Every float derives from exact integer
    // counts, so the 4-dp half-up round is cross-engine-deterministic.
    "q_bm25" -> ((s, dir) => {
      val (k1, b) = (1.2, 0.75)
      val d = T(s, dir, "documents")
      // cache: tf feeds the df branch, the dl branch, AND the final join
      // r15 (guide §2.5): fanout parallelizes the tokenize map
      val tf = graft.Caching.cache(
        graft.Tables.fanout(d, "doc_id").select(col("doc_id"),
          explode(toks(lower(col("text")))).as("w"))
        .groupBy("doc_id", "w").agg(count(lit(1)).as("tf")))
      val dfreq = tf.groupBy("w").agg(count(lit(1)).as("df"))
      val dl = tf.groupBy("doc_id").agg(sum("tf").as("dl"))
      val corpus = dl.select(count(lit(1)).as("n"),
        (sum("dl").cast("double") / count(lit(1))).as("avgdl"))
      val idf = log(lit(1.0) +
        (col("n") - col("df") + lit(0.5)) / (col("df") + lit(0.5)))
      val tfPart = col("tf") * lit(k1 + 1.0) /
        (col("tf") + lit(k1) *
          (lit(1.0 - b) + lit(b) * col("dl") / col("avgdl")))
      tf.join(dfreq, "w").join(dl, "doc_id")
        .crossJoin(broadcast(corpus))
        .withColumn("bm25", fround(idf * tfPart, 4))
        .select("doc_id", "w", "tf", "df", "dl", "bm25")
        .orderBy(desc("bm25"), asc("w"), asc("doc_id"))
        .limit(50)
    }),


    // L4e — token-entropy quality filter: Shannon entropy of the
    // per-doc token distribution, H = ln(nw) - sum(c·ln c)/nw — the
    // low-diversity screen (boilerplate, keyword stuffing) that
    // complements q_quality_gopher's repetition fractions. One token
    // explode + two hash aggs, fully map-combined; the keep flag
    // compares the ROUNDED entropy (identical in both engines) so the
    // threshold is not a float boundary. norm_ent = H/ln(uniq) ∈ [0,1]
    // (0 when the doc is a single repeated token).
    "q_entropy_filter" -> ((s, dir) => {
      T(s, dir, "documents")
        .select(col("doc_id"), explode(toks(lower(col("text")))).as("w"))
        .groupBy("doc_id", "w").agg(count(lit(1)).as("c"))
        .groupBy("doc_id")
        .agg(sum("c").as("nw"), count(lit(1)).as("uniq"),
          sum(col("c") * log(col("c"))).as("slog"))
        .withColumn("entropy",
          fround(log(col("nw")) - col("slog") / col("nw"), 4))
        .withColumn("norm_ent",
          when(col("uniq") > 1,
            fround(col("entropy") / log(col("uniq")), 4))
            .otherwise(lit(0.0)))
        .withColumn("keep", (col("entropy") >= 3.5).cast("long"))
        .select("doc_id", "nw", "uniq", "entropy", "norm_ent", "keep")
        .orderBy("doc_id")
    }),

    // L1c — cross-document repeated n-gram coverage (Lee et al. 2021,
    // arXiv:2107.06499 — public; the exact-substring-dedup signal): for
    // every doc, how many of its tokens sit inside a 6-gram that also
    // occurs in ANOTHER document. Repeated grams come from one hash agg
    // over the map-only gram stage; their occurrence intervals
    // [st, st+5] merge per doc with the running-max sweep (cumulative
    // max of `en` over st order — pure integer window math, identical
    // in both engines), so overlapping repeats never double-count.
    // Sub-quadratic throughout: the gram join is equi on the gram
    // string, never doc×doc. rep_frac is the threshold a curation pass
    // filters on; at 100 TB the same plan holds with the gram dictionary
    // sharded by hash (it already is — the groupBy shuffle).
    "q_repeat_ngram" -> ((s, dir) => {
      val n = 6
      val d = T(s, dir, "documents")
      // cache: the positional gram frame feeds the repeated-gram
      // dictionary AND the interval join
      val g = graft.Caching.cache(
        d.select(col("doc_id"), toks(col("text")).as("__ws"))
          .select(col("doc_id"),
            posexplode(expr(
              s"""CASE WHEN size(__ws) < $n THEN array()
                  ELSE transform(sequence(0, size(__ws) - $n),
                       i -> array_join(slice(__ws, i + 1, $n), ' ')) END"""))
              .as(Seq("p0", "gram"))))
      val rep = g.groupBy("gram")
        .agg(countDistinct("doc_id").as("nd"))
        .filter(col("nd") > 1).select("gram")
      val iv = g.join(rep, "gram")
        .select(col("doc_id"), (col("p0") + 1).as("st"),
          (col("p0") + lit(n)).as("en"))
      val w = Window.partitionBy("doc_id").orderBy("st")
        .rowsBetween(Window.unboundedPreceding, -1)
      val cov = iv.withColumn("pmax", max("en").over(w))
        .select(col("doc_id"),
          greatest(lit(0), col("en") - greatest(col("st"),
            coalesce(col("pmax"), lit(0)) + 1) + 1).as("c"))
        .groupBy("doc_id").agg(sum("c").as("covered"))
      d.select(col("doc_id"),
          size(toks(col("text"))).cast("long").as("n_tokens"))
        .join(cov, Seq("doc_id"), "left")
        .select(col("doc_id"), col("n_tokens"),
          coalesce(col("covered"), lit(0L)).as("covered"),
          fround(coalesce(col("covered"), lit(0L)).cast("double") /
            col("n_tokens"), 4).as("rep_frac"))
        .orderBy("doc_id")
    }),

    // L4f — temperature-scaled source mixing weights (the multinomial
    // resampling recipe of multi-source LM training — Conneau & Lample
    // 2019, arXiv:1901.07291 §3.1, α-smoothed sampling; public): per-
    // source token counts c_i → weight w_i = c_i^α / Σ c_j^α with
    // α = 0.5 (sqrt — IEEE-exact in both engines), plus the effective
    // token budget w_i·Σc_j the recipe allocates each source. One
    // map-combined agg over a 2-column scan; the source-level frame is
    // O(|sources|) so the normalizer joins as a 1-row broadcast —
    // nothing here scales with the corpus beyond the first agg.
    "q_mix_weights" -> ((s, dir) => {
      val counts = T(s, dir, "documents")
        .select(col("source"),
          size(toks(col("text"))).cast("long").as("nt"))
        .groupBy("source")
        .agg(sum("nt").as("tokens"), count(lit(1)).as("docs"))
      val z = counts.agg(
        sum(sqrt(col("tokens").cast("double"))).as("z"),
        sum("tokens").as("total"))
      counts.crossJoin(broadcast(z))
        .select(col("source"), col("tokens"), col("docs"),
          fround(sqrt(col("tokens").cast("double")) / col("z"), 6)
            .as("weight"),
          fround(sqrt(col("tokens").cast("double")) / col("z")
            * col("total"), 2).as("eff_tokens"))
        .orderBy("source")
    }),

    // L13b — the mixing weights MATERIALIZED (r8): q_mix_weights says
    // how much of each source a α=0.5-temperature mix wants; this key
    // actually draws the sample — each doc's inclusion is a
    // deterministic md5-uniform u ∈ [0,1) against the source's rate
    // min(1, weight·total/tokens) (sources the mix UPsamples saturate
    // at 1; their repetition factor is reported, not materialized).
    // Map-only over the docs after one broadcast of the per-source
    // rate frame — the shape that samples 100 TB in one pass.
    "q_mix_sample" -> ((s, dir) => {
      val d = T(s, dir, "documents")
        .withColumn("nt", size(toks(col("text"))).cast("long"))
      val counts = d.groupBy("source")
        .agg(sum("nt").as("tokens"))
      val z = counts.agg(
        sum(sqrt(col("tokens").cast("double"))).as("z"),
        sum("tokens").as("total"))
      // the PREDICATE rate is the 4-dp-rounded (then capped) value:
      // the raw rate rides z = sum(sqrt(tokens)), an order-dependent
      // double sum that can differ cross-engine in the last ulp — a doc
      // whose u lands in that ulp gap would flip kept/dropped. Rounding
      // FIRST makes the kept row set exact (the q_heavy_hitters
      // exact-predicate discipline).
      val rawRate = sqrt(col("tokens").cast("double")) / col("z") *
        col("total") / col("tokens")
      val rates = counts.crossJoin(broadcast(z))
        .select(col("source").as("rsrc"),
          least(lit(1.0), fround(rawRate, 4)).as("rate"),
          fround(rawRate, 4).as("want_rate"))
      // md5-uniform from the first 6 hex chars (the q_split_hash trick,
      // 24 bits — plenty for a sampling decision)
      val h = md5(col("doc_id").cast("string"))
      val u = (0 until 6).map { i =>
        (instr(lit("0123456789abcdef"), substring(h, i + 1, 1)) - 1)
          .cast("double") * math.pow(16, 5 - i)
      }.reduce(_ + _) / lit(math.pow(16, 6))
      d.join(broadcast(rates), col("source") === col("rsrc"))
        .withColumn("u", u)
        .filter(col("u") < col("rate"))
        .groupBy("source")
        .agg(count(lit(1)).as("kept_docs"),
          sum("nt").as("kept_tokens"),
          max("want_rate").as("want_rate"))
        .orderBy("source")
    }),

    // L13c — WEIGHTED sampling without replacement (r11), the
    // Efraimidis–Vitter A-ES scheme (Efraimidis & Spirakis 2006,
    // IPL 97(5) — public): each doc draws u ∈ (0,1] and ranks by
    // ln(u)/w (equivalent to u^(1/w)); the top-k IS an exact weighted
    // sample without replacement. u derives from the md5-uniform trick
    // (q_mix_sample's 24 bits, +1 so u > 0 — ln stays finite) and w is
    // the doc's token count, so token-heavy docs are proportionally
    // likelier — the standard way to cut a fixed-size training subset
    // that preserves token mass. The rank key rounds at 6 dp (ln is
    // the one libm call; sub-ulp engine differences collapse into
    // ties, broken by doc_id — the shared determinism discipline).
    // Plan: pure map stage + TakeOrdered top-50; at 100 TB this is THE
    // sampling shape — no shuffle, no state, any k.
    "q_sample_weighted" -> ((s, dir) => {
      val h = md5(col("doc_id").cast("string"))
      val bits = (0 until 6).map { i =>
        (instr(lit("0123456789abcdef"), substring(h, i + 1, 1)) - 1)
          .cast("double") * math.pow(16, 5 - i)
      }.reduce(_ + _)
      T(s, dir, "documents")
        .select(col("doc_id"), size(toks(col("text"))).cast("long").as("w"),
          ((bits + lit(1.0)) / lit(math.pow(16, 6))).as("u"))
        .select(col("doc_id"), col("w"),
          fround(log(col("u")) / col("w"), 6).as("skey"))
        .orderBy(desc("skey"), asc("doc_id"))
        .limit(50)
    }),

    // tf-idf cosine pair similarity through the df-capped posting
    // discipline (r12): the IR-weighted near-dup ranker — two documents
    // are similar when they share RARE terms, which is exactly the
    // signal the Postings df ceiling preserves (a hot term's idf ≈ 0,
    // so dropping it BEFORE the pair explode removes ranking-irrelevant
    // mass). TERMS ARE 3-GRAM SHINGLES, the same term space every
    // dedup key here ranks in — the fixture's unigram vocabulary is ~31
    // words (every word df ≫ cap, all pairs vacuously hot), while its
    // gram dfs peak at 5, so the shingle space is where tf-idf carries
    // signal at every scale. The WHOLE computation — weights, norms,
    // dot — restricts to df ≤ 128 terms, so the capped semantics ARE
    // the contract (the oracle mirrors the cutoff). Plan: one cached
    // gram-tf agg → df-filtered idf weights → map-combined norms →
    // term-equi self-join for the dots (pair volume Σ min(df,cap)² ≤
    // cap·Σdf — linear in corpus by the operators.Postings bound) → two
    // doc-keyed norm equi-joins (the norm frame is corpus-sized, so NO
    // broadcast hint — AQE broadcasts at fixture stats, shuffles at
    // scale). Threshold 0.3 on the 4-dp-rounded cosine.
    "q_tfidf_pairs" -> ((s, dir) => {
      val d = T(s, dir, "documents")
      val tf = graft.Caching.cache(
        gramRows(d, 3).select(col("doc_id"), col("gram").as("w"))
        .groupBy("doc_id", "w").agg(count(lit(1)).as("tf")))
      val dfreq = tf.groupBy("w").agg(count(lit(1)).as("df"))
        .filter(col("df") <= graft.operators.Postings.DefaultMaxDf)
      val ndocs = d.select(countDistinct("doc_id").as("n"))
      val wts = graft.Caching.cache(tf.join(dfreq, "w")
        .crossJoin(broadcast(ndocs))
        .select(col("doc_id"), col("w"),
          (col("tf") * log(col("n").cast("double") / col("df")))
            .as("x")))
      // r15: norms feeds TWO joins (na, nb) — uncached it aggregated the
      // weights twice (twin probe stages); one doc-sized cache entry
      val norms = graft.Caching.cache(wts.groupBy("doc_id")
        .agg(sqrt(sum(col("x") * col("x"))).as("nrm")))
      // r15 (guide §2.1 exchange reuse): self-join via .as() aliases on
      // the IDENTICAL cached frame instead of two differently-renamed
      // projections — the rename made the two sides canonically distinct,
      // so each side ran its own scan+shuffle of the same weights (the
      // probe showed twin ~equal stages); identical sides let Spark plan
      // ONE exchange and a ReusedExchange for the other. Same rows
      // (rename-only), oracle green.
      val dots = wts.as("ta").join(wts.as("tb"), col("ta.w") === col("tb.w"))
        .filter(col("ta.doc_id") < col("tb.doc_id"))
        .groupBy(col("ta.doc_id").as("da"), col("tb.doc_id").as("db"))
        .agg(sum(col("ta.x") * col("tb.x")).as("dot"))
      dots
        .join(norms.select(col("doc_id").as("da"),
          col("nrm").as("na")), "da")
        .join(norms.select(col("doc_id").as("db"),
          col("nrm").as("nb")), "db")
        .withColumn("cos", fround(col("dot") / (col("na") * col("nb")), 4))
        .filter(col("cos") >= 0.3)
        .select("da", "db", "cos")
        .orderBy("da", "db")
    }),

    // Simpson diversity of the source mix per language (r12): 1 − Σp²
    // over the source shares — the mixture-health readout (0 = one
    // source owns the language, →1 = evenly spread) a curation funnel
    // watches as it filters. All counts exact integers; Σ n_s² stays
    // BIGINT (fixture-safe and < 2^63 up to ~3e9 docs per cell — the
    // 100 TB form casts to double per the q_pmi_cooccur discipline);
    // the index is ONE division of exact integers, rounded 4 dp. Two
    // map-combined aggs, both on (lang[, source]) keys.
    "q_simpson_mix" -> ((s, dir) => {
      val cnt = T(s, dir, "documents")
        .groupBy("lang", "source").agg(count(lit(1)).as("n"))
      cnt.groupBy("lang")
        .agg(count(lit(1)).as("n_sources"),
          sum("n").as("n_docs"),
          sum(col("n") * col("n")).as("ss"))
        .select(col("lang"), col("n_sources"), col("n_docs"),
          fround(lit(1.0) - col("ss").cast("double")
            / (col("n_docs") * col("n_docs")), 4).as("simpson"))
        .orderBy("lang")
    }),

    // Vocabulary coverage curve (r12): the fraction of all corpus
    // token OCCURRENCES covered by the top-k most frequent types, at
    // k = 10/100/1000 — the readout that sizes a tokenizer vocabulary
    // budget (BPE merges chase exactly this curve). The frequency
    // table is Heaps-bounded; each cutoff is a TakeOrdered(k) over it
    // (freq DESC, token tiebreak) + one sum — never a global rank of
    // the corpus. Coverage = exact-integer sum ratio, rounded 4 dp.
    "q_vocab_coverage" -> ((s, dir) => {
      val freq = graft.Caching.cache(
        T(s, dir, "documents")
          .select(explode(toks(lower(col("text")))).as("w"))
          .groupBy("w").agg(count(lit(1)).as("f")))
      val total = freq.agg(sum("f").as("tot"))
      val rows = Seq(10, 100, 1000).map { k =>
        freq.orderBy(desc("f"), asc("w")).limit(k)
          .agg(sum("f").as("cov"))
          .withColumn("k", lit(k.toLong))
      }.reduce(_ unionByName _)
      rows.crossJoin(broadcast(total))
        .select(col("k"),
          col("cov"),
          fround(col("cov").cast("double") / col("tot"), 4)
            .as("coverage"))
        .orderBy("k")
    }),

    // Stratified weighted sampling (r12): q_sample_weighted per
    // STRATUM — an independent Efraimidis–Spirakis draw inside every
    // language, the "k docs per language, probability ∝ token count,
    // without replacement" sampler a mixture pipeline runs when each
    // stratum has its own budget. Same md5-uniform u and ln(u)/w keys
    // (6-dp rounded BEFORE ranking); the per-stratum top-k is a
    // lang-partitioned row_number — WindowGroupLimit keeps ≤ k rows
    // per lang per map partition BEFORE the shuffle (the q_topk_group
    // shape), so the exchange carries ~k·|langs| rows at any corpus
    // size.
    "q_sample_stratwt" -> ((s, dir) => {
      val h = md5(col("doc_id").cast("string"))
      val bits = (0 until 6).map { i =>
        (instr(lit("0123456789abcdef"), substring(h, i + 1, 1)) - 1)
          .cast("double") * math.pow(16, 5 - i)
      }.reduce(_ + _)
      val w = Window.partitionBy("lang")
        .orderBy(desc("skey"), asc("doc_id"))
      T(s, dir, "documents")
        .select(col("doc_id"), col("lang"),
          size(toks(col("text"))).cast("long").as("w"),
          ((bits + lit(1.0)) / lit(math.pow(16, 6))).as("u"))
        .select(col("doc_id"), col("lang"), col("w"),
          fround(log(col("u")) / col("w"), 6).as("skey"))
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 5)
        .select(col("lang"), col("rk").cast("long").as("rk"),
          col("doc_id"), col("w"), col("skey"))
        .orderBy("lang", "rk")
    }),

    // L4h — distinct-n corpus diversity (r11): the distinct-1/-2
    // ratios from the text-generation evaluation literature (Li et al.
    // 2016, "A Diversity-Promoting Objective", NAACL — public), read
    // per source as a duplication/templating screen: a boilerplate-
    // heavy source shows low distinct-2 long before pair-level dedup
    // runs. Unigram and bigram branches are each one map-side explode
    // + a (source-keyed) distinct-count aggregation; ratios are exact
    // integer quotients rounded 4 dp. The bigram frame reuses the
    // per-doc transform/slice gram builder, so nothing crosses doc
    // boundaries.
    "q_distinct_n" -> ((s, dir) => {
      val d = T(s, dir, "documents")
      val uni = d.select(col("source"), explode(toks(col("text"))).as("g"))
        .groupBy("source")
        .agg(count(lit(1)).as("tokens"),
          countDistinct("g").as("d1"))
      val bi = d
        .select(col("source"), col("doc_id"), toks(col("text")).as("ws"))
        .select(col("source"), explode(expr(
          """CASE WHEN size(ws) < 2 THEN array()
             ELSE transform(sequence(0, size(ws) - 2),
                  i -> concat(ws[i], ' ', ws[i + 1])) END""")).as("g"))
        .groupBy("source")
        .agg(count(lit(1)).as("bigrams"),
          countDistinct("g").as("d2"))
      uni.join(bi, "source")
        .select(col("source"), col("tokens"), col("d1"),
          fround(col("d1").cast("double") / col("tokens"), 4)
            .as("distinct1"),
          col("bigrams"), col("d2"),
          fround(col("d2").cast("double") / col("bigrams"), 4)
            .as("distinct2"))
        .orderBy("source")
    }),

    // L4g — tokenizer fertility diagnostics: bytes/token and
    // chars/token per language — the statistic a tokenizer evaluation
    // reads to compare segmentation efficiency across languages
    // (whitespace tokens here; the ratios come from exact integer sums,
    // so the 4-dp round is cross-engine-deterministic). One
    // map-combined aggregation over a scan-stage projection.
    "q_tok_fertility" -> ((s, dir) => {
      T(s, dir, "documents")
        .select(col("lang"), col("n_chars"),
          octet_length(col("text")).cast("long").as("nb"),
          size(toks(col("text"))).cast("long").as("nt"))
        .groupBy("lang")
        .agg(count(lit(1)).as("docs"), sum("nt").as("tokens"),
          sum("nb").as("bytes"),
          fround(sum("nb").cast("double") / sum("nt"), 4)
            .as("bytes_per_tok"),
          fround(sum("n_chars").cast("double") / sum("nt"), 4)
            .as("chars_per_tok"))
        .orderBy("lang")
    }),

    // L1d — winnowing fingerprints (Schleimer, Wilkerson & Aiken,
    // SIGMOD 2003 — public; the MOSS scheme): 4-gram hashes, window
    // w=4, keep each window's minimal (hash, pos) — the guarantee that
    // any shared run of >= w+k-1 tokens shares a fingerprint, at ~2/(w+1)
    // the density of full gram sets. The (hash, pos) argmin is encoded
    // as ONE integer (h·2^20 + pos: h < 2^32 from 8 md5 hex chars, pos
    // < 2^20) so a plain window min() carries the lexicographic tiebreak
    // — no min_by, bit-identical in both engines. Plan: map-only
    // gram+hash stage → one hash exchange (the per-doc window) →
    // distinct. Fingerprints are the join surface for plagiarism-style
    // overlap detection at a fraction of q_minhash_band's gram volume.
    "q_winnow" -> ((s, dir) => {
      winnowRows(T(s, dir, "documents")).orderBy("doc_id", "fp_pos")
    }),

    // L1e — winnowing OVERLAP ranking (the join [[winnowRows]] exists
    // for): candidate near-dup/plagiarism pairs ranked by the number of
    // distinct shared fingerprints. r11: rewritten from the
    // fingerprint-equi SELF-JOIN onto the shared
    // [[operators.Postings]] discipline — the posting list per
    // fp_hash (collect_set subsumes the old distinct()) explodes to
    // pairs only when 2 <= df <= 128, so a viral fingerprint (a
    // boilerplate passage winnowed into everyone's sketch) can no
    // longer produce a df² pair term; one exchange fewer than the
    // self-join, no cache needed (single consumer). The full
    // (shared DESC, da, db) tuple is unique, so the top-20 cut is
    // deterministic.
    "q_winnow_overlap" -> ((s, dir) => {
      val posts = graft.operators.Postings.postingLists(
        winnowRows(T(s, dir, "documents")).select("doc_id", "fp_hash"),
        Seq("fp_hash"))
      graft.operators.Postings.pairCounts(posts)
        .withColumnRenamed("inter", "shared")
        .orderBy(desc("shared"), asc("da"), asc("db"))
        .limit(20)
    }),

    // L1f — the df-ceiling ACCOUNTING (r11, verdict #1): the log2 df
    // histogram of the 4-gram posting index with the pair-explode mass
    // each bucket would cost and whether [[operators.Postings]] pairs
    // it (kept = df <= 128). This is the "report the dropped mass"
    // half of the ceiling discipline — at fixture every bucket is
    // kept (max df 5); at 100 TB the dropped rows quantify exactly
    // what boilerplate the rankers declined to pair. Counts-only path
    // (dfHistogramOf): no pair stage consumes the arrays here, so the
    // collect_set posting build would be wasted work (PostingsSpec
    // pins ≡ the posting-list form).
    "q_posting_df" -> ((s, dir) =>
      graft.operators.Postings.dfHistogramOf(
        gramRows(T(s, dir, "documents"), 4), Seq("lang", "gram"))),

    // Edit-distance near-dup (r11): blocked Levenshtein verification —
    // the record-linkage discipline (block cheaply, verify expensively
    // on candidates only) applied to document prefixes. Blocking key =
    // (first two normalized words, length div 32): near-identical texts
    // share it; unrelated texts almost never do. Candidate pairs come
    // from the SAME df-capped posting-list path as every pair generator
    // ([[operators.Postings]] — a hot block is template text whose df²
    // pair term carries no linkage signal), then each survivor pays one
    // levenshtein(64-char prefix) — an O(64²) driver-bounded constant
    // per pair, never O(doc²) text. 100 TB: pair volume is
    // Σ min(block, 128)² ≤ 128 · docs (linear); the verify is pure
    // map-side over the joined pair frame.
    "q_edit_dedup" -> ((s, dir) => {
      val norm = graft.Caching.cache(
        T(s, dir, "documents").select(col("doc_id"),
            trim(regexp_replace(regexp_replace(lower(col("text")),
              "[^a-z0-9 ]", " "), " +", " ")).as("norm"))
          .withColumn("pfx", substring(col("norm"), 1, 64))
          .withColumn("w2",
            concat_ws(" ", slice(split(col("norm"), " "), 1, 2)))
          .withColumn("lb", expr("length(norm) div 32")))
      graft.operators.Postings.pairCounts(
          graft.operators.Postings.postingLists(
            norm.select("w2", "lb", "doc_id"), Seq("w2", "lb")))
        .select("da", "db")
        .join(norm.select(col("doc_id").as("da"), col("pfx").as("pa")),
          "da")
        .join(norm.select(col("doc_id").as("db"), col("pfx").as("pb")),
          "db")
        .withColumn("dist", levenshtein(col("pa"), col("pb"))
          .cast("long"))
        .withColumn("near", (col("dist") <= 16).cast("long"))
        .select("da", "db", "dist", "near")
        .orderBy("da", "db")
    }),

    // Word co-occurrence PMI (r11): collocation strength over document-
    // level presence — ln(P(a,b) / (P(a)·P(b))) with doc-frequency
    // probabilities (Church & Hanks 1990). Vocabulary is CAPPED to the
    // top-V=24 words by df (ties broken by word — deterministic), so
    // per-doc pair fan-out is ≤ V²/2, a driver constant: total pair
    // volume is linear in docs at any corpus size. Plan: one distinct
    // (doc, word) pass → broadcast top-V → per-doc self-join on doc_id
    // (≤ V rows per key — uniform, never hot) → one hash agg; corpus
    // total rides a broadcast 1-row frame. PMI is ln of a ratio of
    // exact integers, rounded 4 dp (q_lm_score's determinism
    // discipline).
    "q_pmi_cooccur" -> ((s, dir) => {
      val docs = T(s, dir, "documents")
      val dw = graft.Caching.cache(
        graft.Tables.fanout(docs, "doc_id") // r15: parallel tokenize map
          .select(col("doc_id"),
            explode(split(col("text"), " ")).as("w"))
          .where(length(col("w")) > 0).distinct())
      val topv = dw.groupBy("w").agg(count(lit(1)).as("nw"))
        .orderBy(desc("nw"), asc("w")).limit(24)
      val marked = dw.join(broadcast(topv), "w")
      val total = docs.agg(count(lit(1)).as("d_total"))
      marked.as("a").join(marked.as("b"),
          col("a.doc_id") === col("b.doc_id") && col("a.w") < col("b.w"))
        .groupBy(col("a.w").as("wa"), col("b.w").as("wb"),
          col("a.nw").as("na"), col("b.nw").as("nb"))
        .agg(count(lit(1)).as("nab"))
        .crossJoin(broadcast(total))
        .withColumn("pmi", fround(
          // multiply in DOUBLE (q_kl_drift's discipline): nab·d_total and
          // na·nb as long·long overflow Int64 at 100 TB doc counts; the
          // double products stay exact under 2^53 and merely round above
          log(col("nab").cast("double") * col("d_total") /
            (col("na").cast("double") * col("nb"))), 4))
        .select("wa", "wb", "nab", "na", "nb", "pmi")
        .orderBy("wa", "wb")
    }),

    // Distribution drift (r11): per-source unigram KL divergence from
    // the corpus distribution — D(P_s ‖ P_c) = Σ_w p_sw·ln(p_sw/p_cw),
    // the mixing/drift diagnostic a curation pipeline runs per shard,
    // crawl snapshot, or incoming feed (DSIR's importance ratio is the
    // same statistic per word; here it aggregates to one scalar per
    // source). Every word in a source is in the corpus by construction,
    // so p_cw > 0 — no smoothing needed. Plan: one (source, word) agg,
    // then vocab-bounded broadcast marginals into a per-source sum —
    // two map-combined exchanges total. Determinism: ln's argument is a
    // ratio of exact-integer doubles multiplied BEFORE dividing in
    // DOUBLE (never long·long — at 100 TB token counts the integer
    // product overflows; the double product stays exact under 2^53 and
    // merely rounds above), summed then 4-dp-rounded (q_lm_score's
    // discipline).
    // STREAMING: no per-event twin — every term of the KL sum carries
    // the GLOBAL marginals p(w), n_c in its denominator, so one new
    // token anywhere perturbs every source's divergence; the streaming
    // form is periodic recompute over maintained (source, w) counts
    // (which stream exactly as a keyed count), at vocab cardinality.
    "q_kl_drift" -> ((s, dir) => {
      val tok = graft.Tables.fanout(T(s, dir, "documents"), "doc_id") // r15: parallel tokenize map
        .select(col("source"), explode(toks(col("text"))).as("w"))
        .where(length(col("w")) > 0)
      val sw = graft.Caching.cache(
        tok.groupBy("source", "w").agg(count(lit(1)).as("c_sw")))
      val st = sw.groupBy("source").agg(sum("c_sw").as("n_s"))
      val cw = sw.groupBy("w").agg(sum("c_sw").as("c_w"))
      val tot = sw.agg(sum("c_sw").as("n_c"))
      sw.join(broadcast(cw), "w")
        .join(broadcast(st), "source")
        .crossJoin(broadcast(tot))
        .withColumn("term", col("c_sw") / col("n_s") *
          log(col("c_sw").cast("double") * col("n_c") /
            (col("c_w").cast("double") * col("n_s"))))
        .groupBy("source")
        .agg(fround(sum("term"), 4).as("kl"),
          max("n_s").as("n_tokens"),
          count(lit(1)).as("n_vocab"))
        .orderBy("source")
    }),

    // n-gram novelty (r11): per doc, the share of its distinct 4-grams
    // found NOWHERE else in the corpus (df == 1) — the uniqueness
    // signal curation pipelines use opposite the dup/boilerplate
    // screens (novelty ≈ 0 means the doc is assembled from corpus
    // commonplaces; ≈ 1 means genuinely new token sequences — cf. the
    // memorization/novelty analyses of Lee et al. 2022). Plan: one
    // distinct (doc, gram) pass → gram-df agg → gram-EQUI join back →
    // per-doc agg. The join key is the gram itself, so a hot gram costs
    // df joined rows — linear, never df² (no pair stage exists here);
    // all three aggs are map-combined.
    // STREAMING: no per-event twin — df == 1 is a CORPUS-GLOBAL
    // predicate (one later duplicate retroactively un-novels every
    // earlier holder of the gram), so the streaming form is periodic
    // recompute over maintained (gram, df) counts, which themselves
    // stream exactly (a keyed count in update mode). A
    // novelty-vs-HISTORY variant (grams unseen so far) is a different
    // semantics, not this key's.
    "q_novelty" -> ((s, dir) => {
      val dg = graft.Caching.cache(
        gramRows(T(s, dir, "documents"), 4)
          .select("doc_id", "gram").distinct())
      val dfreq = dg.groupBy("gram").agg(count(lit(1)).as("df"))
      dg.join(dfreq, "gram")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_grams"),
          sum(when(col("df") === 1, 1L).otherwise(0L)).as("n_unique"))
        .withColumn("novelty",
          fround(col("n_unique") / col("n_grams"), 4))
        .orderBy("doc_id")
    }),

    // Good–Turing frequency-of-frequencies (r13; Good 1953, public):
    // the lexical-statistics readout that estimates how much
    // PROBABILITY MASS the corpus has never seen — p0 = N1/N — and the
    // smoothed count r* = (r+1)·N_{r+1}/N_r for the low-frequency
    // ranks, the standard sanity panel before trusting token counts
    // from a sample (a corpus whose N1 share is huge is under-sampled;
    // one whose r* ≈ r is saturated). Plan: ONE token-count agg
    // (map-combined — the only corpus-sized pass), then the
    // frequency-of-frequencies re-agg collapses to ≤ max-freq rows;
    // the r+1 lookup is a broadcast self-join of that tiny frame and
    // N/N_min ride in as a broadcast single-row frame. Everything is
    // exact-integer until the two divisions (fround 6). The panel
    // reads the 5 LOWEST frequency ranks PRESENT (a TakeOrdered on the
    // fof frame), not a literal r ≤ 5 — the fixture's word pool gives
    // every type a large count, and a real corpus's rare tail sits
    // wherever its sampling put it; p0 generalizes to N_min·r_min/N
    // (the unseen-mass estimate from the rarest observed rank, = N1/N
    // when singletons exist).
    "q_good_turing" -> ((s, dir) => {
      val tf = T(s, dir, "documents")
        .select(explode(toks(lower(col("text")))).as("w"))
        .groupBy("w").agg(count(lit(1)).as("r"))
      val fof = graft.Caching.cache(
        tf.groupBy("r").agg(count(lit(1)).as("n_r")))
      val tot = tf.agg(sum("r").as("n"))
      val mn = fof.orderBy(asc("r")).limit(1)
        .select(col("r").as("r_min"), col("n_r").as("n_min"))
      fof.orderBy(asc("r")).limit(5)
        .join(broadcast(fof.select((col("r") - 1).as("r"),
          col("n_r").as("n_next"))), Seq("r"), "left")
        .crossJoin(broadcast(tot))
        .crossJoin(broadcast(mn))
        .select(col("r"), col("n_r"),
          coalesce(col("n_next"), lit(0L)).as("n_next"),
          fround((col("r") + 1) * coalesce(col("n_next"), lit(0L)) /
            col("n_r").cast("double"), 6).as("r_star"),
          fround(col("n_min") * col("r_min").cast("double") / col("n"), 6)
            .as("p0"))
        .orderBy("r")
    }),

    // Type-token-ratio by length bucket (r13): TTR = distinct/total
    // tokens per doc, aggregated over the q_kanon length buckets —
    // the lexical-diversity curve (TTR falls with length in natural
    // text; flat high TTR flags boilerplate-free but tiny docs, flat
    // LOW flags template spam). Buckets are FIXED-WIDTH (n_chars/100,
    // capped), never ntile — a value-domain bucket needs no global
    // ordering, so the plan is one map pass + one ≤10-group agg at
    // any corpus size. Per-doc ratios are exact-int divisions; the
    // avg folds ≤ corpus-rows doubles (fround 4 absorbs summation
    // order).
    "q_ttr_bucket" -> ((s, dir) => {
      T(s, dir, "documents")
        .select(least(lit(9L), floor(col("n_chars") / 100L).cast("long"))
          .as("bucket"),
          (size(array_distinct(toks(col("text")))).cast("double") /
            size(toks(col("text")))).as("ttr"))
        .groupBy("bucket")
        .agg(count(lit(1)).as("n_docs"), fround(avg("ttr"), 4).as("ttr"))
        .orderBy("bucket")
    }),

    // Spearman rank correlation (r13; Spearman 1904, public) between
    // doc length (n_chars) and lexical richness (distinct tokens) —
    // the distribution-free association check quality pipelines run
    // before regressing one signal on another (Pearson on heavy-tailed
    // lengths is leverage-dominated; Spearman is not). AVERAGE ranks
    // with exact tie handling, computed WITHOUT any global window:
    // rank(v) = (#rows below v) + (cnt_v + 1)/2 comes from a broadcast
    // self-join over the DISTINCT-VALUE frame (the skyline discipline
    // — n_chars and distinct-token domains are bounded by document
    // length, independent of corpus size), joined back value-keyed.
    // The rank columns are exact half-integers, so corr()'s input is
    // bit-identical cross-engine; fround 4 absorbs the covariance
    // summation order.
    "q_spearman" -> ((s, dir) => {
      val m = graft.Caching.cache(T(s, dir, "documents")
        .select(col("n_chars").as("a"),
          size(array_distinct(toks(col("text")))).cast("long").as("b")))
      def rankMap(c: String): DataFrame = {
        val dv = m.groupBy(col(c).as("v")).agg(count(lit(1)).as("cnt"))
        dv.as("x").join(broadcast(dv.as("y")),
            col("y.v") < col("x.v"), "left")
          .groupBy(col("x.v").as("v"), col("x.cnt").as("cnt"))
          .agg(coalesce(sum("y.cnt"), lit(0L)).as("below"))
          .select(col("v"),
            (col("below") + (col("cnt") + 1) / lit(2.0)).as(s"r_$c"))
      }
      m.join(broadcast(rankMap("a")), col("a") === col("v")).drop("v")
        .join(broadcast(rankMap("b")), col("b") === col("v")).drop("v")
        .agg(count(lit(1)).as("n_docs"),
          fround(corr(col("r_a"), col("r_b")), 4).as("spearman"))
    }),

    // Mutual information between lang and source (r13 s2; Shannon
    // 1948, public): how much knowing a document's source tells you
    // about its language — the corpus-composition dependence readout
    // (MI → 0 means sources are language-balanced; high MI means a
    // language lives in few sources, the sampling-bias smell mixing
    // weights must correct for). Plan: ONE (lang, source) contingency
    // agg touches the corpus; marginals and the MI fold run on the
    // |langs|·|sources| cell frame with broadcast marginals. Every ln
    // argument is an exact-integer ratio n·N/(R·C) — cross-engine
    // bit-identical — and the ~|cells| double sum rounds at 4 dp.
    "q_mutual_info" -> ((s, dir) => {
      val cells = T(s, dir, "documents")
        .groupBy("lang", "source").agg(count(lit(1)).as("n"))
      val r = cells.groupBy("lang").agg(sum("n").as("rl"))
      val c = cells.groupBy("source").agg(sum("n").as("cs"))
      val tot = cells.agg(sum("n").as("nn"))
      cells.join(broadcast(r), "lang").join(broadcast(c), "source")
        .crossJoin(broadcast(tot))
        .agg(count(lit(1)).as("n_cells"), sum("n").as("n_docs"),
          fround(sum(col("n").cast("double") / col("nn") *
            log((col("n") * col("nn")).cast("double") /
              (col("rl") * col("cs")))), 4).as("mi"))
    }),

    // Chi-squared independence of lang × source (r13 s2; Pearson
    // 1900, public): the classical test statistic on the same
    // contingency frame — Σ (O−E)²/E rewritten as
    // Σ (n·N − R·C)²/(R·C·N) so the inner difference is EXACT integer
    // arithmetic before the one squaring + two divisions (expected
    // counts as raw doubles would drift across engines). Fixture-scale
    // products stay far under 2^53; at 100 TB cell counts the
    // difference moves to double where IEEE rounding is still
    // engine-identical on identical inputs. Same plan shape as
    // q_mutual_info: one corpus pass, cell-bounded fold.
    "q_chi2_indep" -> ((s, dir) => {
      val cells = T(s, dir, "documents")
        .groupBy("lang", "source").agg(count(lit(1)).as("n"))
      val r = cells.groupBy("lang").agg(sum("n").as("rl"))
      val c = cells.groupBy("source").agg(sum("n").as("cs"))
      val tot = cells.agg(sum("n").as("nn"))
      cells.join(broadcast(r), "lang").join(broadcast(c), "source")
        .crossJoin(broadcast(tot))
        .agg(count(lit(1)).as("n_cells"),
          ((countDistinct(col("lang")) - 1) *
            (countDistinct(col("source")) - 1)).cast("long").as("dof"),
          fround(sum(
            pow(col("n") * col("nn") - col("rl") * col("cs"), 2) /
              (col("rl") * col("cs")).cast("double") / col("nn")), 4)
            .as("chi2"))
    }),

    // Cramér's V (r14; Cramér 1946, public): the chi-squared statistic
    // NORMALIZED to [0, 1] — V = sqrt(χ² / (N·min(R−1, C−1))) — so the
    // lang×source dependence is comparable across corpora of different
    // sizes (χ² itself grows with N even at fixed association; V is
    // the effect size mixing audits actually threshold on). Same
    // exact-integer inner difference as q_chi2_indep on the SAME
    // contingency shape; one corpus pass, |langs|·|sources| cell fold
    // — domain-bounded regardless of corpus size.
    "q_cramers_v" -> ((s, dir) => {
      val cells = T(s, dir, "documents")
        .groupBy("lang", "source").agg(count(lit(1)).as("n"))
      val r = cells.groupBy("lang").agg(sum("n").as("rl"))
      val c = cells.groupBy("source").agg(sum("n").as("cs"))
      val tot = cells.agg(sum("n").as("nn"))
      cells.join(broadcast(r), "lang").join(broadcast(c), "source")
        .crossJoin(broadcast(tot))
        .agg(count(lit(1)).as("n_cells"), sum("n").as("n_docs"),
          fround(sqrt(
            sum(pow(col("n") * col("nn") - col("rl") * col("cs"), 2) /
              (col("rl") * col("cs")).cast("double") / col("nn")) /
            (max(col("nn")) *
              (least(countDistinct(col("lang")),
                countDistinct(col("source"))) - 1)).cast("double")), 4)
            .as("v"))
    })
  )

  /** Winnowing fingerprints (Schleimer et al. 2003): k-gram md5 hashes,
    * per-window (hash, pos) argmin encoded as h·2^20 + pos so a plain
    * window min() carries the lexicographic tiebreak. Returns
    * (doc_id, fp_pos, fp_hash); complete windows only. */
  private[graft] def winnowRows(d: DataFrame, k: Int = 4, w: Int = 4)
      : DataFrame = {
    val g = graft.Tables.fanout(d, "doc_id") // parallel gram+md5 map;
      // the per-doc window below reuses the partitioning (no 2nd shuffle)
      .select(col("doc_id"), toks(col("text")).as("__ws"))
      .select(col("doc_id"), (size(col("__ws")) - k + 1).as("m"),
        posexplode(expr(
          s"""CASE WHEN size(__ws) < $k THEN array()
              ELSE transform(sequence(0, size(__ws) - $k),
                   i -> array_join(slice(__ws, i + 1, $k), ' ')) END"""))
          .as(Seq("p0", "gram")))
      .select(col("doc_id"), col("m"), (col("p0") + 1).as("pos"),
        conv(substring(md5(col("gram")), 1, 8), 16, 10)
          .cast("long").as("h"))
    val win = Window.partitionBy("doc_id").orderBy("pos")
      .rowsBetween(0, w - 1)
    g.withColumn("sel",
        min(col("h") * lit(1048576L) + col("pos")).over(win))
      .filter(col("pos") <= col("m") - w + 1) // complete windows only
      .select(col("doc_id"), col("sel")).distinct()
      .select(col("doc_id"), (col("sel") % 1048576L).as("fp_pos"),
        shiftright(col("sel"), 20).as("fp_hash"))
  }

  val oracles: Map[String, String] = Map(
    "q_dedup_exact" ->
      """SELECT sha256(text) AS h, min(doc_id) AS keeper, count(*) AS dups
         FROM documents GROUP BY 1 ORDER BY h""",
    "q_dedup_proxy" ->
      """SELECT lang, count(DISTINCT text) AS nd_text, count(*) AS cnt
         FROM documents GROUP BY lang ORDER BY lang""",
    "q_minhash_band" ->
      """WITH t AS (
           SELECT doc_id, string_split(text, ' ') AS w FROM documents),
         gi AS (
           SELECT doc_id, unnest(range(1, greatest(len(w) - 1, 1))) AS i, w
           FROM t),
         g AS (
           SELECT DISTINCT doc_id,
             array_to_string(list_slice(w, i, i + 2), ' ') AS gram
           FROM gi),
         mh AS (
           SELECT doc_id, s.seed,
             min(md5(concat(CAST(s.seed AS VARCHAR), ':', gram))) AS mh
           FROM g, (SELECT unnest(range(16)) AS seed) s
           GROUP BY doc_id, s.seed)
         SELECT doc_id, CAST(seed // 4 AS BIGINT) AS band,
           md5(string_agg(mh, '|' ORDER BY seed)) AS band_sig
         FROM mh GROUP BY doc_id, seed // 4
         ORDER BY doc_id, band""",
    "q_source_overlap" ->
      """WITH t AS (
           SELECT doc_id, string_split(text, ' ') AS w FROM documents),
         gi AS (
           SELECT doc_id, unnest(range(1, greatest(len(w) - 1, 1))) AS i, w
           FROM t),
         g AS (
           SELECT DISTINCT doc_id,
             array_to_string(list_slice(w, i, i + 2), ' ') AS gram
           FROM gi),
         mh AS (
           SELECT doc_id, s.seed,
             min(md5(concat(CAST(s.seed AS VARCHAR), ':', gram))) AS mh
           FROM g, (SELECT unnest(range(16)) AS seed) s
           GROUP BY doc_id, s.seed),
         bands AS (
           SELECT doc_id, seed // 4 AS band,
             md5(string_agg(mh, '|' ORDER BY seed)) AS band_sig
           FROM mh GROUP BY doc_id, seed // 4),
         p0 AS (
           SELECT DISTINCT a.doc_id AS da, b.doc_id AS db
           FROM bands a JOIN bands b
             ON a.band = b.band AND a.band_sig = b.band_sig
             AND a.doc_id < b.doc_id)
         SELECT least(x.source, y.source) AS source_a,
           greatest(x.source, y.source) AS source_b,
           count(*) AS dup_pairs
         FROM p0
         JOIN documents x ON p0.da = x.doc_id
         JOIN documents y ON p0.db = y.doc_id
         GROUP BY 1, 2 ORDER BY 1, 2""",
    "q_minhash_est_audit" ->
      """WITH t AS (
           SELECT doc_id, string_split(text, ' ') AS w FROM documents),
         gi AS (
           SELECT doc_id, unnest(range(1, greatest(len(w) - 1, 1))) AS i, w
           FROM t),
         g AS (
           SELECT DISTINCT doc_id,
             array_to_string(list_slice(w, i, i + 2), ' ') AS gram
           FROM gi),
         mh AS (
           SELECT doc_id, s.seed,
             min(md5(concat(CAST(s.seed AS VARCHAR), ':', gram))) AS mh
           FROM g, (SELECT unnest(range(16)) AS seed) s
           GROUP BY doc_id, s.seed),
         bands AS (
           SELECT doc_id, seed // 4 AS band,
             md5(string_agg(mh, '|' ORDER BY seed)) AS band_sig
           FROM mh GROUP BY doc_id, seed // 4),
         p0 AS (
           SELECT DISTINCT a.doc_id AS da, b.doc_id AS db
           FROM bands a JOIN bands b
             ON a.band = b.band AND a.band_sig = b.band_sig
             AND a.doc_id < b.doc_id),
         m AS (
           SELECT p0.da, p0.db,
             sum(CASE WHEN x.mh = y.mh THEN 1 ELSE 0 END) AS mh_match
           FROM p0 JOIN mh x ON x.doc_id = p0.da
           JOIN mh y ON y.doc_id = p0.db AND y.seed = x.seed
           GROUP BY 1, 2),
         sizes AS (SELECT doc_id, count(*) AS n FROM g GROUP BY 1),
         iv AS (
           SELECT p0.da, p0.db, count(*) AS inter
           FROM p0 JOIN g ga ON ga.doc_id = p0.da
           JOIN g gb ON gb.doc_id = p0.db AND gb.gram = ga.gram
           GROUP BY 1, 2)
         SELECT m.da, m.db, CAST(m.mh_match AS BIGINT) AS mh_match,
           CAST(coalesce(iv.inter, 0) AS BIGINT) AS inter,
           floor(m.mh_match / 16.0 * 10000 + 0.5) / 10000 AS est_sim,
           floor(CAST(coalesce(iv.inter, 0) AS DOUBLE)
             / (sa.n + sb.n - coalesce(iv.inter, 0)) * 10000 + 0.5)
             / 10000 AS jac,
           floor((m.mh_match / 16.0 - CAST(coalesce(iv.inter, 0) AS DOUBLE)
             / (sa.n + sb.n - coalesce(iv.inter, 0))) * 10000 + 0.5)
             / 10000 AS err
         FROM m LEFT JOIN iv ON iv.da = m.da AND iv.db = m.db
         JOIN sizes sa ON sa.doc_id = m.da
         JOIN sizes sb ON sb.doc_id = m.db
         ORDER BY m.da, m.db""",
    "q_ngram_jaccard" ->
      """WITH t AS (
           SELECT doc_id, lang, string_split(text, ' ') AS w FROM documents),
         gi AS (
           SELECT doc_id, lang, unnest(range(1, greatest(len(w) - 2, 1))) AS i, w
           FROM t),
         g AS (
           SELECT DISTINCT doc_id, lang,
             array_to_string(list_slice(w, i, i + 3), ' ') AS gram
           FROM gi),
         sizes AS (SELECT doc_id, count(*) AS n FROM g GROUP BY doc_id),
         gp AS (
           SELECT doc_id, lang, gram FROM g
           QUALIFY count(*) OVER (PARTITION BY lang, gram) <= 128),
         pairs AS (
           SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS inter
           FROM gp a JOIN gp b ON a.gram = b.gram AND a.lang = b.lang
             AND a.doc_id < b.doc_id
           GROUP BY 1, 2)
         SELECT da, db,
           floor(CAST(inter AS DOUBLE) / (sa.n + sb.n - inter) * 10000 + 0.5)
             / 10000 AS jac
         FROM pairs
         JOIN sizes sa ON sa.doc_id = da
         JOIN sizes sb ON sb.doc_id = db
         ORDER BY jac DESC, da, db LIMIT 50""",
    "q_containment" ->
      """WITH t AS (
           SELECT doc_id, lang, string_split(text, ' ') AS w FROM documents),
         gi AS (
           SELECT doc_id, lang, unnest(range(1, greatest(len(w) - 2, 1))) AS i, w
           FROM t),
         g AS (
           SELECT DISTINCT doc_id, lang,
             array_to_string(list_slice(w, i, i + 3), ' ') AS gram
           FROM gi),
         sizes AS (SELECT doc_id, count(*) AS n FROM g GROUP BY doc_id),
         gp AS (
           SELECT doc_id, lang, gram FROM g
           QUALIFY count(*) OVER (PARTITION BY lang, gram) <= 128),
         pairs AS (
           SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS inter
           FROM gp a JOIN gp b ON a.gram = b.gram AND a.lang = b.lang
             AND a.doc_id < b.doc_id
           GROUP BY 1, 2)
         SELECT da, db,
           floor(CAST(inter AS DOUBLE) / sa.n * 10000 + 0.5) / 10000
             AS c_ab,
           floor(CAST(inter AS DOUBLE) / sb.n * 10000 + 0.5) / 10000
             AS c_ba,
           floor(CAST(inter AS DOUBLE) / least(sa.n, sb.n) * 10000 + 0.5)
             / 10000 AS cmax
         FROM pairs
         JOIN sizes sa ON sa.doc_id = da
         JOIN sizes sb ON sb.doc_id = db
         ORDER BY cmax DESC, da, db LIMIT 50""",
    "q_contamination" ->
      """WITH t AS (
           SELECT doc_id, string_split(text, ' ') AS w FROM documents),
         gi AS (
           SELECT doc_id, unnest(range(1, greatest(len(w) - 2, 1))) AS i, w
           FROM t),
         g AS (
           SELECT DISTINCT doc_id,
             array_to_string(list_slice(w, i, i + 3), ' ') AS gram
           FROM gi),
         bench AS (SELECT DISTINCT gram FROM g WHERE doc_id % 25 = 0),
         train AS (SELECT * FROM g WHERE doc_id % 25 <> 0),
         sizes AS (SELECT doc_id, count(*) AS n_grams FROM train
                   GROUP BY doc_id),
         hits AS (
           SELECT doc_id, count(*) AS n_contaminated
           FROM train JOIN bench USING (gram) GROUP BY doc_id)
         SELECT h.doc_id, h.n_contaminated, s.n_grams,
           floor(CAST(h.n_contaminated AS DOUBLE) / s.n_grams * 10000
                 + 0.5) / 10000 AS frac
         FROM hits h JOIN sizes s ON h.doc_id = s.doc_id
         ORDER BY frac DESC, h.doc_id""",
    "q_lm_score" ->
      """WITH t AS (
           SELECT doc_id, lang, string_split(text, ' ') AS w
           FROM documents),
         gi AS (
           SELECT doc_id, lang,
             unnest(range(1, greatest(len(w), 1))) AS i, w
           FROM t),
         bg AS (
           SELECT doc_id, lang,
             array_to_string(list_slice(w, i, i + 1), ' ') AS gram
           FROM gi),
         big AS (SELECT lang, gram, count(*) AS bc FROM bg
                 GROUP BY lang, gram),
         uni AS (
           SELECT lang, string_split(gram, ' ')[1] AS w1, count(*) AS uc
           FROM bg GROUP BY 1, 2)
         SELECT b.doc_id, count(*) AS n_bigrams,
           floor(avg(ln(CAST(big.bc AS DOUBLE) / uni.uc)) * 10000 + 0.5)
             / 10000 AS avg_logp
         FROM bg b
         JOIN big ON big.lang = b.lang AND big.gram = b.gram
         JOIN uni ON uni.lang = b.lang
                 AND uni.w1 = string_split(b.gram, ' ')[1]
         GROUP BY b.doc_id ORDER BY b.doc_id""",
    "q_ccnet_split" ->
      """WITH t AS (
           SELECT doc_id, lang, string_split(text, ' ') AS w
           FROM documents),
         gi AS (
           SELECT doc_id, lang,
             unnest(range(1, greatest(len(w), 1))) AS i, w
           FROM t),
         bg AS (
           SELECT doc_id, lang,
             array_to_string(list_slice(w, i, i + 1), ' ') AS gram
           FROM gi),
         big AS (SELECT lang, gram, count(*) AS bc FROM bg
                 GROUP BY lang, gram),
         uni AS (
           SELECT lang, string_split(gram, ' ')[1] AS w1, count(*) AS uc
           FROM bg GROUP BY 1, 2),
         scored AS (
           SELECT b.doc_id, any_value(b.lang) AS lang,
             floor(avg(ln(CAST(big.bc AS DOUBLE) / uni.uc)) * 10000 + 0.5)
               / 10000 AS avg_logp
           FROM bg b
           JOIN big ON big.lang = b.lang AND big.gram = b.gram
           JOIN uni ON uni.lang = b.lang
                   AND uni.w1 = string_split(b.gram, ' ')[1]
           GROUP BY b.doc_id),
         tiled AS (
           SELECT doc_id, lang, avg_logp,
             ntile(3) OVER (PARTITION BY lang
                            ORDER BY avg_logp DESC, doc_id) AS bucket_id
           FROM scored)
         SELECT doc_id, lang, avg_logp, bucket_id,
           CASE bucket_id WHEN 1 THEN 'head' WHEN 2 THEN 'middle'
             ELSE 'tail' END AS bucket
         FROM tiled ORDER BY doc_id""",
    "q_tfidf" ->
      """WITH tok AS (
           SELECT doc_id, unnest(string_split(lower(text), ' ')) AS w
           FROM documents),
         tf AS (SELECT doc_id, w, count(*) AS tf FROM tok GROUP BY 1, 2),
         dfreq AS (SELECT w, count(*) AS df FROM tf GROUP BY 1),
         nd AS (SELECT count(DISTINCT doc_id) AS n FROM documents)
         SELECT doc_id, w, tf, df,
           floor(tf * ln(CAST(n AS DOUBLE) / df) * 1e4 + 0.5) / 1e4 AS tfidf
         FROM tf JOIN dfreq USING (w), nd
         ORDER BY tfidf DESC, w, doc_id LIMIT 50""",
    "q_ngram_freq" ->
      """WITH t AS (
           SELECT doc_id, lang, string_split(text, ' ') AS w
           FROM documents),
         gi AS (
           SELECT doc_id, lang, unnest(range(1, greatest(len(w), 1))) AS i, w
           FROM t),
         g AS (
           SELECT doc_id, lang,
             array_to_string(list_slice(w, i, i + 1), ' ') AS gram
           FROM gi)
         SELECT lang, gram, count(*) AS cnt FROM g
         GROUP BY lang, gram ORDER BY cnt DESC, lang, gram LIMIT 20""",
    "q_text_tokens" ->
      """SELECT w, count(*) AS cnt FROM (
           SELECT unnest(string_split(lower(text), ' ')) AS w
           FROM documents) t
         GROUP BY w ORDER BY cnt DESC, w LIMIT 20""",
    "q_lang_id" ->
      """WITH tok AS (
           SELECT doc_id, lang, unnest(string_split(text, ' ')) AS w
           FROM documents),
         docwords AS (SELECT DISTINCT doc_id, w FROM tok),
         langtop AS (
           SELECT cand, w FROM (
             SELECT lang AS cand, w, count(*) AS cnt,
               row_number() OVER (PARTITION BY lang
                                  ORDER BY count(*) DESC, w) AS rn
             FROM tok GROUP BY lang, w) t
           WHERE rn <= 50),
         scores AS (
           SELECT d.doc_id, l.cand, count(*) AS score
           FROM docwords d JOIN langtop l ON d.w = l.w
           GROUP BY 1, 2),
         pred AS (
           SELECT doc_id, cand AS pred_lang FROM (
             SELECT doc_id, cand,
               row_number() OVER (PARTITION BY doc_id
                                  ORDER BY score DESC, cand) AS rn
             FROM scores) t
           WHERE rn = 1)
         SELECT d.doc_id, d.lang, coalesce(p.pred_lang, 'unk') AS pred_lang,
           CAST(coalesce(p.pred_lang, 'unk') = d.lang AS BIGINT) AS hit
         FROM documents d LEFT JOIN pred p ON d.doc_id = p.doc_id
         ORDER BY d.doc_id""",
    "q_quality_score" ->
      """WITH t AS (
           SELECT doc_id, text, string_split(text, ' ') AS w FROM documents),
         m AS (
           SELECT doc_id, len(w) AS nw, len(list_distinct(w)) AS uniq,
             floor(CAST(len(list_distinct(w)) AS DOUBLE) / len(w)
                   * 10000 + 0.5) / 10000 AS ttr,
             floor(CAST(length(text) - (len(w) - 1) AS DOUBLE) / len(w)
                   * 10000 + 0.5) / 10000 AS awl
           FROM t)
         SELECT doc_id, nw, uniq, ttr, awl,
           floor((0.6 * ttr + 0.4 * least(awl / 8.0, 1.0)) * 10000 + 0.5)
             / 10000 AS score
         FROM m ORDER BY doc_id""",
    "q_token_count" ->
      """SELECT doc_id,
         len(string_split(text, ' ')) AS ws_tokens,
         len(regexp_extract_all(text, '[a-z0-9]+')) AS re_tokens,
         n_chars
         FROM documents ORDER BY doc_id""",
    "q_dup_stats" ->
      """WITH g AS (
           SELECT md5(text) AS h, count(*) AS sz
           FROM documents GROUP BY 1)
         SELECT sz, count(*) AS n_clusters,
           CAST(sum(sz) AS BIGINT) AS n_docs
         FROM g GROUP BY sz ORDER BY sz""",
    "q_heavy_hitters" ->
      """WITH tok AS (
           SELECT unnest(string_split(lower(text), ' ')) AS w
           FROM documents),
         c AS (SELECT w, count(*) AS cnt FROM tok GROUP BY w),
         t AS (SELECT CAST(sum(cnt) AS BIGINT) AS total FROM c)
         SELECT w, cnt,
           floor(CAST(cnt AS DOUBLE) / total * 1e6 + 0.5) / 1e6 AS share
         FROM c, t WHERE cnt * 200 > total
         ORDER BY cnt DESC, w""",
    "q_token_zipf" ->
      """WITH f AS (
           SELECT lang, w, count(*) AS cnt FROM (
             SELECT lang, unnest(string_split(lower(text), ' ')) AS w
             FROM documents) t
           GROUP BY 1, 2),
         r AS (
           SELECT lang, cnt,
             row_number() OVER (PARTITION BY lang
               ORDER BY cnt DESC, w) AS rank
           FROM f)
         SELECT lang, count(*) AS n_tokens,
           floor(regr_slope(ln(cnt), ln(rank)) * 1e4 + 0.5) / 1e4 AS slope,
           floor(regr_intercept(ln(cnt), ln(rank)) * 1e4 + 0.5) / 1e4
             AS icept,
           floor(regr_r2(ln(cnt), ln(rank)) * 1e4 + 0.5) / 1e4 AS r2
         FROM r WHERE rank <= 100
         GROUP BY lang ORDER BY lang""",
    "q_doc_fingerprint" ->
      """WITH t AS (
           SELECT doc_id, string_split(text, ' ') AS w FROM documents),
         g AS (
           SELECT doc_id,
             md5(array_to_string(list_slice(w,
               i.i, i.i + 4), ' ')) AS h
           FROM t, LATERAL (SELECT unnest(range(1, len(w) - 3)) AS i) i)
         SELECT doc_id, min(h) AS fp, count(*) AS n_grams
         FROM g GROUP BY doc_id ORDER BY doc_id""",
    "q_doc_stats" ->
      """SELECT lang, source, count(*) AS cnt,
         floor(avg(n_chars) * 100 + 0.5) / 100 AS avg_chars,
         max(n_chars) AS max_chars
         FROM documents GROUP BY lang, source ORDER BY lang, source""",
    "q_multimodal_meta" ->
      """SELECT doc_id, strlen(text) AS nbytes, sha256(text) AS digest
         FROM documents ORDER BY doc_id""",
    "q_simhash_pairs" ->
      s"""$simhashOracleCtes
          SELECT a.doc_id AS a, b.doc_id AS b,
            CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS dist
          FROM sh a JOIN sh b ON a.doc_id < b.doc_id
            AND bit_count(xor(a.simhash, b.simhash)) <= 3
          ORDER BY a, b""",
    "q_simhash" ->
      s"""$simhashOracleCtes
          SELECT doc_id, simhash FROM sh ORDER BY doc_id""",
    "q_split_hash" ->
      """SELECT doc_id,
           strpos('0123456789abcdef',
                  substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) AS bucket,
           CASE WHEN strpos('0123456789abcdef',
                  substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) <= 12
                THEN 'train'
                WHEN strpos('0123456789abcdef',
                  substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) <= 14
                THEN 'val' ELSE 'test' END AS split
         FROM documents ORDER BY doc_id""",
    "q_bm25" ->
      """WITH tok AS (
           SELECT doc_id, unnest(string_split(lower(text), ' ')) AS w
           FROM documents),
         tf AS (SELECT doc_id, w, count(*) AS tf FROM tok GROUP BY 1, 2),
         dfreq AS (SELECT w, count(*) AS df FROM tf GROUP BY 1),
         dl AS (SELECT doc_id, CAST(sum(tf) AS BIGINT) AS dl FROM tf GROUP BY 1),
         corpus AS (SELECT count(*) AS n,
                      CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl FROM dl)
         SELECT tf.doc_id, tf.w, tf.tf, dfreq.df, dl.dl,
           floor(ln(1.0 + (n - df + 0.5) / (df + 0.5))
                 * (tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl)))
                 * 1e4 + 0.5) / 1e4 AS bm25
         FROM tf JOIN dfreq USING (w) JOIN dl USING (doc_id), corpus
         ORDER BY bm25 DESC, w, doc_id LIMIT 50""",
    "q_entropy_filter" ->
      """WITH tok AS (
           SELECT doc_id, unnest(string_split(lower(text), ' ')) AS w
           FROM documents),
         wc AS (SELECT doc_id, w, count(*) AS c FROM tok GROUP BY 1, 2),
         agg AS (
           SELECT doc_id, CAST(sum(c) AS BIGINT) AS nw, count(*) AS uniq,
             sum(c * ln(c)) AS slog
           FROM wc GROUP BY 1),
         ent AS (
           SELECT doc_id, nw, uniq,
             floor((ln(nw) - slog / nw) * 1e4 + 0.5) / 1e4 AS entropy
           FROM agg)
         SELECT doc_id, nw, uniq, entropy,
           CASE WHEN uniq > 1
             THEN floor(entropy / ln(uniq) * 1e4 + 0.5) / 1e4
             ELSE 0.0 END AS norm_ent,
           CAST(entropy >= 3.5 AS BIGINT) AS keep
         FROM ent ORDER BY doc_id""",
    "q_repeat_ngram" ->
      """WITH t AS (
           SELECT doc_id, string_split(text, ' ') AS w FROM documents),
         g AS (
           SELECT doc_id, i.i AS st,
             array_to_string(list_slice(w, i.i, i.i + 5), ' ') AS gram
           FROM t, LATERAL (SELECT unnest(range(1, len(w) - 4)) AS i) i),
         rep AS (
           SELECT gram FROM g GROUP BY gram
           HAVING count(DISTINCT doc_id) > 1),
         iv AS (
           SELECT g.doc_id, g.st, g.st + 5 AS en
           FROM g JOIN rep USING (gram)),
         m AS (
           SELECT doc_id, st, en,
             max(en) OVER (PARTITION BY doc_id ORDER BY st
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pmax
           FROM iv),
         cov AS (
           SELECT doc_id,
             CAST(sum(greatest(0,
               en - greatest(st, coalesce(pmax, 0) + 1) + 1))
               AS BIGINT) AS covered
           FROM m GROUP BY doc_id)
         SELECT t.doc_id, len(t.w) AS n_tokens,
           coalesce(cov.covered, 0) AS covered,
           floor(CAST(coalesce(cov.covered, 0) AS DOUBLE) / len(t.w)
                 * 10000 + 0.5) / 10000 AS rep_frac
         FROM t LEFT JOIN cov USING (doc_id) ORDER BY doc_id""",
    "q_mix_sample" ->
      """WITH d AS (
           SELECT doc_id, source,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS nt,
             md5(CAST(doc_id AS VARCHAR)) AS h
           FROM documents),
         c AS (SELECT source, CAST(sum(nt) AS BIGINT) AS tokens
               FROM d GROUP BY source),
         z AS (SELECT sum(sqrt(tokens)) AS z,
                 CAST(sum(tokens) AS BIGINT) AS total FROM c),
         r AS (
           SELECT source,
             least(1.0,
               floor(sqrt(tokens) / z * total / tokens * 1e4 + 0.5) / 1e4)
               AS rate,
             floor(sqrt(tokens) / z * total / tokens * 1e4 + 0.5) / 1e4
               AS want_rate
           FROM c, z),
         u AS (
           SELECT d.*, r.rate, r.want_rate,
             ((strpos('0123456789abcdef', substr(h, 1, 1)) - 1) * 1048576.0
              + (strpos('0123456789abcdef', substr(h, 2, 1)) - 1) * 65536
              + (strpos('0123456789abcdef', substr(h, 3, 1)) - 1) * 4096
              + (strpos('0123456789abcdef', substr(h, 4, 1)) - 1) * 256
              + (strpos('0123456789abcdef', substr(h, 5, 1)) - 1) * 16
              + (strpos('0123456789abcdef', substr(h, 6, 1)) - 1))
             / 16777216.0 AS u
           FROM d JOIN r ON d.source = r.source)
         SELECT source, count(*) AS kept_docs,
           CAST(sum(nt) AS BIGINT) AS kept_tokens,
           max(want_rate) AS want_rate
         FROM u WHERE u < rate
         GROUP BY source ORDER BY source""",
    "q_mix_weights" ->
      """WITH c AS (
           SELECT source,
             CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS tokens,
             count(*) AS docs
           FROM documents GROUP BY source),
         z AS (SELECT sum(sqrt(tokens)) AS z,
                 CAST(sum(tokens) AS BIGINT) AS total FROM c)
         SELECT source, tokens, docs,
           floor(sqrt(tokens) / z * 1000000 + 0.5) / 1000000 AS weight,
           floor(sqrt(tokens) / z * total * 100 + 0.5) / 100
             AS eff_tokens
         FROM c, z ORDER BY source""",
    "q_sample_weighted" ->
      """WITH d AS (
           SELECT doc_id,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS w,
             md5(CAST(doc_id AS VARCHAR)) AS h
           FROM documents),
         u AS (
           SELECT doc_id, w,
             (((strpos('0123456789abcdef', substr(h, 1, 1)) - 1) * 1048576.0
             + (strpos('0123456789abcdef', substr(h, 2, 1)) - 1) * 65536.0
             + (strpos('0123456789abcdef', substr(h, 3, 1)) - 1) * 4096.0
             + (strpos('0123456789abcdef', substr(h, 4, 1)) - 1) * 256.0
             + (strpos('0123456789abcdef', substr(h, 5, 1)) - 1) * 16.0
             + (strpos('0123456789abcdef', substr(h, 6, 1)) - 1)) + 1.0)
               / 16777216.0 AS u
           FROM d)
         SELECT doc_id, w,
           floor(ln(u) / w * 1e6 + 0.5) / 1e6 AS skey
         FROM u ORDER BY skey DESC, doc_id LIMIT 50""",
    "q_tfidf_pairs" ->
      """WITH t AS (
           SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
         tok AS (
           SELECT doc_id,
             array_to_string(list_slice(ws, i, i + 2), ' ') AS w
           FROM t, LATERAL (SELECT unnest(range(1,
             greatest(len(ws) - 1, 1))) AS i) i),
         tf AS (SELECT doc_id, w, count(*) AS tf FROM tok GROUP BY 1, 2),
         dfreq AS (
           SELECT w, count(*) AS df FROM tf GROUP BY 1
           HAVING count(*) <= 128),
         nd AS (SELECT count(DISTINCT doc_id) AS n FROM documents),
         wts AS (
           SELECT doc_id, w, tf * ln(CAST(n AS DOUBLE) / df) AS x
           FROM tf JOIN dfreq USING (w), nd),
         norms AS (
           SELECT doc_id, sqrt(sum(x * x)) AS nrm FROM wts GROUP BY 1),
         dots AS (
           SELECT a.doc_id AS da, b.doc_id AS db, sum(a.x * b.x) AS dot
           FROM wts a JOIN wts b
             ON a.w = b.w AND a.doc_id < b.doc_id
           GROUP BY 1, 2)
         SELECT da, db,
           floor(dot / (na.nrm * nb.nrm) * 1e4 + 0.5) / 1e4 AS cos
         FROM dots JOIN norms na ON na.doc_id = da
         JOIN norms nb ON nb.doc_id = db
         WHERE floor(dot / (na.nrm * nb.nrm) * 1e4 + 0.5) / 1e4 >= 0.3
         ORDER BY da, db""",
    "q_simpson_mix" ->
      """WITH cnt AS (
           SELECT lang, source, count(*) AS n
           FROM documents GROUP BY 1, 2)
         SELECT lang, count(*) AS n_sources,
           CAST(sum(n) AS BIGINT) AS n_docs,
           floor((1.0 - CAST(sum(n * n) AS DOUBLE)
                  / (sum(n) * sum(n))) * 1e4 + 0.5) / 1e4 AS simpson
         FROM cnt GROUP BY lang ORDER BY lang""",
    "q_vocab_coverage" ->
      """WITH freq AS (
           SELECT w, count(*) AS f FROM (
             SELECT unnest(string_split(lower(text), ' ')) AS w
             FROM documents) GROUP BY 1),
         tot AS (SELECT CAST(sum(f) AS BIGINT) AS tot FROM freq),
         ks AS (SELECT CAST(unnest([10, 100, 1000]) AS BIGINT) AS k),
         cov AS (
           SELECT ks.k,
             CAST((SELECT sum(f) FROM (
                SELECT f FROM freq ORDER BY f DESC, w LIMIT 10)) AS BIGINT)
               AS c10,
             CAST((SELECT sum(f) FROM (
                SELECT f FROM freq ORDER BY f DESC, w LIMIT 100)) AS BIGINT)
               AS c100,
             CAST((SELECT sum(f) FROM (
                SELECT f FROM freq ORDER BY f DESC, w
                LIMIT 1000)) AS BIGINT) AS c1000
           FROM ks)
         SELECT k,
           CASE k WHEN 10 THEN c10 WHEN 100 THEN c100
                  ELSE c1000 END AS cov,
           floor(CAST(CASE k WHEN 10 THEN c10 WHEN 100 THEN c100
                  ELSE c1000 END AS DOUBLE) / tot.tot * 1e4 + 0.5) / 1e4
             AS coverage
         FROM cov, tot ORDER BY k""",
    "q_sample_stratwt" ->
      """WITH d AS (
           SELECT doc_id, lang,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS w,
             md5(CAST(doc_id AS VARCHAR)) AS h
           FROM documents),
         u AS (
           SELECT doc_id, lang, w,
             (((strpos('0123456789abcdef', substr(h, 1, 1)) - 1) * 1048576.0
             + (strpos('0123456789abcdef', substr(h, 2, 1)) - 1) * 65536.0
             + (strpos('0123456789abcdef', substr(h, 3, 1)) - 1) * 4096.0
             + (strpos('0123456789abcdef', substr(h, 4, 1)) - 1) * 256.0
             + (strpos('0123456789abcdef', substr(h, 5, 1)) - 1) * 16.0
             + (strpos('0123456789abcdef', substr(h, 6, 1)) - 1)) + 1.0)
               / 16777216.0 AS u
           FROM d),
         k AS (
           SELECT doc_id, lang, w,
             floor(ln(u) / w * 1e6 + 0.5) / 1e6 AS skey
           FROM u)
         SELECT lang, CAST(rk AS BIGINT) AS rk, doc_id, w, skey FROM (
           SELECT lang, doc_id, w, skey,
             row_number() OVER (PARTITION BY lang
               ORDER BY skey DESC, doc_id) AS rk
           FROM k) t
         WHERE rk <= 5 ORDER BY lang, rk""",
    "q_distinct_n" ->
      """WITH t AS (
           SELECT doc_id, source, string_split(text, ' ') AS ws
           FROM documents),
         uni AS (
           SELECT source, count(*) AS tokens,
             count(DISTINCT g) AS d1
           FROM (SELECT source, unnest(ws) AS g FROM t) GROUP BY source),
         bi AS (
           SELECT source, count(*) AS bigrams,
             count(DISTINCT g) AS d2
           FROM (
             SELECT source,
               ws[i.i + 1] || ' ' || ws[i.i + 2] AS g
             FROM t, LATERAL (SELECT unnest(range(greatest(len(ws) - 1, 0)))
               AS i) i) GROUP BY source)
         SELECT u.source, u.tokens, u.d1,
           floor(CAST(u.d1 AS DOUBLE) / u.tokens * 1e4 + 0.5) / 1e4
             AS distinct1,
           b.bigrams, b.d2,
           floor(CAST(b.d2 AS DOUBLE) / b.bigrams * 1e4 + 0.5) / 1e4
             AS distinct2
         FROM uni u JOIN bi b ON u.source = b.source
         ORDER BY u.source""",
    "q_tok_fertility" ->
      """WITH b AS (
           SELECT lang, n_chars, strlen(text) AS nb,
             len(string_split(text, ' ')) AS nt
           FROM documents)
         SELECT lang, count(*) AS docs,
           CAST(sum(nt) AS BIGINT) AS tokens,
           CAST(sum(nb) AS BIGINT) AS bytes,
           floor(CAST(sum(nb) AS DOUBLE) / sum(nt) * 10000 + 0.5) / 10000
             AS bytes_per_tok,
           floor(CAST(sum(n_chars) AS DOUBLE) / sum(nt) * 10000 + 0.5)
             / 10000 AS chars_per_tok
         FROM b GROUP BY lang ORDER BY lang""",
    "q_winnow" -> s"""$winnowOracleCtes
         SELECT DISTINCT doc_id, sel % 1048576 AS fp_pos,
           sel >> 20 AS fp_hash
         FROM s WHERE pos <= m - 3
         ORDER BY doc_id, fp_pos""",
    "q_winnow_overlap" -> s"""$winnowOracleCtes,
         fps AS (
           SELECT DISTINCT doc_id, sel >> 20 AS fp_hash
           FROM s WHERE pos <= m - 3),
         fpp AS (
           SELECT doc_id, fp_hash FROM fps
           QUALIFY count(*) OVER (PARTITION BY fp_hash) <= 128)
         SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS shared
         FROM fpp a JOIN fpp b
           ON a.fp_hash = b.fp_hash AND a.doc_id < b.doc_id
         GROUP BY 1, 2
         ORDER BY shared DESC, da, db LIMIT 20""",
    "q_posting_df" ->
      """WITH t AS (
           SELECT doc_id, lang, string_split(text, ' ') AS w FROM documents),
         gi AS (
           SELECT doc_id, lang, unnest(range(1, greatest(len(w) - 2, 1))) AS i, w
           FROM t),
         g AS (
           SELECT DISTINCT doc_id, lang,
             array_to_string(list_slice(w, i, i + 3), ' ') AS gram
           FROM gi),
         p AS (SELECT lang, gram, count(*) AS df FROM g GROUP BY 1, 2)
         SELECT CAST(CASE WHEN df <= 1 THEN 0
                          ELSE length(bin(df - 1)) END AS BIGINT) AS bucket,
           df <= 128 AS kept,
           count(*) AS postings,
           CAST(sum(df) AS BIGINT) AS df_mass,
           CAST(sum(df * (df - 1) // 2) AS BIGINT) AS pair_mass
         FROM p GROUP BY 1, 2 ORDER BY bucket""",
    "q_edit_dedup" ->
      """WITH n AS (
           SELECT doc_id, trim(regexp_replace(regexp_replace(lower(text),
             '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')) AS norm
           FROM documents),
         b AS (
           SELECT doc_id, substr(norm, 1, 64) AS pfx,
             array_to_string(
               list_slice(string_split(norm, ' '), 1, 2), ' ') AS w2,
             length(norm) // 32 AS lb
           FROM n),
         c AS (SELECT w2, lb, count(*) AS df FROM b GROUP BY 1, 2)
         SELECT a.doc_id AS da, bb.doc_id AS db,
           CAST(levenshtein(a.pfx, bb.pfx) AS BIGINT) AS dist,
           CAST(levenshtein(a.pfx, bb.pfx) <= 16 AS BIGINT) AS near
         FROM b a
         JOIN b bb ON a.w2 = bb.w2 AND a.lb = bb.lb
           AND a.doc_id < bb.doc_id
         JOIN c ON c.w2 = a.w2 AND c.lb = a.lb AND c.df <= 128
         ORDER BY da, db""",
    "q_pmi_cooccur" ->
      """WITH dw AS (
           SELECT DISTINCT doc_id, w FROM (
             SELECT doc_id, unnest(string_split(text, ' ')) AS w
             FROM documents)
           WHERE length(w) > 0),
         v AS (
           SELECT w, count(*) AS nw FROM dw GROUP BY 1
           ORDER BY nw DESC, w LIMIT 24),
         t AS (SELECT count(*) AS d_total FROM documents),
         p AS (
           SELECT a.w AS wa, b.w AS wb, va.nw AS na, vb.nw AS nb,
             count(*) AS nab
           FROM dw a
           JOIN dw b ON a.doc_id = b.doc_id AND a.w < b.w
           JOIN v va ON va.w = a.w
           JOIN v vb ON vb.w = b.w
           GROUP BY 1, 2, 3, 4)
         SELECT wa, wb, CAST(nab AS BIGINT) AS nab,
           CAST(na AS BIGINT) AS na, CAST(nb AS BIGINT) AS nb,
           floor(ln(CAST(nab AS DOUBLE) * d_total /
             (CAST(na AS DOUBLE) * nb)) * 10000 + 0.5) / 10000
             AS pmi
         FROM p, t ORDER BY wa, wb""",
    "q_kl_drift" ->
      """WITH tk AS (
           SELECT source, w FROM (
             SELECT source, unnest(string_split(text, ' ')) AS w
             FROM documents)
           WHERE length(w) > 0),
         sw AS (SELECT source, w, count(*) AS c_sw FROM tk GROUP BY 1, 2),
         st AS (SELECT source, sum(c_sw) AS n_s FROM sw GROUP BY 1),
         cw AS (SELECT w, sum(c_sw) AS c_w FROM sw GROUP BY 1),
         tot AS (SELECT sum(c_sw) AS n_c FROM sw)
         SELECT source,
           floor(sum(c_sw / n_s *
             ln(c_sw::DOUBLE * n_c / (c_w::DOUBLE * n_s)))
             * 10000 + 0.5) / 10000 AS kl,
           CAST(max(n_s) AS BIGINT) AS n_tokens,
           CAST(count(*) AS BIGINT) AS n_vocab
         FROM sw JOIN cw USING (w) JOIN st USING (source), tot
         GROUP BY source ORDER BY source""",
    "q_novelty" ->
      """WITH t AS (
           SELECT doc_id, string_split(text, ' ') AS w FROM documents),
         gi AS (
           SELECT doc_id,
             unnest(range(1, greatest(len(w) - 3, 0) + 1)) AS i, w
           FROM t),
         g AS (
           SELECT DISTINCT doc_id,
             array_to_string(list_slice(w, i, i + 3), ' ') AS gram
           FROM gi),
         d AS (SELECT gram, count(*) AS df FROM g GROUP BY 1)
         SELECT doc_id, CAST(count(*) AS BIGINT) AS n_grams,
           CAST(sum(CASE WHEN df = 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_unique,
           floor(sum(CASE WHEN df = 1 THEN 1 ELSE 0 END) / count(*)
             * 10000 + 0.5) / 10000 AS novelty
         FROM g JOIN d USING (gram)
         GROUP BY doc_id ORDER BY doc_id""",
    "q_good_turing" ->
      """WITH tf AS (
           SELECT w, count(*) AS r FROM (
             SELECT unnest(string_split(lower(text), ' ')) AS w
             FROM documents) t
           GROUP BY w),
         fof AS (SELECT r, count(*) AS n_r FROM tf GROUP BY r),
         tot AS (SELECT CAST(sum(r) AS BIGINT) AS n FROM tf),
         mn AS (SELECT r AS r_min, n_r AS n_min FROM fof
                ORDER BY r LIMIT 1),
         low AS (SELECT r, n_r FROM fof ORDER BY r LIMIT 5)
         SELECT f.r, f.n_r,
           CAST(coalesce(f2.n_r, 0) AS BIGINT) AS n_next,
           floor((f.r + 1) * coalesce(f2.n_r, 0) / CAST(f.n_r AS DOUBLE)
             * 1e6 + 0.5) / 1e6 AS r_star,
           floor(m.n_min * CAST(m.r_min AS DOUBLE) / t.n * 1e6 + 0.5)
             / 1e6 AS p0
         FROM low f LEFT JOIN fof f2 ON f2.r = f.r + 1, tot t, mn m
         ORDER BY f.r""",
    "q_ttr_bucket" ->
      """SELECT least(9, n_chars // 100) AS bucket,
           count(*) AS n_docs,
           floor(avg(CAST(len(list_distinct(string_split(text, ' ')))
             AS DOUBLE) / len(string_split(text, ' ')))
             * 1e4 + 0.5) / 1e4 AS ttr
         FROM documents GROUP BY 1 ORDER BY 1""",
    "q_spearman" ->
      """WITH m AS (
           SELECT n_chars AS a,
             len(list_distinct(string_split(text, ' '))) AS b
           FROM documents),
         r AS (
           SELECT
             rank() OVER (ORDER BY a)
               + (count(*) OVER (PARTITION BY a) - 1) / 2.0 AS ra,
             rank() OVER (ORDER BY b)
               + (count(*) OVER (PARTITION BY b) - 1) / 2.0 AS rb
           FROM m)
         SELECT count(*) AS n_docs,
           floor(corr(ra, rb) * 1e4 + 0.5) / 1e4 AS spearman
         FROM r""",
    "q_mutual_info" ->
      """WITH cells AS (
           SELECT lang, source, count(*) AS n FROM documents
           GROUP BY 1, 2),
         r AS (SELECT lang, sum(n) AS rl FROM cells GROUP BY 1),
         c AS (SELECT source, sum(n) AS cs FROM cells GROUP BY 1),
         tot AS (SELECT sum(n) AS nn FROM cells)
         SELECT count(*) AS n_cells, CAST(sum(n) AS BIGINT) AS n_docs,
           floor(sum(CAST(n AS DOUBLE) / nn
             * ln(CAST(n * nn AS DOUBLE) / (rl * cs))) * 1e4 + 0.5)
             / 1e4 AS mi
         FROM cells JOIN r USING (lang) JOIN c USING (source), tot""",
    "q_chi2_indep" ->
      """WITH cells AS (
           SELECT lang, source, count(*) AS n FROM documents
           GROUP BY 1, 2),
         r AS (SELECT lang, sum(n) AS rl FROM cells GROUP BY 1),
         c AS (SELECT source, sum(n) AS cs FROM cells GROUP BY 1),
         tot AS (SELECT sum(n) AS nn FROM cells)
         SELECT count(*) AS n_cells,
           CAST((count(DISTINCT lang) - 1)
             * (count(DISTINCT source) - 1) AS BIGINT) AS dof,
           floor(sum(power(CAST(n * nn - rl * cs AS DOUBLE), 2)
             / CAST(rl * cs AS DOUBLE) / nn) * 1e4 + 0.5) / 1e4 AS chi2
         FROM cells JOIN r USING (lang) JOIN c USING (source), tot""",
    "q_js_split" ->
      """WITH tok AS (
           SELECT lang,
             unnest(string_split(lower(text), ' ')) AS w,
             strpos('0123456789abcdef',
               substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) AS b
           FROM documents),
         cnt AS (
           SELECT lang, w,
             sum(CASE WHEN b <= 12 THEN 1 ELSE 0 END) AS c0,
             sum(CASE WHEN b > 12 THEN 1 ELSE 0 END) AS c1
           FROM tok GROUP BY 1, 2),
         tot AS (
           SELECT lang, sum(c0) AS n0, sum(c1) AS n1 FROM cnt
           GROUP BY 1),
         terms AS (
           SELECT lang, n0, n1,
             CASE WHEN c0 > 0 THEN CAST(c0 AS DOUBLE) / n0 *
               ln(2.0 * c0 * n1 /
                 (CAST(c0 AS DOUBLE) * n1 + CAST(c1 AS DOUBLE) * n0))
             ELSE 0.0 END AS tp,
             CASE WHEN c1 > 0 THEN CAST(c1 AS DOUBLE) / n1 *
               ln(2.0 * c1 * n0 /
                 (CAST(c0 AS DOUBLE) * n1 + CAST(c1 AS DOUBLE) * n0))
             ELSE 0.0 END AS tq
           FROM cnt JOIN tot USING (lang))
         SELECT lang, CAST(max(n0) AS BIGINT) AS n_train_tokens,
           CAST(max(n1) AS BIGINT) AS n_held_tokens,
           floor((sum(tp) + sum(tq)) / 2 * 1e4 + 0.5) / 1e4 AS jsd
         FROM terms GROUP BY lang ORDER BY lang""",
    "q_simpson" ->
      """WITH cnt AS (
           SELECT lang, w, count(*) AS c FROM (
             SELECT lang,
               unnest(string_split(lower(text), ' ')) AS w
             FROM documents)
           GROUP BY 1, 2)
         SELECT lang, count(*) AS vocab,
           CAST(sum(c) AS BIGINT) AS n_tokens,
           floor((1.0 - CAST(sum(c * (c - 1)) AS DOUBLE)
             / (CAST(sum(c) AS DOUBLE) * CAST(sum(c) - 1 AS DOUBLE)))
             * 1e4 + 0.5) / 1e4 AS simpson_div
         FROM cnt GROUP BY lang ORDER BY lang""",
    "q_herfindahl" ->
      """WITH cells AS (
           SELECT lang, source, count(*) AS n FROM documents
           GROUP BY 1, 2),
         tot AS (SELECT lang, sum(n) AS nl FROM cells GROUP BY 1)
         SELECT lang, count(*) AS n_sources,
           CAST(max(nl) AS BIGINT) AS n_docs,
           floor(sum(power(CAST(n AS DOUBLE) / nl, 2)) * 1e4 + 0.5)
             / 1e4 AS hhi
         FROM cells JOIN tot USING (lang)
         GROUP BY lang ORDER BY lang""",
    "q_oov_rate" ->
      """WITH tok AS (
           SELECT lang, doc_id,
             unnest(string_split(lower(text), ' ')) AS w,
             strpos('0123456789abcdef',
               substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) AS b
           FROM documents),
         train AS (
           SELECT DISTINCT lang, w FROM tok WHERE b <= 12),
         held AS (SELECT lang, w FROM tok WHERE b > 12)
         SELECT h.lang, count(*) AS held_tokens,
           CAST(sum(CASE WHEN t.w IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS oov_tokens,
           floor(sum(CASE WHEN t.w IS NULL THEN 1 ELSE 0 END)
             / CAST(count(*) AS DOUBLE) * 1e4 + 0.5) / 1e4 AS oov_rate
         FROM held h LEFT JOIN train t
           ON t.lang = h.lang AND t.w = h.w
         GROUP BY h.lang ORDER BY h.lang""",
    "q_cramers_v" ->
      """WITH cells AS (
           SELECT lang, source, count(*) AS n FROM documents
           GROUP BY 1, 2),
         r AS (SELECT lang, sum(n) AS rl FROM cells GROUP BY 1),
         c AS (SELECT source, sum(n) AS cs FROM cells GROUP BY 1),
         tot AS (SELECT sum(n) AS nn FROM cells)
         SELECT count(*) AS n_cells, CAST(sum(n) AS BIGINT) AS n_docs,
           floor(sqrt(
             sum(power(CAST(n * nn - rl * cs AS DOUBLE), 2)
               / CAST(rl * cs AS DOUBLE) / nn)
             / CAST(max(nn) * (least(count(DISTINCT lang),
                 count(DISTINCT source)) - 1) AS DOUBLE)) * 1e4 + 0.5)
             / 1e4 AS v
         FROM cells JOIN r USING (lang) JOIN c USING (source), tot"""
  )

  /** Shared winnowing CTEs (k=4, w=4) — the oracle twin of
    * [[winnowRows]]. */
  private def winnowOracleCtes: String =
    """WITH t AS (
           SELECT doc_id, string_split(text, ' ') AS w FROM documents),
         g AS (
           SELECT doc_id, len(w) - 3 AS m, i.i AS pos,
             CAST(CAST(('0x' || substr(md5(
               array_to_string(list_slice(w, i.i, i.i + 3), ' ')), 1, 8))
               AS UBIGINT) AS BIGINT) AS h
           FROM t, LATERAL (SELECT unnest(range(1, len(w) - 2)) AS i) i),
         s AS (
           SELECT doc_id, pos, m,
             min(h * 1048576 + pos) OVER (PARTITION BY doc_id
               ORDER BY pos
               ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS sel
           FROM g)"""
}
