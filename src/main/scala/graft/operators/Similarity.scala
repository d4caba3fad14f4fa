package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions

/** Similarity-search operators over embedding columns (SURVEY §2.10 L3).
  *
  * All scoring goes through the codegen'd [[graft.functions.CosineSimilarity]]
  * expression. Plan shapes and their 100 TB behavior:
  *
  *  - [[topK]]: broadcast the (tiny) query side, scan candidates once,
  *    TakeOrderedAndProject — no shuffle of the candidate table at all;
  *    scales linearly with executors.
  *  - [[nearDupPairs]]: candidate pairs only within a blocking key
  *    (label, LSH bucket, shard) — the blocked equi-join shuffles each
  *    side once on the block key; never all-pairs.
  *  - [[ivfTopK]]: two-stage ANN — pick the best coarse cell by centroid
  *    similarity (tiny), then exact search only inside that cell
  *    (partition-prunable when the table is partitioned by the cell key).
  */
object Similarity {
  private def cs(a: String, b: String) = expr(s"cosine_sim($a, $b)")

  /** Exact top-k rows most similar to the vector of `queryId`. */
  def topK(spark: SparkSession, emb: DataFrame, idCol: String,
      vecCol: String, queryId: Long, k: Int): DataFrame = {
    GraftFunctions.register(spark)
    val q = emb.filter(col(idCol) === queryId)
      .select(col(vecCol).as("__qv"))
    emb.filter(col(idCol) =!= queryId)
      .crossJoin(broadcast(q))
      .select(col(idCol), cs(vecCol, "__qv").as("similarity"))
      .orderBy(desc("similarity"), asc(idCol))
      .limit(k)
  }

  /** All pairs above `threshold` within each blocking-key group. */
  def nearDupPairs(spark: SparkSession, emb: DataFrame, idCol: String,
      vecCol: String, blockCol: String, threshold: Double): DataFrame = {
    GraftFunctions.register(spark)
    val a = emb.select(col(idCol).as("id_a"), col(blockCol).as("__blk"),
      col(vecCol).as("__va"))
    val b = emb.select(col(idCol).as("id_b"), col(blockCol).as("__blk2"),
      col(vecCol).as("__vb"))
    a.join(b, col("__blk") === col("__blk2") && col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), cs("__va", "__vb").as("similarity"))
      .filter(col("similarity") >= threshold)
  }

  /** Caps per-cluster fan-out for within-cluster pair ops (SemDeDup's
    * k ∝ N regime applied under a FIXED cluster column): any cluster
    * larger than the cap is Voronoi-split on its own ceil(n/cap)
    * lowest-id members as sub-quantizer seeds — one deterministic
    * assignment round with the q_kmeans kernel discipline (4-dp-rounded
    * d2 = ‖v‖² − 2·v·s + ‖s‖², min-seed-id tiebreak).
    *
    * ADAPTIVE cap (r10): the effective per-cluster cap is
    * `max(cap, ceil(sqrt(n)))` where n is that cluster's row count —
    * already present in the seed-selection window, zero extra passes.
    * At a FIXED cap the assignment term is n·ceil(n/cap) = Θ(n²/cap)
    * (the r9 verdict measured exponent 1.87); with cap ∝ √n both the
    * assignment term and the pair term are Θ(n^1.5) — the balance
    * SCALE.md's own analysis prescribed, now in code (measured exponent
    * in SCALE.md, CurveProbe `semsub` section). Below n = cap² the
    * floor keeps the r9 behavior bit-for-bit (every fixture label is in
    * this regime, so oracle results are unchanged). `ceil(sqrt(n))` is
    * engine-stable: IEEE-754 sqrt is correctly rounded in both the JVM
    * and DuckDB.
    *
    * Plan shape: seed SELECTION ranks a 2-column (id, cluster)
    * projection (trainer-side artifact build; at real scale seeds come
    * from a trained coarse quantizer with k ∝ N); seed vectors gather
    * via a broadcast semi-side join; per-cluster seed ARRAYS broadcast
    * back (one small row per cluster) and the argmin is a map-side
    * `array_min` over (d2, sid) structs — the data side is never
    * shuffled or exploded for assignment. Downstream pair joins key on
    * (cluster, sub), bounding candidate pairs at ~N·cap; measured
    * sub-quadratic curve in SCALE.md (r9).
    *
    * @return input frame + `sub` (LongType, the winning seed id — a
    *         stable subcluster label unique within the cluster).
    */
  def subclusterByCap(spark: SparkSession, emb: DataFrame, idCol: String,
      clusterCol: String, vecCol: String, cap: Int): DataFrame = {
    GraftFunctions.register(spark)
    import org.apache.spark.sql.expressions.Window
    val wl = Window.partitionBy(clusterCol).orderBy(idCol)
    val seedIds = emb.select(col(idCol), col(clusterCol))
      .withColumn("__rk", row_number().over(wl))
      .withColumn("__n", count(lit(1))
        .over(Window.partitionBy(clusterCol)))
      .withColumn("__cap",
        greatest(lit(cap.toLong), ceil(sqrt(col("__n")))))
      .filter(col("__rk") <= expr("(__n + __cap - 1) div __cap"))
      .select(col(idCol).as("__sid"))
    val seedArr = emb
      .join(broadcast(seedIds), col(idCol) === col("__sid"))
      .groupBy(col(clusterCol).as("__sl"))
      .agg(sort_array(collect_list(struct(col(idCol).as("sid"),
        col(vecCol).as("sv")))).as("__seeds"))
    emb.join(broadcast(seedArr), col(clusterCol) === col("__sl"))
      .withColumn("__vv", expr(s"dot_product($vecCol, $vecCol)"))
      .withColumn("sub", expr(
        s"""array_min(transform(__seeds, s -> named_struct(
          |'d2', floor((__vv - 2 * dot_product($vecCol, s.sv)
          |             + dot_product(s.sv, s.sv)) * 10000 + 0.5)
          |      / 10000,
          |'sid', s.sid))).sid""".stripMargin))
      .drop("__sl", "__seeds", "__vv")
  }

  /** Deterministic pseudo-random unit-less hyperplanes for [[lshBuckets]]
    * (splitmix64-seeded, so every run/cluster derives identical planes). */
  def hyperplanes(nPlanes: Int, dim: Int, seed: Long = 42L): Seq[Seq[Float]] =
    (0 until nPlanes).map { i =>
      (0 until dim).map { j =>
        val h = graft.functions.MinHashAgg.splitmix64(
          seed + i.toLong * dim + j)
        (h.toDouble / Long.MaxValue).toFloat // uniform-ish in [-1, 1]
      }
    }

  /** Cross-engine-derivable integer hyperplanes: component (p, j) =
    * (first-8-hex-chars of md5("p:j") as unsigned int) mod 7 − 3, i.e.
    * small ints in [−3, 3]. Any engine with md5 over strings rebuilds the
    * exact planes (DuckDB: `('0x' || substr(md5(p||':'||j),1,8))::UBIGINT
    * % 7 - 3`), which makes an LSH bucketing ORACLE-CHECKABLE — the
    * splitmix64 float planes of [[hyperplanes]] have no SQL twin. Small
    * integer weights lose nothing for sign-pattern LSH: only the dot's
    * SIGN matters, and the md5 derivation is as direction-uniform as a
    * 7-level quantization allows. */
  def md5Planes(nPlanes: Int, dim: Int): Seq[Seq[Int]] =
    (0 until nPlanes).map { p =>
      (0 until dim).map { j =>
        val d = java.security.MessageDigest.getInstance("MD5")
          .digest(s"$p:$j".getBytes("UTF-8"))
        val hex = d.take(4).map(b => f"$b%02x").mkString
        (java.lang.Long.parseLong(hex, 16) % 7 - 3).toInt
      }
    }

  /** Random-hyperplane LSH bucketing: `bucket` = the sign pattern of the
    * vector against `planes` (cosine-LSH). Vectors with high cosine agree
    * on most signs, so near neighbors collide with high probability —
    * partition/bucket the corpus by this column and ANN queries become a
    * partition-pruned scan of one bucket (+ optionally its Hamming-1
    * neighbors for recall). The scale alternative to [[ivfTopK]] when no
    * coarse quantizer exists. */
  def lshBuckets(spark: SparkSession, emb: DataFrame, vecCol: String,
      planes: Seq[Seq[Float]]): DataFrame = {
    GraftFunctions.register(spark)
    val bucket = planes.zipWithIndex.map { case (p, i) =>
      when(expr(s"cosine_sim($vecCol, " +
        s"array(${p.mkString("F,")}F))") > 0, 1L << i).otherwise(0L)
    }.reduce(_ + _)
    emb.withColumn("bucket", bucket)
  }

  /** Multi-table cosine-LSH candidate pairs (the vector analog of
    * [[Dedup.minhashLsh]] banding): `tables` independent sign-signatures
    * of `bitsPerTable` hyperplanes each; a pair is a candidate if it
    * collides in ANY table. Collision probability per table is
    * (1 − θ/π)^bits, so with 8×8 the construction catches cosine ≥ 0.99
    * pairs with ≈ 99.99 % probability while random pairs (θ ≈ 90°)
    * almost never collide. NOTE the honest limit, measured on this
    * corpus: for weakly-similar neighbors (cosine ≈ 0.35, as between
    * random vectors) NO bucketing scheme retains recall — that regime
    * needs [[ivfTopK]]-style probing or brute [[topK]]. */
  def lshCandidates(spark: SparkSession, emb: DataFrame, idCol: String,
      vecCol: String, dim: Int, bitsPerTable: Int = 8, tables: Int = 8,
      seed: Long = 42L): DataFrame = {
    // dim is a caller-supplied constant (embedding dimensionality is a
    // corpus-level invariant): inferring it here would run a Spark job at
    // plan-BUILD time, making the operator eager — see OperatorsSpec's
    // zero-jobs-at-construction listener assertion. But a WRONG dim would
    // silently degrade recall (hyperplane dots over truncated/zero-padded
    // vectors), so validate it lazily: the guard below is a per-row
    // codegen'd branch that raises on the FIRST action if any vector's
    // length disagrees — loud failure, still zero jobs at build time.
    val checked = emb.withColumn(vecCol,
      when(size(col(vecCol)) === dim, col(vecCol)).otherwise(raise_error(
        format_string(s"lshCandidates: size($vecCol)=%d != dim=$dim",
          size(col(vecCol))))))
    val banded = (0 until tables).map { t =>
      val planes = hyperplanes(bitsPerTable, dim, seed + t * 7919)
      lshBuckets(spark, checked, vecCol, planes)
        .select(col(idCol), lit(t).as("table"), col("bucket"))
    }.reduce(_ union _)
    banded.as("a").join(banded.as("b"),
        col("a.table") === col("b.table") &&
        col("a.bucket") === col("b.bucket") &&
        col(s"a.$idCol") < col(s"b.$idCol"))
      .groupBy(col(s"a.$idCol").as("id_a"), col(s"b.$idCol").as("id_b"))
      .agg(count(lit(1)).as("n_tables"))
  }

  /** IVF-style two-stage ANN: probe the single best cell (by centroid
    * cosine), exact top-k within it. `cellCol` is the coarse-quantizer
    * assignment (k-means cell, or any deterministic proxy). */
  def ivfTopK(spark: SparkSession, emb: DataFrame, idCol: String,
      vecCol: String, cellCol: String, queryId: Long, k: Int,
      nprobe: Int = 1): DataFrame = {
    require(nprobe >= 1, "nprobe must be >= 1")
    GraftFunctions.register(spark)
    val asD = emb.select(col(idCol), col(cellCol),
      transform(col(vecCol), _.cast("double")).as("__v"))
    val cents = asD
      .select(col(cellCol), posexplode(col("__v")).as(Seq("__p", "__x")))
      .groupBy(cellCol, "__p").agg(avg("__x").as("__cx"))
      .groupBy(cellCol)
      .agg(transform(array_sort(collect_list(struct(col("__p"), col("__cx")))),
        s => s.getField("__cx")).as("__cv"))
    val q = asD.filter(col(idCol) === queryId).select(col("__v").as("__qv"))
    // nprobe is THE recall knob: probe the nprobe nearest coarse cells
    // instead of one — scan cost grows ~linearly in nprobe, recall
    // approaches exact as nprobe → |cells| (pinned in OperatorsSpec)
    val best = cents.crossJoin(broadcast(q))
      .select(col(cellCol), cs("__cv", "__qv").as("__ccs"))
      .orderBy(desc("__ccs"), asc(cellCol))
      .limit(nprobe).select(col(cellCol).as("__best"))
    asD.filter(col(idCol) =!= queryId)
      .join(broadcast(best), col(cellCol) === col("__best"))
      .crossJoin(broadcast(q))
      .select(col(idCol), cs("__v", "__qv").as("similarity"))
      .orderBy(desc("similarity"), asc(idCol))
      .limit(k)
  }

  /** Per-vector int8 scalar quantization (r7): `codesCol` = the vector
    * scaled to [-127, 127] and rounded half-up (array<tinyint>, 4× less
    * memory/scan bandwidth than float32), `scaleCol` = max |x| / 127
    * (one double per vector; x̂_i = code_i · scale reconstructs).
    *
    * This is the standard first compression rung for vector search at
    * 100 TB — store codes+scale, search with [[dequantizeInt8]]'d vectors
    * (asymmetric: full-precision query against quantized base), keep the
    * float column only for a final re-rank of the shortlist. Map-only,
    * no shuffle. An all-zero vector quantizes to scale 0 / all-zero
    * codes (guarded — no NaN division).
    *
    * Per-VECTOR max-abs scaling (not a global or per-dimension grid)
    * keeps the quantization error of every vector proportional to its
    * own magnitude and needs no training pass; the relative
    * reconstruction error is bounded by 1/254 per element. */
  def quantizeInt8(emb: DataFrame, vecCol: String,
      codesCol: String = "codes", scaleCol: String = "scale"): DataFrame =
    emb
      .withColumn(scaleCol, expr(
        s"aggregate($vecCol, CAST(0.0 AS DOUBLE), " +
          "(m, x) -> greatest(m, abs(CAST(x AS DOUBLE)))) / 127.0D"))
      .withColumn(codesCol, expr(
        s"CASE WHEN $scaleCol = 0.0D " +
          s"THEN transform($vecCol, x -> CAST(0 AS TINYINT)) " +
          s"ELSE transform($vecCol, x -> " +
          s"CAST(floor(CAST(x AS DOUBLE) / $scaleCol + 0.5D) AS TINYINT)) " +
          "END"))

  /** Reconstruction expression for [[quantizeInt8]] output:
    * `transform(codes, c -> c · scale)` — an array<double> usable
    * directly by `cosine_sim` (asymmetric distance). */
  def dequantizeInt8(codesCol: String, scaleCol: String)
      : org.apache.spark.sql.Column =
    expr(s"transform($codesCol, c -> CAST(c AS DOUBLE) * $scaleCol)")
}
