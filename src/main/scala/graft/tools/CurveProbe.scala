package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Measured scale curves for the r8 heavy keys (VERDICT r8 §next-7):
  * `q_semdedup`, `q_winnow`, `q_join_6way` across the three fixture
  * scales, anchor-normalized to the same-run `q_agg_groupby` (the
  * SCALE.md cross-session discipline — absolute seconds are not
  * comparable across sessions, same-run ratios are), plus DedupScale's
  * honest ×k synthesis for winnow (salted replicas — no cross-replica
  * fingerprint collisions) and the 6-way join (key-remapped replicas of
  * customer/orders/lineitem — join structure ×k, dims fixed).
  * Numbers land in SCALE.md with exponents
  * log(time ratio)/log(rows ratio). */
object CurveProbe {
  private def time(f: => Long): (Long, Double) = {
    val t0 = System.nanoTime()
    val n = f
    (n, (System.nanoTime() - t0) / 1e9)
  }

  /** warm-up once, median of 3. */
  private def med3(f: => Long): (Long, Double) = {
    f
    val runs = (1 to 3).map(_ => time(f))
    (runs.head._1, runs.map(_._2).sorted.apply(1))
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def key(k: String, dir: String): Long = {
      val n = graft.SparkEntry.queries(k)(spark, dir).count()
      graft.Caching.releaseAll()
      n
    }

    println("== per-sf curve (anchor = q_agg_groupby, same run) ==")
    val sfs = Seq("0.001", "0.01", "0.1")
    val rows = sfs.map { sf =>
      val dir = s"/root/testdata/sf$sf"
      val (_, tA) = med3(key("q_agg_groupby", dir))
      val (_, tS) = med3(key("q_semdedup", dir))
      val (_, tW) = med3(key("q_winnow", dir))
      val (_, tJ) = med3(key("q_join_6way", dir))
      val nE = Tables.table(spark, dir, "embeddings").count()
      val nD = Tables.table(spark, dir, "documents").count()
      val nL = Tables.table(spark, dir, "lineitem").count()
      println(f"sf$sf%-6s anchor=$tA%6.3f s  semdedup=$tS%6.3f s " +
        f"(${tS / tA}%5.2f×a, N=$nE)  winnow=$tW%6.3f s " +
        f"(${tW / tA}%5.2f×a, N=$nD)  join6=$tJ%6.3f s " +
        f"(${tJ / tA}%5.2f×a, N=$nL)")
      (tA, tS, tW, tJ, nE, nD, nL)
    }
    def expo(t1: Double, t2: Double, n1: Long, n2: Long): Double =
      math.log(t2 / t1) / math.log(n2.toDouble / n1)
    val (a1, s1, w1, j1, e1, d1, l1) = rows(1)
    val (a2, s2, w2, j2, e2, d2, l2) = rows(2)
    println(f"exponents sf0.01->0.1 (anchor-normalized): " +
      f"semdedup=${expo(s1 / a1, s2 / a2, e1, e2)}%.2f " +
      f"winnow=${expo(w1 / a1, w2 / a2, d1, d2)}%.2f " +
      f"join6=${expo(j1 / a1, j2 / a2, l1, l2)}%.2f")

    println("== synthetic xK (same-run A/B, sf0.1 base) ==")
    val dir = "/root/testdata/sf0.1"
    val k = sys.env.getOrElse("SPARK_GRAFT_SCALE_K", "10").toInt

    // winnow: salted replicas (DedupScale's honesty rule — every word
    // differs across replicas, so no cross-replica fingerprint hits)
    val docs = Tables.table(spark, dir, "documents")
      .select("doc_id", "lang", "text")
    def docsX(k: Int): DataFrame =
      if (k == 1) docs
      else docs.crossJoin(spark.range(k).select(col("id").as("__r")))
        .select((col("doc_id") * k + col("__r")).as("doc_id"), col("lang"),
          concat(concat_ws("", lit("r"), col("__r"), lit("_")),
            regexp_replace(col("text"), lit(" "),
              concat_ws("", lit(" r"), col("__r"), lit("_")))).as("text"))
    def winnowOn(d: DataFrame): Long =
      graft.queries.TextOps.winnowRows(d).count()
    val w1x = { val d = docs.localCheckpoint(true); med3(winnowOn(d)) }
    val wkx = { val d = docsX(k).localCheckpoint(true); med3(winnowOn(d)) }
    println(f"winnow   1x rows=${w1x._1}%9d t=${w1x._2}%6.2f s   " +
      f"${k}x rows=${wkx._1}%9d t=${wkx._2}%6.2f s   " +
      f"time ratio ${wkx._2 / w1x._2}%.1f× for ${k}x rows")

    // 6-way join: replicate the SF-scaling tables with remapped keys —
    // the join graph is k disjoint copies; dims (supplier/nation/region)
    // stay fixed exactly as they would at a real higher SF
    val cu = Tables.table(spark, dir, "customer")
    val o = Tables.table(spark, dir, "orders")
    val l = Tables.table(spark, dir, "lineitem")
    val su = Tables.table(spark, dir, "supplier")
    val na = Tables.table(spark, dir, "nation")
    val re = Tables.table(spark, dir, "region")
    def rep(df: DataFrame, k: Int, keys: Seq[String]): DataFrame =
      if (k == 1) df
      else {
        val x = df.crossJoin(spark.range(k).select(col("id").as("__r")))
        keys.foldLeft(x) { (d, c) =>
          d.withColumn(c, col(c) * k + col("__r")) }.drop("__r")
      }
    def join6(cuX: DataFrame, oX: DataFrame, lX: DataFrame): Long = {
      val of = oX.filter(col("o_orderdate") >= lit("1996-01-01") &&
        col("o_orderdate") < lit("1997-01-01"))
      val rf = re.filter(col("r_name") === "ASIA")
      cuX.join(of, cuX("c_custkey") === of("o_custkey"))
        .join(lX, of("o_orderkey") === lX("l_orderkey"))
        .join(su, lX("l_suppkey") === su("s_suppkey") &&
          cuX("c_nationkey") === su("s_nationkey"))
        .join(broadcast(na), su("s_nationkey") === na("n_nationkey"))
        .join(broadcast(rf), na("n_regionkey") === rf("r_regionkey"))
        .groupBy("n_name")
        .agg(count(lit(1)).as("cnt"))
        .count()
    }
    val j1x = {
      val (c1, o1, li1) = (cu.localCheckpoint(true),
        o.localCheckpoint(true), l.localCheckpoint(true))
      med3(join6(c1, o1, li1))
    }
    val jkx = {
      val ck = rep(cu, k, Seq("c_custkey")).localCheckpoint(true)
      val ok = rep(o, k, Seq("o_orderkey", "o_custkey"))
        .localCheckpoint(true)
      val lk = rep(l, k, Seq("l_orderkey")).localCheckpoint(true)
      med3(join6(ck, ok, lk))
    }
    println(f"join6    1x t=${j1x._2}%6.2f s   ${k}x t=${jkx._2}%6.2f s" +
      f"   time ratio ${jkx._2 / j1x._2}%.1f× for ${k}x rows")

    // semsub (r10): subcluster ASSIGNMENT under one hot label, past the
    // fixed-cap regime (n > 32² = 1024) where the adaptive cap
    // max(32, ceil(√n)) kicks in. At fixed cap=32 the assignment term
    // n·ceil(n/32) is Θ(n²) (r9 measured exponent 1.87); adaptive must
    // measure ≤ 1.5 for both the eval count and the candidate-pair
    // volume. Vectors are deterministic sin-derived floats (content is
    // irrelevant to the COST curve; no RNG).
    println("== semsub: adaptive-cap assignment under ONE hot label ==")
    val semRows = Seq(2048, 8192, 32768).map { n =>
      val e = spark.range(n).select(col("id").as("vec_id"),
          lit(0L).as("label"),
          expr("transform(sequence(0, 63), " +
            "j -> CAST(sin(id * 64 + j) AS FLOAT))").as("embedding"))
        .localCheckpoint(true)
      def assign() = graft.operators.Similarity.subclusterByCap(
        spark, e, "vec_id", "label", "embedding", 32)
      val (_, t) = med3(assign().count())
      val pairs = assign().groupBy("sub")
        .agg(count(lit(1)).as("c"))
        .agg(sum(expr("c * (c - 1) div 2")).cast("long"))
        .first().getLong(0)
      val cap = math.max(32L, math.ceil(math.sqrt(n.toDouble)).toLong)
      val seeds = (n + cap - 1) / cap
      val evals = n.toLong * seeds
      println(f"n=$n%6d cap=$cap%4d seeds=$seeds%5d " +
        f"assignEvals=$evals%10d subPairs=$pairs%10d t=$t%6.2f s")
      (n, t, evals, pairs)
    }
    val (nLo, ta, ea, pa2) = semRows.head
    val (nHi, tb, eb, pb2) = semRows.last
    def sx(y2: Double, y1: Double) =
      math.log(y2 / y1) / math.log(nHi.toDouble / nLo)
    println(f"semsub exponents n=$nLo->$nHi: time=${sx(tb, ta)}%.2f " +
      f"evals=${sx(eb.toDouble, ea.toDouble)}%.2f " +
      f"pairs=${sx(pb2.toDouble, pa2.toDouble)}%.2f (target <= 1.5)")
    spark.stop()
  }
}
