package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.Components

/** Measured scale curves for the r11 band-graph trio (VERDICT r11
  * §next-3): `q_dedup_keepbest` (the board's slowest key, 2.47 s),
  * `q_pagerank`, `q_triangles`. The docs table is stepped ×4/×16 via
  * SALTED replicas (CurveProbe's honesty rule: every word differs across
  * replicas, so band signatures differ and there are NO cross-replica
  * band collisions — the graph is k disjoint copies, edges scale exactly
  * ×k and component diameter is unchanged). Stages are timed on a
  * checkpointed edge frame so each exponent isolates ITS stage:
  *   - edge build (band self-join + distinct) — claim: linear in docs
  *   - connected components (min-label) — claim: linear per round,
  *     ROUNDS constant (diameter is a template-family property)
  *   - keeper pick (max_by agg + component-equi fan-out) — linear
  *   - pagerank (5 rounds, ONE equi-join + map-combined sum each) — linear
  *   - triangle wedge join — claim: Σ outdeg² ≤ m^1.5 (exponent ≤ 1.5 in
  *     edges; ~1.0 here since replicas add no hubs — the m^1.5 hub bound
  *     is separately argued by degree-ordered orientation)
  * Exponents land in SCALE.md (log(time ratio)/log(docs ratio)). */
object GraphCurveProbe {
  private def med3(f: => Long): (Long, Double) = {
    f
    val runs = (1 to 3).map { _ =>
      val t0 = System.nanoTime()
      val n = f
      (n, (System.nanoTime() - t0) / 1e9)
    }
    (runs.head._1, runs.map(_._2).sorted.apply(1))
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    val docs = Tables.table(spark, dir, "documents")
      .select("doc_id", "lang", "text", "n_chars")
    def docsX(k: Int): DataFrame =
      if (k == 1) docs
      else docs.crossJoin(spark.range(k).select(col("id").as("__r")))
        .select((col("doc_id") * k + col("__r")).as("doc_id"), col("lang"),
          concat(concat_ws("", lit("r"), col("__r"), lit("_")),
            regexp_replace(col("text"), lit(" "),
              concat_ws("", lit(" r"), col("__r"), lit("_")))).as("text"),
          col("n_chars"))

    case class Row(k: Int, docs: Long, edges: Long, tEdge: Double,
      ccRounds: Int, tCc: Double, tKeep: Double, tPr: Double,
      wedges: Long, tris: Long, tTri: Double)

    val rows = Seq(1, 4, 16).map { k =>
      val d = docsX(k).localCheckpoint(true)
      val nDocs = d.count()

      // stage 1: band build + pair edges (the shared front of all three)
      def edgesOf(): DataFrame = {
        val bands = graft.queries.TextOps.bandRows(d)
        bands.as("a").join(bands.as("b"),
            col("a.band") === col("b.band") &&
            col("a.band_sig") === col("b.band_sig") &&
            col("a.doc_id") < col("b.doc_id"))
          .select(col("a.doc_id").as("da"), col("b.doc_id").as("db"))
          .distinct()
      }
      val (m, tEdge) = med3(edgesOf().count())
      val pairs = edgesOf().localCheckpoint(true)

      // stage 2: connected components (rounds + wall)
      var ccRounds = 0
      val (_, tCc) = med3 {
        val (labels, r) = Components.minLabelWithRounds(pairs)
        ccRounds = r
        labels.count()
      }
      val comp = Components.connectedComponents(pairs).localCheckpoint(true)

      // stage 3: keeper pick (q_dedup_keepbest's tail, given components)
      val (_, tKeep) = med3 {
        val withC = comp.join(
          d.select(col("doc_id").as("id"), col("n_chars")), "id")
        val keepers = withC.groupBy("comp")
          .agg(max_by(col("id"),
            struct(col("n_chars"), -col("id"))).as("keeper"))
        withC.join(keepers, "comp")
          .select(col("id"), col("keeper"),
            (col("id") === col("keeper")).as("keep"))
          .count()
      }

      // stage 4: pagerank (5 rounds on the symmetric edge frame)
      val (_, tPr) = med3 {
        val edges = pairs.select(col("da").as("src"), col("db").as("dst"))
          .union(pairs.select(col("db").as("src"), col("da").as("dst")))
        val deg = edges.groupBy("src").agg(count(lit(1)).as("dg"))
          .localCheckpoint(true)
        val ed = edges.join(deg, "src").localCheckpoint(true)
        val nF = deg.select(count(lit(1)).as("n")).localCheckpoint(true)
        var pr = deg.crossJoin(broadcast(nF))
          .select(col("src").as("id"), (lit(1.0) / col("n")).as("pr"))
        for (_ <- 1 to 5) {
          pr = ed.join(pr.withColumnRenamed("id", "src"), "src")
            .groupBy(col("dst"))
            .agg(sum(col("pr") / col("dg")).as("mm"))
            .crossJoin(broadcast(nF))
            .select(col("dst").as("id"),
              (lit(0.15) / col("n") + lit(0.85) * col("mm")).as("pr"))
        }
        pr.count()
      }

      // stage 5: triangle enumeration (degree-ordered orientation);
      // wedge volume = Σ C(outdeg, 2) — the join's actual work term
      val deg = pairs.select(col("da").as("id"))
        .union(pairs.select(col("db").as("id")))
        .groupBy("id").agg(count(lit(1)).as("deg")).localCheckpoint(true)
      val ed2 = pairs
        .join(deg.select(col("id").as("da"), col("deg").as("du")), "da")
        .join(deg.select(col("id").as("db"), col("deg").as("dv")), "db")
      val fwd = col("du") < col("dv") ||
        (col("du") === col("dv") && col("da") < col("db"))
      val o = ed2.select(
        when(fwd, col("da")).otherwise(col("db")).as("src"),
        when(fwd, col("db")).otherwise(col("da")).as("dst"),
        when(fwd, col("dv")).otherwise(col("du")).as("dd"))
        .localCheckpoint(true)
      val wedges = o.groupBy("src").agg(count(lit(1)).as("c"))
        .agg(coalesce(sum(expr("c * (c - 1) div 2")), lit(0L))
          .cast("long")).first().getLong(0)
      var tris = 0L
      val (_, tTri) = med3 {
        tris = o.as("x").join(o.as("y"),
            col("x.src") === col("y.src") &&
              (col("x.dd") < col("y.dd") ||
                (col("x.dd") === col("y.dd") &&
                  col("x.dst") < col("y.dst"))))
          .select(col("x.src").as("a"), col("x.dst").as("b"),
            col("y.dst").as("c"))
          .join(o.select(col("src").as("b"), col("dst").as("c")),
            Seq("b", "c"))
          .count()
        tris
      }

      println(f"k=$k%-3d docs=$nDocs%7d edges=$m%8d tEdge=$tEdge%6.2f s  " +
        f"cc=$tCc%6.2f s/$ccRounds rounds  keep=$tKeep%5.2f s  " +
        f"pr5=$tPr%6.2f s  wedges=$wedges%9d tris=$tris%8d " +
        f"tTri=$tTri%5.2f s")
      Row(k, nDocs, m, tEdge, ccRounds, tCc, tKeep, tPr, wedges, tris, tTri)
    }

    val lo = rows.head; val hi = rows.last
    def ex(a: Double, b: Double) =
      math.log(b / a) / math.log(hi.docs.toDouble / lo.docs)
    println(f"exponents docs x${hi.docs / lo.docs}: " +
      f"edges_vol=${ex(lo.edges.toDouble, hi.edges.toDouble)}%.2f " +
      f"edge_t=${ex(lo.tEdge, hi.tEdge)}%.2f " +
      f"cc_t=${ex(lo.tCc, hi.tCc)}%.2f " +
      f"(rounds ${lo.ccRounds}->${hi.ccRounds}) " +
      f"keep_t=${ex(lo.tKeep, hi.tKeep)}%.2f " +
      f"pr_t=${ex(lo.tPr, hi.tPr)}%.2f " +
      f"wedge_vol=${ex(lo.wedges.toDouble, hi.wedges.toDouble)}%.2f " +
      f"tri_t=${ex(lo.tTri, hi.tTri)}%.2f")
    spark.stop()
  }
}
