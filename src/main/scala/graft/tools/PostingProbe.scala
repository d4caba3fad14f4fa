package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** r11 verdict #1 measurement: the df-ceiling curve for posting-list
  * pair generation under ONE hot gram. Fixture: n docs ALL sharing a
  * single gram (the boilerplate-sentence case containment exists to
  * catch) plus 8 unique grams each; n steps 2048 → 32768 (×16).
  * Uncapped, the hot posting explodes to n(n−1)/2 pairs — Θ(n²);
  * with [[graft.operators.Postings.pairCounts]]'s ceiling the hot list
  * is dropped before the explode, pair volume from it is ZERO and
  * runtime must track the LINEAR posting mass (target exponent <= 1.1,
  * SCALE.md "posting df ceiling"). The uncapped contrast runs at the
  * two smaller n only (the 32k uncapped explode is ~537M pairs — the
  * blow-up is the point, not a thing to wait on). */
object PostingProbe {
  private def med3(f: => Long): (Long, Double) = {
    f // warm-up
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

    def fixture(n: Int): DataFrame = {
      val d = spark.range(n)
      d.select(col("id").as("doc_id"), lit("HOT GRAM ALL SHARE").as("gram"))
        .unionAll(d.select(col("id").as("doc_id"),
          explode(expr("transform(sequence(0, 7), " +
            "j -> concat('u_', id, '_', j))")).as("gram")))
        .localCheckpoint(true)
    }

    println("== capped (maxDf=128): ONE hot gram, n stepped x16 ==")
    val rows = Seq(2048, 8192, 32768).map { n =>
      val rowsDf = fixture(n)
      val (pairs, t) = med3(graft.operators.Postings.pairCounts(
        graft.operators.Postings.postingLists(rowsDf, Seq("gram")), 128)
        .count())
      println(f"n=$n%6d capped pairs=$pairs%12d t=$t%6.2f s")
      (n, t)
    }
    val e = math.log(rows.last._2 / rows.head._2) /
      math.log(rows.last._1.toDouble / rows.head._1)
    println(f"capped time exponent n=2048->32768: $e%.2f (target <= 1.1)")

    println("== uncapped contrast (maxDf=MaxValue) ==")
    Seq(2048, 8192).foreach { n =>
      val rowsDf = fixture(n)
      val (pairs, t) = med3(graft.operators.Postings.pairCounts(
        graft.operators.Postings.postingLists(rowsDf, Seq("gram")),
        Int.MaxValue).count())
      println(f"n=$n%6d UNCAPPED pairs=$pairs%12d t=$t%6.2f s " +
        f"(hot gram alone = ${n.toLong * (n - 1) / 2}%d)")
    }
    spark.stop()
  }
}
