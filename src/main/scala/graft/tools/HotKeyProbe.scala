package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.TemporalJoins

/** Dev-only probe: as-of join under a pathological hot key — EVERY row on
  * one key. The theta formulation would materialize n_left × n_right
  * pairs (4×10^10 at n=200k — unrunnable); the carry formulation is one
  * shuffle + one sort regardless. Numbers recorded in SCALE.md. */
object HotKeyProbe {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(200000)
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val left = spark.range(n).select(
      $"id".as("err_id"), lit(7L).as("user_id"),
      timestamp_micros($"id" * 1000000L + 500000L).as("err_ts"))
    val right = spark.range(n).select(
      ($"id" + 1000000L).as("click_id"), lit(7L).as("user_id"),
      timestamp_micros($"id" * 1000000L).as("click_ts"))
    def carry() = TemporalJoins.asofJoinBackwardCarry(left, right,
      Seq("user_id"), "err_ts", "click_ts", "click_id")
    carry().count() // warm
    val t0 = System.nanoTime()
    val cnt = carry().count()
    val dt = (System.nanoTime() - t0) / 1e9
    // correctness spot check: row i matches click at second i exactly
    val sample = carry().filter($"err_id".isin(0L, n / 2L, n - 1L))
      .select("err_id", "click_id").as[(Long, Long)].collect().toMap
    val ok = sample.forall { case (l, r) => r == l + 1000000L }
    println(f"carry as-of: n=$n%d x $n%d on ONE key -> $cnt%d rows in " +
      f"$dt%.2f s (theta pairs would be ${n.toLong * n}%,d); sample ok=$ok")

    // NEAREST as-of under the same hot key (r8): the ±tolerance band is
    // the candidate bound — with a 5 s band each left row pairs with
    // ~10 right rows instead of all n, so the theta join stays linear
    def near(tolUs: Long) = TemporalJoins.asofJoinNearest(left, right,
      Seq("user_id"), "err_id", "err_ts", "click_ts", "click_id", tolUs)
    near(5000000L).count() // warm
    val t1 = System.nanoTime()
    val cnt2 = near(5000000L).count()
    val dt2 = (System.nanoTime() - t1) / 1e9
    // row i's nearest click (at i.5 s) is click at second i+1? No:
    // |i.5 - i| = |i.5 - (i+1)| = 0.5 s — a tie, broken to the EARLIER
    val sample2 = near(5000000L)
      .filter($"err_id".isin(0L, n / 2L, n - 1L))
      .select("err_id", "click_id").as[(Long, Long)].collect().toMap
    val ok2 = sample2.forall { case (l, r) => r == l + 1000000L }
    println(f"nearest as-of (5 s band): n=$n%d x $n%d on ONE key -> " +
      f"$cnt2%d rows in $dt2%.2f s; tie-to-earlier ok=$ok2")
    spark.stop()
  }
}
