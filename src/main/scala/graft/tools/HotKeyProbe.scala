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

    // Last-touch attribution under the same hot key (r10): the r9
    // formulation (user-equi join + 7-day band residual + rank-1) IS the
    // theta shape measured quadratic above — a bot user's purchases ×
    // touches explode before rank-1 prunes (2×10^10 pairs at n=200k,
    // everything inside the lookback). The q_attribution rewrite rides
    // the STRICT backward carry + a post-carry lookback filter: one
    // shuffle + one sort, zero pairs, any key size.
    def attr() = {
      val pur = left.select($"err_id".as("p_id"), $"user_id",
        $"err_ts".as("p_ts"), lit(1.0).as("p_val"))
      val tou = right.select($"click_id".as("t_id"), $"user_id",
        $"click_ts".as("t_ts"), lit("click").as("touch_raw"))
      TemporalJoins.asofJoinBackwardCarry(pur, tou, Seq("user_id"),
          "p_ts", "t_ts", "t_id", strict = true)
        .groupBy(coalesce(
            when($"t_ts" >= $"p_ts" - expr("INTERVAL 7 DAYS"),
              $"touch_raw"),
            lit("unattributed")).as("touch"))
        .agg(count(lit(1)).as("n_purchases"))
    }
    attr().collect() // warm
    val t2 = System.nanoTime()
    val rows = attr().collect()
    val dt3 = (System.nanoTime() - t2) / 1e9
    // every purchase at second i+0.5 has a click at second i before it;
    // the first n-7*86400 purchases are outside the 7-day lookback only
    // if the span exceeds 7 days (at n=200k the span is 2.3 days → all
    // attributed)
    val attributed = rows.collectFirst {
      case r if r.getString(0) == "click" => r.getLong(1) }.getOrElse(0L)
    println(f"attribution (strict carry): n=$n%d x $n%d on ONE key -> " +
      f"$attributed%d attributed in $dt3%.2f s (r9 band-join pairs " +
      f"would be ${n.toLong * n / 2}%,d)")
    spark.stop()
  }
}
