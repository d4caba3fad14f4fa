package graft

import org.apache.spark.sql.functions._

/** Statistical-aggregate surface (Stats.scala). The DuckDB oracle gate
  * proves cross-engine value equality; these pin semantic invariants
  * against independent formulations.
  */
class StatsSpec extends SparkSpec {

  private def run(key: String) =
    SparkEntry.queries(key)(spark, sf)

  test("q_stats_agg moments agree with first-principles formulas") {
    val li = Tables.table(spark, sf, "lineitem")
    // var_pop(x) = E[x^2] - E[x]^2 computed independently per group
    val byHand = li.groupBy("l_returnflag").agg(
      (avg(col("l_discount") * col("l_discount")) -
        avg(col("l_discount")) * avg(col("l_discount"))).as("v"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    run("q_stats_agg").collect().foreach { r =>
      val v = r.getAs[Double]("var_disc")
      assert(math.abs(v - byHand(r.getString(0))) < 1e-6)
    }
  }

  test("q_stats_agg correlation is within [-1, 1] and median is a value bound") {
    run("q_stats_agg").collect().foreach { r =>
      val c = r.getAs[Double]("corr_qp")
      assert(c >= -1.0 && c <= 1.0)
      val m = r.getAs[Double]("med_qty")
      assert(m >= 1.0 && m <= 50.0) // l_quantity domain
    }
  }

  test("q_regr_agg slope/intercept reproduce the group means") {
    // The fitted line passes through (avgx, avgy): icept = avgy - slope*avgx
    run("q_regr_agg").collect().foreach { r =>
      val lhs = r.getAs[Double]("icept")
      val rhs = r.getAs[Double]("avgy") -
        r.getAs[Double]("slope") * r.getAs[Double]("avgx")
      assert(math.abs(lhs - rhs) < 0.05, s"icept $lhs vs avgy-slope*avgx $rhs")
    }
  }

  test("q_bool_agg matches filter-count formulations") {
    val li = Tables.table(spark, sf, "lineitem")
    val counts = li.groupBy("l_returnflag").agg(
      sum(when(col("l_discount") > 0.1, 1).otherwise(0)).as("n_hi_disc"),
      sum(when(col("l_quantity") > 49, 1).otherwise(0)).as("n_big"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    run("q_bool_agg").collect().foreach { r =>
      val (nHiDisc, nBig) = counts(r.getString(0))
      assert(r.getAs[Boolean]("all_low_disc") === (nHiDisc == 0L))
      assert(r.getAs[Boolean]("any_big_qty") === (nBig > 0L))
    }
  }

  test("q_bool_agg max_by returns the orderkey of the priciest line") {
    val li = Tables.table(spark, sf, "lineitem")
    val expect = li.join(
      li.groupBy("l_returnflag").agg(max("l_extendedprice").as("m")),
      Seq("l_returnflag"))
      .filter(col("l_extendedprice") === col("m"))
      .select("l_returnflag", "l_orderkey")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    run("q_bool_agg").collect().foreach { r =>
      assert(r.getAs[Long]("top_price_order") === expect(r.getString(0)))
    }
  }

  test("q_order_nulls pages rows 100-149 with nulls ranked first") {
    val all = Tables.table(spark, sf, "orders")
      .select(col("o_orderkey"),
        when(col("o_orderstatus") === "O", lit(null).cast("double"))
          .otherwise(col("o_totalprice")).as("tp"))
      .orderBy(desc_nulls_first("tp"), asc("o_orderkey"))
      .limit(150).collect()
    val got = run("q_order_nulls").collect()
    assert(got.length === 50)
    assert(got.map(_.getLong(0)).toSeq === all.drop(100).map(_.getLong(0)).toSeq)
    // nulls really do sort first: if any page row is null, all earlier are
    val nullFlags = all.map(_.isNullAt(1))
    val lastNull = nullFlags.lastIndexOf(true)
    if (lastNull >= 0) assert(nullFlags.take(lastNull).forall(identity))
  }

  test("approx_percentile rank error within the declared accuracy of " +
      "the exact key (quantile-sketch scale path, r10)") {
    // the q_percentile exact key is what the oracle checks; at 100 TB a
    // profiler swaps percentile() for approx_percentile (Greenwald-
    // Khanna-style sketch, one pass, mergeable). Pin the swap's honest
    // contract — a RANK error bound, not a value bound: with accuracy
    // B, the returned value's rank is within n/B of the target rank.
    import org.apache.spark.sql.functions._
    val acc = 100
    val li = Tables.table(spark, sf, "lineitem")
    val flags = li.select("l_returnflag").distinct()
      .collect().map(_.getString(0))
    val approx = li.groupBy("l_returnflag")
      .agg(expr(s"approx_percentile(l_quantity, array(0.5, 0.9), $acc)")
        .as("ap"), count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) ->
        ((r.getSeq[Double](1), r.getLong(2)))).toMap
    assert(flags.nonEmpty)
    flags.foreach { f =>
      val (aps, n) = approx(f)
      for ((q, av) <- Seq(0.5, 0.9).zip(aps)) {
        val rank = li.filter(col("l_returnflag") === f &&
          col("l_quantity") <= av).count()
        val target = q * n
        val bound = n.toDouble / acc + 1
        assert(math.abs(rank - target) <= bound,
          s"flag $f q=$q: rank $rank vs target $target exceeds n/B=$bound")
      }
    }
  }

  test("CUSUM prefix-sum identity == direct recursion on generated " +
      "series (r12 property)") {
    // the q_cusum windows compute s_t = P_t - min(0, min_{i<=t} P_i);
    // the definition is s_t = max(0, s_{t-1} + d_t). Prove equality on
    // arbitrary integer drift series (the key's exact 1e-4-unit longs)
    val rnd = new scala.util.Random(41)
    (1 to 200).foreach { trial =>
      val n = 1 + rnd.nextInt(60)
      val d = Array.fill(n)((rnd.nextInt(2001) - 1000).toLong)
      var sRec = 0L
      var p = 0L
      var minP = 0L
      d.zipWithIndex.foreach { case (di, i) =>
        sRec = math.max(0L, sRec + di)
        p += di
        minP = math.min(minP, p)
        val sIdent = p - math.min(0L, minP)
        assert(sIdent == sRec,
          s"trial $trial step $i: identity $sIdent != recursion $sRec")
      }
    }
  }
}
