package graft.operators

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

class BloomPruneSpec extends SparkSpec {
  test("prefilter keeps a superset of matches; exact join restores parity") {
    val cust = Tables.table(spark, sf, "customer")
      .filter(col("c_mktsegment") === "BUILDING")
      .select("c_custkey")
    val orders = Tables.table(spark, sf, "orders")
      .select("o_orderkey", "o_custkey")
    val pruned = BloomPrune.prefilter(orders, "o_custkey", cust,
      "c_custkey", 10000L)
    val total = orders.count()
    val kept = pruned.count()
    val trueMatches = orders.join(cust,
      orders("o_custkey") === cust("c_custkey"), "left_semi")
    val nTrue = trueMatches.count()
    // superset of the true semi join, and actually selective (the bloom
    // at this size has a tiny fp rate; BUILDING is ~1/5 of customers)
    assert(kept >= nTrue, "bloom must never drop a real match")
    assert(kept < total, "bloom must drop non-candidates")
    val prunedKeys = pruned.select("o_orderkey").collect()
      .map(_.getLong(0)).toSet
    val trueKeys = trueMatches.select("o_orderkey").collect()
      .map(_.getLong(0)).toSet
    assert(trueKeys.subsetOf(prunedKeys))
    // exact join after the prefilter == plain join (what q_join_bloom's
    // DuckDB oracle checks end-to-end at sf0.01)
    val viaBloom = pruned.join(cust,
        pruned("o_custkey") === cust("c_custkey"))
      .select("o_orderkey").collect().map(_.getLong(0)).toSet
    assert(viaBloom === trueKeys)
  }

  test("prefilter rejects a non-positive expectedItems loudly") {
    val df = Tables.table(spark, sf, "orders")
    intercept[IllegalArgumentException] {
      BloomPrune.prefilter(df, "o_custkey", df, "o_custkey", 0L)
    }
  }

  test("prefilter rejects mismatched key types loudly (xxhash64 hazard)") {
    // an INT dim key against a BIGINT fact key would build and probe
    // disjoint hash spaces — every real match silently dropped; the
    // operator must fail loudly instead
    val orders = Tables.table(spark, sf, "orders")
    val dimInt = Tables.table(spark, sf, "customer")
      .select(col("c_custkey").cast("int").as("c_custkey"))
    val e = intercept[IllegalArgumentException] {
      BloomPrune.prefilter(orders, "o_custkey", dimInt, "c_custkey", 100L)
    }
    assert(e.getMessage.contains("types must match"))
  }
}
