package graft.operators

import graft.{SparkSpec, Tables}

class SkewSpec extends SparkSpec {
  test("saltedEquiJoin returns exactly the plain-join result") {
    val o = Tables.table(spark, sf, "orders")
      .select("o_orderkey", "o_custkey", "o_totalprice")
    val c = Tables.table(spark, sf, "customer")
      .select("c_custkey", "c_name")
    val plain = o.join(c, o("o_custkey") === c("c_custkey"))
      .select("o_orderkey", "c_name")
      .collect().map(_.toSeq).toSet
    val salted = Skew.saltedEquiJoin(
        o.withColumnRenamed("o_custkey", "k"),
        c.withColumnRenamed("c_custkey", "k"), "k", 8)
      .select("o_orderkey", "c_name")
      .collect().map(_.toSeq).toSet
    assert(salted == plain && salted.nonEmpty)
  }
}
