package graft.tools

import org.apache.spark.sql.SparkSession

import graft.Tables

/** Scratch probe for Spark-4 SQL surface checks (dev-only, not shipped). */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .appName("probe").getOrCreate()
    Tables.load(spark, "/root/testdata/sf0.001")
    val tests = Seq(
      "lateral" ->
        """SELECT t.c, l.x FROM (SELECT DISTINCT o_orderstatus AS c FROM orders) t,
           LATERAL (SELECT o_orderkey AS x FROM orders o WHERE o.o_orderstatus = t.c
                    ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) l LIMIT 5""",
      "gsets" ->
        """SELECT coalesce(l_returnflag,'ALL') rf, coalesce(l_linestatus,'ALL') ls,
                  grouping(l_returnflag) g1, count(*) c
           FROM lineitem GROUP BY GROUPING SETS ((l_returnflag,l_linestatus),(l_returnflag),())
           ORDER BY 1,2 LIMIT 5""",
      "nav" ->
        """SELECT o_orderkey, first_value(o_totalprice) OVER w fv,
                  nth_value(o_totalprice,2) OVER w nv,
                  percent_rank() OVER w pr, cume_dist() OVER w cd
           FROM orders WINDOW w AS (PARTITION BY o_custkey
             ORDER BY o_totalprice DESC, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) LIMIT 3""",
      "filter_agg" ->
        "SELECT count(*) FILTER (WHERE l_discount > 0.05) c FROM lineitem",
      "exists" ->
        """SELECT count(*) FROM orders o WHERE EXISTS
           (SELECT 1 FROM lineitem l WHERE l.l_orderkey=o.o_orderkey AND l.l_quantity>45)""",
      "corr_scalar" ->
        """SELECT count(*) FROM orders o WHERE o_totalprice >
           1.5*(SELECT avg(o_totalprice) FROM orders o2 WHERE o2.o_custkey=o.o_custkey)""",
      "listagg" ->
        """SELECT lang, array_join(array_sort(collect_list(source)), ',') s
           FROM (SELECT DISTINCT lang, source FROM documents) GROUP BY lang ORDER BY lang LIMIT 2""",
      "unpivot_sql" ->
        """SELECT l_orderkey, l_linenumber, name, value FROM
           (SELECT l_orderkey, l_linenumber, l_quantity AS q, l_extendedprice AS p, l_discount AS d FROM lineitem LIMIT 10)
           UNPIVOT (value FOR name IN (q, p, d)) ORDER BY 1,2,3 LIMIT 5"""
    )
    tests.foreach { case (n, q) =>
      try {
        val r = spark.sql(q).collect()
        println(s"$n OK ${r.take(2).mkString(" | ")}")
      } catch { case e: Throwable => println(s"$n FAIL ${e.getMessage.take(200)}") }
    }
    spark.stop()
  }
}
