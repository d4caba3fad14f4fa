package graft.operators

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** Misra–Gries sketch guarantees (FreqSketch). The sketch's counter
  * values are merge-order-dependent, so there is no value oracle —
  * these tests pin the mathematical guarantees that hold under ANY
  * partitioning: heavy-hitter recall and the N/(k+1) undercount bound.
  */
class FreqSketchSpec extends SparkSpec {
  import spark.implicits._

  private lazy val tokens = Tables.table(spark, sf, "documents")
    .select(explode(split(lower(col("text")), " ")).as("w"))
    .as[String]

  test("every item with freq > N/(k+1) survives; counts undercount by " +
      "at most N/(k+1)") {
    val k = 16
    val exact = tokens.groupByKey(identity).count().collect().toMap
    val n = exact.values.sum
    val bound = n / (k + 1)
    val sketch = tokens.toDF("w")
      .agg(FreqSketch.mgSketch(k)(col("w")).as("sk"))
      .as[Map[String, Long]].head()
    assert(sketch.size <= k)
    // recall: all true heavy hitters are in the sketch
    exact.filter(_._2 > bound).keys.foreach { w =>
      assert(sketch.contains(w), s"heavy hitter '$w' missing from sketch")
    }
    // error bound: sketch count in [exact - N/(k+1), exact]
    sketch.foreach { case (w, c) =>
      val e = exact(w)
      assert(c <= e, s"'$w': sketch $c overcounts exact $e")
      assert(c >= e - bound, s"'$w': sketch $c undercounts $e beyond $bound")
    }
  }

  test("sketch is partitioning-insensitive in its guarantee (1 vs 8 " +
      "partitions)") {
    val k = 8
    val exact = tokens.groupByKey(identity).count().collect().toMap
    val n = exact.values.sum
    val heavy = exact.filter(_._2 > n / (k + 1)).keySet
    for (parts <- Seq(1, 8)) {
      val sk = tokens.repartition(parts).toDF("w")
        .agg(FreqSketch.mgSketch(k)(col("w")).as("sk"))
        .as[Map[String, Long]].head()
      assert(heavy.subsetOf(sk.keySet),
        s"$parts partitions: guarantee broken")
    }
  }

  test("q_heavy_hitters exact key: shares cross-check, sketch superset") {
    val rows = graft.SparkEntry.queries("q_heavy_hitters")(spark, sf)
      .collect()
    val exact = tokens.groupByKey(identity).count().collect().toMap
    val n = exact.values.sum
    // the key's predicate is cnt * 200 > total — recompute independently
    val want = exact.filter { case (_, c) => c * 200 > n }
    assert(rows.length === want.size)
    rows.foreach { r =>
      assert(want(r.getString(0)) === r.getLong(1))
    }
    // a k=256 sketch must contain every exact 0.5% heavy hitter
    // (0.5% of N > N/257 at any N)
    val sk = tokens.toDF("w")
      .agg(FreqSketch.mgSketch(256)(col("w")).as("sk"))
      .as[Map[String, Long]].head()
    want.keys.foreach(w => assert(sk.contains(w)))
  }
}
