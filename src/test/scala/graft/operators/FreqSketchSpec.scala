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

  test("streaming sharded MG: bounded per-shard state across batches; " +
      "disjoint-shard union keeps the guarantee (r11)") {
    // The 100 TB streaming form of heavy hitters: shard by TOKEN HASH so
    // each summary owns a disjoint vocabulary slice (an item's whole
    // mass lives in exactly one shard — no cross-shard undercount
    // stacking), run the same Aggregator as a streaming aggregation in
    // update mode (state = one <= k-counter map per shard, bounded
    // regardless of stream length), and union the shard summaries at
    // read. Global guarantee survives: a shard's bound n_s/(k+1) is at
    // most the global n/(k+1).
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sq = spark.sqlContext
    val k = 16
    val all = tokens.collect().toSeq
    val exact = all.groupBy(identity).map { case (w, g) =>
      (w, g.size.toLong) }
    val n = all.size.toLong
    val bound = n / (k + 1)
    val stream = MemoryStream[String]
    val latest = scala.collection.mutable.Map[Int, Map[String, Long]]()
    val q = stream.toDS()
      .select(col("value").as("w"),
        pmod(xxhash64(col("value")), lit(8)).cast("int").as("shard"))
      .groupBy("shard")
      .agg(FreqSketch.mgSketch(k)(col("w")).as("sk"))
      .as[(Int, Map[String, Long])]
      .writeStream.outputMode("update")
      .foreachBatch(
        (b: org.apache.spark.sql.Dataset[(Int, Map[String, Long])],
            _: Long) =>
          b.collect().foreach { case (sh, m) => latest(sh) = m })
      .start()
    all.grouped(all.size / 3 + 1).foreach { c =>
      stream.addData(c); q.processAllAvailable()
    }
    q.stop()
    // bounded state: every shard summary holds at most k counters
    latest.values.foreach(m => assert(m.size <= k))
    // shards partition the vocabulary — the union is disjoint
    val merged = latest.values.foldLeft(Map.empty[String, Long])(_ ++ _)
    assert(merged.size === latest.values.map(_.size).sum)
    // recall + error bound at the GLOBAL bound, post-union
    exact.filter(_._2 > bound).keys.foreach { w =>
      assert(merged.contains(w), s"heavy hitter '$w' missing post-union")
    }
    merged.foreach { case (w, c) =>
      val e = exact(w)
      assert(c <= e, s"'$w': streaming sketch $c overcounts exact $e")
      assert(c >= e - bound, s"'$w': undercounts $e beyond $bound")
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
