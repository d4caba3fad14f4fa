package graft.functions

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSpec

class FunctionsSpec extends SparkSpec {
  import spark.implicits._

  private def cosLocal(a: Seq[Double], b: Seq[Double]): Double = {
    val dot = a.zip(b).map { case (x, y) => x * y }.sum
    dot / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
  }

  private def cosSpark(a: Seq[Double], b: Seq[Double]): Double = {
    GraftFunctions.register(spark)
    Seq((a, b)).toDF("a", "b")
      .select(expr("cosine_sim(a, b)").as("cs")).as[Double].head()
  }

  test("cosine_sim matches reference computation on floats from parquet") {
    GraftFunctions.register(spark)
    val e = graft.Tables.table(spark, sf, "embeddings").limit(50).cache()
    val viaExpr = e.as("x").crossJoin(e.as("y"))
      .filter(col("x.vec_id") < col("y.vec_id"))
      .select(col("x.vec_id"), col("y.vec_id"),
        expr("cosine_sim(x.embedding, y.embedding)").as("cs"))
      .as[(Long, Long, Double)].collect()
    val local = e.select("vec_id", "embedding")
      .as[(Long, Array[Float])].collect().toMap
    viaExpr.foreach { case (i, j, cs) =>
      val want = cosLocal(local(i).map(_.toDouble).toSeq,
        local(j).map(_.toDouble).toSeq)
      assert(math.abs(cs - want) < 1e-12, s"pair ($i,$j)")
    }
  }

  private val vecGen: Gen[List[Double]] =
    Gen.listOfN(16, Gen.choose(-10.0, 10.0))
      .suchThat(v => v.exists(x => math.abs(x) > 1e-3))

  test("cosine_sim properties: bounds, symmetry, self-similarity") {
    // scalacheck used directly (scalatestplus bridge isn't resolvable
    // offline): deterministic seeds, 20 cases
    (1 to 20).foreach { i =>
      val a = vecGen.pureApply(Gen.Parameters.default, Seed(i.toLong))
      val b = vecGen.pureApply(Gen.Parameters.default, Seed(i.toLong + 1000))
      val cs = cosSpark(a, b)
      assert(cs >= -1.0 - 1e-9 && cs <= 1.0 + 1e-9)
      assert(math.abs(cs - cosSpark(b, a)) < 1e-12)
      assert(math.abs(cosSpark(a, a) - 1.0) < 1e-9)
    }
  }

  test("mixed-type kernels: int8 codes score directly, scale cancels (r7)") {
    GraftFunctions.register(spark)
    val e = graft.Tables.table(spark, sf, "embeddings").limit(50)
    val q = graft.operators.Similarity.quantizeInt8(e, "embedding")
      .select(col("vec_id"), col("embedding"), col("codes"), col("scale"),
        graft.operators.Similarity.dequantizeInt8("codes", "scale")
          .as("recon"))
    // tinyint × float: codes against the raw float query — accepted and
    // EQUAL (1e-9) to the reconstruction's cosine: the per-vector scale
    // cancels in dot/(|a||b|), so the no-dequantize path is exact
    val both = q.as("x").crossJoin(q.as("y"))
      .filter(col("x.vec_id") < col("y.vec_id")).limit(200)
      .select(
        expr("cosine_sim(x.codes, y.embedding)").as("direct"),
        expr("cosine_sim(x.recon, y.embedding)").as("recon_cs"))
      .as[(Double, Double)].collect()
    assert(both.nonEmpty)
    both.foreach { case (d, r) =>
      assert(math.abs(d - r) < 1e-9, s"direct $d vs recon $r")
    }
    // tinyint × tinyint: code-vs-code cosine equals the float cosine of
    // the reconstructions (both scales cancel)
    val cc = q.as("x").crossJoin(q.as("y"))
      .filter(col("x.vec_id") < col("y.vec_id")).limit(200)
      .select(expr("cosine_sim(x.codes, y.codes)").as("d"),
        expr("cosine_sim(x.recon, y.recon)").as("r"))
      .as[(Double, Double)].collect()
    cc.foreach { case (d, r) =>
      assert(math.abs(d - r) < 1e-9, s"code-code $d vs recon-recon $r")
    }
    // non-numeric arrays are still rejected loudly
    val err = intercept[Exception] {
      Seq((Seq("a"), Seq(1.0))).toDF("a", "b")
        .select(expr("cosine_sim(a, b)")).collect()
    }
    assert(err.getMessage.contains("cosine_sim"))
  }

  test("dot_product and l2_distance kernels match reference math") {
    GraftFunctions.register(spark)
    val df = Seq((Seq(1.0f, 2.0f, 2.0f), Seq(3.0f, 0.0f, 4.0f)))
      .toDF("a", "b")
    val row = df.select(
      expr("dot_product(a, b)").as("dp"),
      expr("l2_distance(a, b)").as("l2"),
      expr("l2_distance(a, a)").as("self")).head()
    assert(row.getDouble(0) == 11.0)  // 1*3 + 2*0 + 2*4
    assert(math.abs(row.getDouble(1) - math.sqrt(12.0)) < 1e-12) // diff (-2,2,-2)
    assert(row.getDouble(2) == 0.0)
  }

  test("MinHashAgg: identical shingle sets give identical signatures") {
    val agg = new MinHashAgg(64)
    val s1 = Seq("a b c", "b c d", "c d e").foldLeft(agg.zero)(agg.reduce)
    val s2 = Seq("c d e", "a b c", "b c d").foldLeft(agg.zero)(agg.reduce)
    assert(s1.sameElements(s2), "order-insensitive")
    assert(MinHashAgg.estimate(s1, s2) == 1.0)
  }

  test("MinHashAgg: merge is the same as combined reduce (partial agg law)") {
    val agg = new MinHashAgg(32)
    val xs = (1 to 20).map(i => s"sh$i")
    val whole = xs.foldLeft(agg.zero)(agg.reduce)
    val (l, r) = xs.splitAt(7)
    val merged = agg.merge(l.foldLeft(agg.zero)(agg.reduce),
      r.foldLeft(agg.zero)(agg.reduce))
    assert(whole.sameElements(merged))
  }

  test("MinHashAgg: estimate approximates true Jaccard") {
    val agg = new MinHashAgg(256)
    val a = (1 to 100).map(i => s"g$i")
    val b = (51 to 150).map(i => s"g$i") // true jaccard = 50/150 = 1/3
    val est = MinHashAgg.estimate(
      a.foldLeft(agg.zero)(agg.reduce), b.foldLeft(agg.zero)(agg.reduce))
    assert(math.abs(est - 1.0 / 3.0) < 0.12, s"estimate $est")
  }

  test("MinHashAgg works as a Spark UDAF end-to-end") {
    val sig = udaf(new MinHashAgg(16))
    val out = Seq(("d1", "a b"), ("d1", "b c"), ("d2", "a b"), ("d2", "b c"))
      .toDF("doc", "gram")
      .groupBy("doc").agg(sig(col("gram")).as("sig"))
      .as[(String, Array[Long])].collect().toMap
    assert(out("d1").sameElements(out("d2")))
    assert(out("d1").length == 16)
  }

  test("VecMomentsAgg: partition-count invariant; diagonal == var_pop; " +
      "cov derives symmetric (r11)") {
    val d = 64
    val e = graft.Tables.table(spark, sf, "embeddings")
    val agg = udaf(new VecMomentsAgg(d))
    val m1 = e.coalesce(1).agg(agg(col("embedding")).as("m"))
      .as[Array[Double]].head()
    val m8 = e.repartition(8).agg(agg(col("embedding")).as("m"))
      .as[Array[Double]].head()
    assert(m1.length === d * d + d + 1)
    // merge law: 1-partition and 8-partition runs agree to fp noise
    (0 until m1.length).foreach { k =>
      assert(math.abs(m1(k) - m8(k)) < 1e-6,
        s"buffer slot $k diverges across partitionings")
    }
    val n = m1(d * d + d)
    assert(n > 0)
    def cov(i: Int, j: Int): Double =
      m1(i * d + j) / n - (m1(d * d + i) / n) * (m1(d * d + j) / n)
    // diagonal == Spark's own population variance per coordinate
    for (i <- Seq(0, 17, 63)) {
      val v = e.select(var_pop(col("embedding")(i).cast("double")))
        .as[Double].head()
      assert(math.abs(cov(i, i) - v) < 1e-9,
        s"cov($i,$i)=${cov(i, i)} != var_pop $v")
    }
    // Gram sums are symmetric by construction
    for (i <- Seq(1, 30); j <- Seq(5, 40))
      assert(m1(i * d + j) === m1(j * d + i))
  }

  test("VecMomentsAgg streams: sharded update-mode aggregation merges " +
      "to the batch buffer exactly (r11)") {
    // Unlike Misra-Gries, the moment buffer's merge is EXACT
    // (element-wise add, commutative + associative), so the streaming
    // shard-and-merge form equals batch bit-for-bit up to summation
    // order: shard by vec_id, run the aggregator as a streaming
    // groupBy(shard) in update mode, add the shard buffers at read.
    // State per shard is one constant-size buffer — stream-length-free.
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sq = spark.sqlContext
    val d = 64
    val e = graft.Tables.table(spark, sf, "embeddings")
    val agg = udaf(new VecMomentsAgg(d))
    val batch = e.agg(agg(col("embedding")).as("m"))
      .as[Array[Double]].head()
    val rows = e.select(col("vec_id"), col("embedding"))
      .as[(Long, Seq[Float])].collect().toSeq
    val stream = MemoryStream[(Long, Seq[Float])]
    val latest = scala.collection.mutable.Map[Long, Array[Double]]()
    val q = stream.toDF().toDF("vec_id", "embedding")
      .withColumn("shard", pmod(col("vec_id"), lit(4L)))
      .groupBy("shard")
      .agg(agg(col("embedding")).as("m"))
      .as[(Long, Array[Double])]
      .writeStream.outputMode("update")
      .foreachBatch(
        (b: org.apache.spark.sql.Dataset[(Long, Array[Double])],
            _: Long) =>
          b.collect().foreach { case (sh, m) => latest(sh) = m })
      .start()
    rows.grouped(rows.size / 3 + 1).foreach { c =>
      stream.addData(c); q.processAllAvailable()
    }
    q.stop()
    assert(latest.size === 4)
    val merged = latest.values.reduce { (a, b) =>
      a.zip(b).map { case (x, y) => x + y }
    }
    (0 until d * d + d + 1).foreach { k =>
      assert(math.abs(merged(k) - batch(k)) < 1e-6,
        s"slot $k: streaming $merged($k) != batch ${batch(k)}")
    }
  }
}
