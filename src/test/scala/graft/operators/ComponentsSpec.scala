package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class ComponentsSpec extends SparkSpec {
  import spark.implicits._

  test("connected components: chains, cliques, disjoint pairs") {
    // 1-2-3-4 chain, {10,11,12} clique, isolated pair 20-21
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L), (11L, 12L),
      (10L, 12L), (20L, 21L)).toDF("src", "dst")
    val got = Components.connectedComponents(edges)
      .as[(Long, Long)].collect().toMap
    assert(Seq(1L, 2L, 3L, 4L).forall(got(_) == 1L))
    assert(Seq(10L, 11L, 12L).forall(got(_) == 10L))
    assert(Seq(20L, 21L).forall(got(_) == 20L))
    assert(got.size == 9)
  }

  test("long chain converges within diameter rounds") {
    val n = 30
    val edges = (1 until n).map(i => (i.toLong, (i + 1).toLong))
      .toDF("src", "dst")
    val got = Components.connectedComponents(edges)
      .as[(Long, Long)].collect().toMap
    assert((1 to n).forall(i => got(i.toLong) == 1L))
  }

  test("end-to-end dedup: LSH pairs on planted dups -> keeper resolution") {
    val docs = Tables.table(spark, sf, "documents")
    val planted = docs.limit(10)
      .union(docs.limit(4).withColumn("doc_id", col("doc_id") + 100000))
      .union(docs.limit(2).withColumn("doc_id", col("doc_id") + 200000))
    val pairs = Dedup.minhashLsh(planted, "doc_id", "text")
      .select("id_a", "id_b")
    val verdicts = Components.resolveDuplicates(pairs)
      .as[(Long, Long)].collect().toMap
    val originals = docs.orderBy("doc_id").limit(4)
      .select("doc_id").as[Long].collect()
    // each planted copy resolves to its original as keeper
    originals.take(4).foreach { id =>
      assert(verdicts(id + 100000) == id, s"copy of $id -> ${verdicts.get(id + 100000)}")
    }
    originals.take(2).foreach { id =>
      assert(verdicts(id + 200000) == id)
    }
  }
}
