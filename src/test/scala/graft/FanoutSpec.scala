package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** `Tables.fanout` cluster-scale identity (VERDICT r14 #9): the r14
  * argument was that when a scan already yields at least
  * `spark.sql.shuffle.partitions` partitions — the normal case on a real
  * multi-file table — fanout adds NO shuffle and the text keys' plans and
  * results are unchanged. That claim was argued, not tested. This spec
  * writes the sf0.01 documents table as a 16-file parquet directory,
  * forces ≥16 scan partitions, and pins both halves: no
  * REPARTITION_BY_COL in the plan, and results identical to the
  * single-file fixture.
  */
class FanoutSpec extends SparkSpec {
  test("fanout is the identity on a multi-file scan, results unchanged") {
    val sf001 = "/root/testdata/sf0.01"
    val tmp = Files.createTempDirectory("graft_multifile").toString
    Tables.table(spark, sf001, "documents")
      .repartition(16)
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val prevMax = spark.conf.get("spark.sql.files.maxPartitionBytes")
    try {
      // 1 MB splits: every file (openCost 4 MB each) gets its own scan
      // partition, so the scan parallelism is ≥ 16 > shuffle partitions
      // (4 in tests) and the fanout condition is FALSE by construction
      spark.conf.set("spark.sql.files.maxPartitionBytes", "1m")
      val multi = Tables.table(spark, tmp, "documents")
      // operator-level identity: fanout returns the input frame itself
      assert(Tables.fanout(multi, "doc_id") eq multi,
        "fanout must be the identity when the scan is already parallel")
      // end-to-end on a declared text key: same plan shape minus the
      // fan-out exchange, same rows
      val fromMulti = SparkEntry.queries("q_doc_fingerprint")(spark, tmp)
      val plan = fromMulti.queryExecution.executedPlan.toString()
      assert(!plan.contains("REPARTITION_BY_COL"),
        s"multi-file scan must not add a fan-out exchange:\n$plan")
      val expected = SparkEntry.queries("q_doc_fingerprint")(spark, sf001)
        .collect().map(_.toString).toSeq
      val got = fromMulti.collect().map(_.toString).toSeq
      assert(got == expected,
        "multi-file layout must not change the computed result")
    } finally {
      spark.conf.set("spark.sql.files.maxPartitionBytes", prevMax)
      Caching.releaseAll()
    }
  }
}
