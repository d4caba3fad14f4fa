package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.{SparkSpec, Tables}
import graft.streaming.CepSql

/** AFTER MATCH SKIP PAST LAST ROW: the linear-scan operator, the
  * recursive-CTE SQL text, and a brute-force greedy reference must all
  * agree — on the fixture table and on adversarial random streams. */
class SkipMatchSpec extends SparkSpec {

  private def us(t: Timestamp): Long =
    t.getTime / 1000 * 1000000L + t.getNanos / 1000

  /** Brute-force greedy skip-past matching over collected rows:
    * (key, id, ts, type) → matched pick ids per match. */
  private def brute(rows: Seq[(Long, Long, Timestamp, String)],
      steps: Seq[Set[String]], withinUs: Long): Seq[(Long, Seq[Long])] = {
    val n = steps.length
    rows.groupBy(_._1).toSeq.flatMap { case (k, rs0) =>
      val rs = rs0.sortBy(r => (us(r._3), r._2))
      val out = Seq.newBuilder[(Long, Seq[Long])]
      var lastTs = Long.MinValue
      var lastId = Long.MinValue
      for (ai <- rs.indices) {
        val a = rs(ai)
        if (steps.head.contains(a._4) &&
            (us(a._3) > lastTs || (us(a._3) == lastTs && a._2 > lastId))) {
          var prevTs = us(a._3)
          val limit = us(a._3) + withinUs
          var picks = List(a)
          var ok = true
          for (j <- 1 until n if ok) {
            rs.filter(e => steps(j).contains(e._4) && us(e._3) > prevTs &&
                us(e._3) <= limit)
              .sortBy(e => (us(e._3), e._2)).headOption match {
              case Some(e) => picks = e :: picks; prevTs = us(e._3)
              case None    => ok = false
            }
          }
          if (ok) {
            val ordered = picks.reverse
            out += ((k, ordered.map(_._2)))
            lastTs = us(ordered.last._3)
            lastId = ordered.last._2
          }
        }
      }
      out.result()
    }.sortBy(_._2.head)
  }

  private def opMatches(df: org.apache.spark.sql.DataFrame, n: Int)
      : Seq[(Long, Seq[Long])] =
    df.collect().map(r =>
      (r.getLong(0), (1 to n).map(i => r.getLong(i)).toSeq)).toSeq

  test("operator == recursive CTE == brute force (2-step, fixture)") {
    Tables.load(spark, sf)
    val text =
      """SELECT * FROM events
         MATCH PATTERN (signup THEN purchase WITHIN '30' MINUTES)
         PARTITION BY user_id
         AFTER MATCH SKIP PAST LAST ROW"""
    val viaOp = CepSql.sql(spark, text) // dispatches to SkipMatch
    val viaCte = spark.sql(CepSql.translate(text))
    assert(viaOp.columns.toSeq === viaCte.columns.toSeq)
    assert(viaOp.collect().map(_.toSeq).toSeq ===
      viaCte.collect().map(_.toSeq).toSeq)
    val rows = Tables.table(spark, sf, "events")
      .select("user_id", "event_id", "ts", "event_type").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getTimestamp(2),
        r.getString(3))).toSeq
    val want = brute(rows, Seq(Set("signup"), Set("purchase")),
      30L * 60 * 1000000L)
    assert(opMatches(viaOp, 2) === want)
    assert(want.nonEmpty)
  }

  test("operator == recursive CTE == brute force (3-step + alternation)") {
    Tables.load(spark, sf)
    val text =
      """SELECT * FROM events
         MATCH PATTERN (signup THEN click|view THEN purchase WITHIN '24' HOURS)
         PARTITION BY user_id
         AFTER MATCH SKIP PAST LAST ROW"""
    val viaOp = CepSql.sql(spark, text)
    val viaCte = spark.sql(CepSql.translate(text))
    assert(viaOp.collect().map(_.toSeq).toSeq ===
      viaCte.collect().map(_.toSeq).toSeq)
    val rows = Tables.table(spark, sf, "events")
      .select("user_id", "event_id", "ts", "event_type").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getTimestamp(2),
        r.getString(3))).toSeq
    val want = brute(rows,
      Seq(Set("signup"), Set("click", "view"), Set("purchase")),
      24L * 3600 * 1000000L)
    assert(opMatches(viaOp, 3) === want)
    assert(want.nonEmpty)
  }

  test("conditioned skip-past: operator == recursive CTE (r7)") {
    Tables.load(spark, sf)
    val text =
      """SELECT * FROM events
         MATCH PATTERN (signup THEN purchase(value > 20) WITHIN '2' HOURS)
         PARTITION BY user_id
         AFTER MATCH SKIP PAST LAST ROW"""
    val viaOp = CepSql.sql(spark, text) // operator evaluates the condition
    val viaCte = spark.sql(CepSql.translate(text))
    assert(viaOp.collect().map(_.toSeq).toSeq ===
      viaCte.collect().map(_.toSeq).toSeq)
    assert(viaOp.count() > 0)
    // the condition must bite vs the unconditioned pattern
    val base = CepSql.sql(spark,
      """SELECT * FROM events
         MATCH PATTERN (signup THEN purchase WITHIN '2' HOURS)
         PARTITION BY user_id
         AFTER MATCH SKIP PAST LAST ROW""").count()
    assert(viaOp.count() <= base)
  }

  test("skip-past consumes: fewer or equal matches than skip-to-next-row") {
    Tables.load(spark, sf)
    val skip = CepSql.sql(spark,
      """SELECT * FROM events
         MATCH PATTERN (click THEN purchase WITHIN '2' HOURS)
         PARTITION BY user_id AFTER MATCH SKIP PAST LAST ROW""").count()
    val next = CepSql.sql(spark,
      """SELECT * FROM events
         MATCH PATTERN (click THEN purchase WITHIN '2' HOURS)
         PARTITION BY user_id""").count()
    assert(skip <= next)
    assert(skip > 0)
  }

  test("random adversarial streams: operator == brute force") {
    val rnd = new scala.util.Random(42)
    val types = Array("a", "b", "c", "x")
    val schema = StructType(Seq(
      StructField("user_id", LongType), StructField("event_id", LongType),
      StructField("ts", TimestampType), StructField("event_type", StringType)))
    for (trial <- 0 until 5) {
      val rows = (0 until 400).map { i =>
        val k = rnd.nextInt(3).toLong
        // coarse ts: many intra-key ties to stress (ts, id) tie-breaks
        val t = new Timestamp(1700000000000L + rnd.nextInt(50) * 1000L)
        (k, i.toLong, t, types(rnd.nextInt(types.length)))
      }
      val df = spark.createDataFrame(
        spark.sparkContext.parallelize(
          rows.map(r => Row(r._1, r._2, r._3, r._4)), 4), schema)
      val steps = Seq(Set("a"), Set("b", "c"))
      val withinMs = 20000L
      val got = opMatches(
        SkipMatch.matchChain(df, steps.map(_.toSeq), withinMs), 2)
      val want = brute(rows, steps, withinMs * 1000L)
      assert(got === want, s"trial $trial")
    }
  }
}
