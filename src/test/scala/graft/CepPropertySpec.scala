package graft

import java.sql.Timestamp

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** SURVEY §5.2.4: the CEP sequence formulation must match a naive O(n²)
  * oracle on arbitrary generated event logs — not just on the shipped
  * testdata. The naive oracle is 15 lines of local Scala; the system
  * under test is the exact DataFrame formulation behind `q_cep_seq`. */
class CepPropertySpec extends SparkSpec {
  import spark.implicits._

  private val WITHIN_MS = 10L * 60 * 1000

  private case class Ev(id: Long, tsMs: Long, user: Long, typ: String)

  private val logGen: Gen[List[Ev]] = for {
    n <- Gen.choose(5, 80)
    evs <- Gen.listOfN(n, for {
      t <- Gen.choose(0L, 2L * 3600 * 1000) // 2 hours
      u <- Gen.choose(0L, 2L)
      ty <- Gen.oneOf("signup", "purchase", "click")
    } yield (t, u, ty))
  } yield evs.zipWithIndex.map { case ((t, u, ty), i) => Ev(i.toLong, t, u, ty) }

  /** Naive O(n²): for each signup, the first purchase (ts, id)-ordered
    * with 0 < p.ts - s.ts <= within, same user. */
  private def naive(log: List[Ev]): Set[(Long, Long)] =
    log.filter(_.typ == "signup").flatMap { s =>
      log.filter(p => p.typ == "purchase" && p.user == s.user &&
          p.tsMs > s.tsMs && p.tsMs <= s.tsMs + WITHIN_MS)
        .sortBy(p => (p.tsMs, p.id))
        .headOption.map(p => (s.id, p.id))
    }.toSet

  test("q_cep_seq formulation == naive O(n²) oracle on generated logs") {
    (1 to 10).foreach { seedI =>
      val log = logGen.pureApply(Gen.Parameters.default, Seed(seedI.toLong))
      val df = log.map(e => (e.id, new Timestamp(e.tsMs), e.user, e.typ))
        .toDF("event_id", "ts", "user_id", "event_type")
      val a = df.filter(col("event_type") === "signup")
        .select(col("event_id").as("sid"), col("user_id"),
          col("ts").as("s_ts"))
      val b = df.filter(col("event_type") === "purchase")
        .select(col("event_id").as("pid"), col("user_id").as("uid_b"),
          col("ts").as("p_ts"))
      val w = Window.partitionBy("sid").orderBy(asc("p_ts"), asc("pid"))
      val got = a.join(b,
          col("user_id") === col("uid_b") &&
          col("p_ts") > col("s_ts") &&
          col("p_ts") <= col("s_ts") + expr("INTERVAL 10 MINUTES"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select("sid", "pid").as[(Long, Long)].collect().toSet
      assert(got == naive(log), s"seed $seedI: $got vs ${naive(log)}")
    }
  }

  test("dedup is idempotent on generated logs (SURVEY §5.2.4)") {
    (1 to 5).foreach { seedI =>
      val log = logGen.pureApply(Gen.Parameters.default, Seed(seedI.toLong))
      // duplicate every event twice, then dedup on the key columns
      val df = (log ++ log).map(e => (e.user, e.typ))
        .toDF("user_id", "event_type")
      val once = df.dropDuplicates("user_id", "event_type")
      val twice = once.dropDuplicates("user_id", "event_type")
      assert(once.collect().map(_.toSeq).toSet ==
        twice.collect().map(_.toSeq).toSet)
      assert(once.count() == log.map(e => (e.user, e.typ)).distinct.size)
    }
  }
}
