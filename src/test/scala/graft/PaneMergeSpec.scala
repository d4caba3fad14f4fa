package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** The reference's signature optimization is incremental sliding-window
  * aggregation: per-slide pane partials merged across the window
  * (SURVEY §2.4 A7 [R]). We rely on Structured Streaming's state store for
  * that at runtime; THIS suite proves the underlying algebraic law holds
  * for our operators — a sliding-window aggregate equals the merge of its
  * tumbling panes — so the pane-pre-aggregation rewrite documented for
  * 100 TB (SURVEY §7.6) is semantics-preserving.
  */
class PaneMergeSpec extends SparkSpec {
  import spark.implicits._

  private val eventGen = for {
    n <- Gen.choose(1, 120)
    rows <- Gen.listOfN(n, for {
      sec <- Gen.choose(0L, 3 * 3600L) // 3 hours of data
      v <- Gen.choose(-100, 100)
    } yield (new Timestamp(1704067200000L + sec * 1000), v.toDouble))
  } yield rows

  test("sliding(30m,10m) agg == merge of tumbling(10m) panes") {
    // scalacheck used directly (scalatestplus bridge isn't resolvable
    // offline): deterministic seeds, 8 generated event logs
    (1 to 8).foreach { seedI =>
      val rows = eventGen.pureApply(Gen.Parameters.default, Seed(seedI.toLong))
      locally {
        val df = rows.toDF("ts", "value")
        val direct = df
          .groupBy(window(col("ts"), "30 minutes", "10 minutes"))
          .agg(count(lit(1)).as("cnt"), sum("value").as("sv"),
            min("value").as("mn"), max("value").as("mx"))
          .select(col("window.start").as("ws"), col("cnt"), col("sv"),
            col("mn"), col("mx"))
        // pane pre-agg (the reference's trick, expressed relationally):
        // aggregate once per 10-minute pane, then roll each pane into the
        // 3 sliding windows that contain it and merge the partials.
        val panes = df
          .groupBy(window(col("ts"), "10 minutes").getField("start")
            .as("ps"))
          .agg(count(lit(1)).as("cnt"), sum("value").as("sv"),
            min("value").as("mn"), max("value").as("mx"))
        val merged = panes
          .crossJoin(Seq(0, 1, 2).toDF("k"))
          .select((col("ps") - expr("make_interval(0,0,0,0,0,10,0)") * col("k"))
            .cast("timestamp").as("ws"),
            col("cnt"), col("sv"), col("mn"), col("mx"))
          .groupBy("ws")
          .agg(sum("cnt").as("cnt"), sum("sv").as("sv"),
            min("mn").as("mn"), max("mx").as("mx"))
        val d = direct.collect().map(r =>
          r.getTimestamp(0) -> ((r.getLong(1), r.getDouble(2),
            r.getDouble(3), r.getDouble(4)))).toMap
        val m = merged.collect().map(r =>
          r.getTimestamp(0) -> ((r.getLong(1), r.getDouble(2),
            r.getDouble(3), r.getDouble(4)))).toMap
        assert(d.keySet == m.keySet)
        d.foreach { case (ws, (cnt, sv, mn, mx)) =>
          val (c2, s2, mn2, mx2) = m(ws)
          assert(cnt == c2 && mn == mn2 && mx == mx2)
          assert(math.abs(sv - s2) < 1e-6)
        }
      }
    }
  }
}
