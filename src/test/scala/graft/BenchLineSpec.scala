package graft

import com.fasterxml.jackson.databind.ObjectMapper
import org.scalatest.funsuite.AnyFunSuite

/** The driver's stdout tail buffer is exactly 2000 chars and it parses the
  * FINAL line as JSON (BENCH_r03/r04 both recorded `"parsed": null` from
  * mid-line truncation). These tests pin the two contract properties of
  * [[Bench.renderLine]] — fits the budget, parses as JSON — against the
  * REAL declared key set, so adding a 91st query can't silently push the
  * line back over the buffer. */
class BenchLineSpec extends AnyFunSuite {
  private val mapper = new ObjectMapper() // jackson ships with Spark

  private def fakeResults: Seq[(String, Double)] =
    SparkEntry.queries.keys.toSeq.sorted.zipWithIndex.map { case (k, i) =>
      // worst-case-ish widths: multi-second values and a failure marker
      k -> (if (i % 17 == 0) -1.0 else 1.0 + (i % 10) * 0.137)
    }

  test("final stdout line fits the driver tail buffer with headroom") {
    val line = Bench.renderLine(fakeResults, "/root/testdata/sf0.1")
    assert(line.length <= Bench.LineBudget,
      s"line is ${line.length} chars, budget ${Bench.LineBudget}")
    assert(!line.contains("\n"))
  }

  test("final stdout line is valid JSON with the contract fields") {
    val line = Bench.renderLine(fakeResults, "/root/testdata/sf0.1")
    val root = mapper.readTree(line)
    assert(root.get("metric").asText() == "total")
    assert(root.get("unit").asText() == "sec")
    assert(root.get("sf").asDouble() == 0.1)
    assert(root.get("value").isNumber)
    assert(root.get("n_queries").asInt() == SparkEntry.queries.size)
    assert(root.get("runs").asInt() == 3,
      "the line must declare its per-query run count (median-of-3)")
    val base = root.get("baseline_equivalents")
    for (a <- Bench.baselineAliases.keys) assert(base.has(a), s"missing $a")
    assert(root.get("queries").size() >= Bench.baselineAliases.size)
  }

  test("full-file render carries every query and parses") {
    val doc = Bench.renderFull(fakeResults, "/root/testdata/sf0.1")
    val root = mapper.readTree(doc)
    assert(root.get("queries").size() == SparkEntry.queries.size)
  }

  test("a failed query is -1 in both renders, excluded from total") {
    val rs = Seq("q_ok" -> 0.5, "q_bad" -> -1.0)
    val line = Bench.renderLine(rs, "sf0.01")
    val root = mapper.readTree(line)
    assert(root.get("value").asDouble() == 0.5)
    assert(root.get("queries").get("q_bad").asDouble() == -1.0)
    assert(mapper.readTree(Bench.renderFull(rs, "sf0.01"))
      .get("queries").get("q_bad").asDouble() == -1.0)
  }

  test("queries are seconds in BOTH branches; full pointer is honest") {
    // small set -> full-map branch; values must be seconds, not ms
    val small = Bench.renderLine(Seq("q_x" -> 1.234), "sf0.01", "/tmp/b.json")
    val sroot = mapper.readTree(small)
    assert(sroot.get("queries").get("q_x").asDouble() == 1.234)
    assert(sroot.get("full").asText() == "/tmp/b.json")
    // real key set -> whatever branch fires, units must still be seconds
    val line = mapper.readTree(Bench.renderLine(fakeResults, "sf0.1"))
    val q = Bench.baselineAliases("agg_groupby")
    val expect = fakeResults.toMap.apply(q)
    assert(math.abs(line.get("queries").get(q).asDouble() - expect) < 0.001)
  }
}
