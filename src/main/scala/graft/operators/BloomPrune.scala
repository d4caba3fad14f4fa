package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bloom-filter runtime pre-filtering for selective joins (SURVEY §2.3 /
  * SCALE.md): build a compact bloom filter over the small (already
  * filtered) side's join keys, broadcast it, and drop non-candidate fact
  * rows BEFORE the join's shuffle. This is the pattern Spark's own
  * `InjectRuntimeFilter` optimization applies automatically when
  * statistics justify it — exposed here as an explicit operator so a
  * pipeline can force it (at 100 TB the win is concrete: a 2 % selective
  * dim filter means ~98 % of the fact side never enters the exchange;
  * the bloom itself is a few MB broadcast once, and false positives only
  * cost a little extra shuffle — the exact join afterwards removes them,
  * so the RESULT IS IDENTICAL to the plain join, which is exactly what
  * the DuckDB oracle on q_join_bloom checks).
  *
  * Implementation: Spark's native `BloomFilterAggregate` /
  * `BloomFilterMightContain` (codegen'd, the same sketch the optimizer
  * injects) over `xxhash64(key)`, registered as SQL functions
  * `graft_bloom_agg` / `graft_might_contain` by
  * [[graft.functions.GraftFunctions]]. The one-row bloom enters the plan
  * as a SCALAR SUBQUERY (`might_contain` requires a constant or scalar-
  * subquery bloom side) — Catalyst evaluates it once and broadcasts the
  * value into the fact scan's filter; no driver-side collect in user code.
  */
object BloomPrune {
  /** Rows of `fact` whose `factKey` might appear in `dim.dimKey` —
    * a superset of the true semi join (bloom false positives), produced
    * without shuffling `fact`. Follow with the exact join; the bloom just
    * keeps non-candidates out of that join's exchange. */
  def prefilter(fact: DataFrame, factKey: String, dim: DataFrame,
      dimKey: String, expectedItems: Long): DataFrame = {
    require(expectedItems > 0, "expectedItems must be positive")
    // xxhash64 hashes by PHYSICAL type (an INT 7 and a BIGINT 7 hash
    // differently), so a type mismatch between the two keys would build
    // and probe DISJOINT hash spaces — the prefilter would silently drop
    // true matches, the one thing it must never do. Fail loudly instead;
    // the caller casts one side explicitly (the exact join they follow
    // with would have coerced, hiding the corruption).
    val (ft, dt) = (fact.schema(factKey).dataType, dim.schema(dimKey).dataType)
    require(ft == dt,
      s"bloom prefilter key types must match exactly: $factKey is $ft, " +
        s"$dimKey is $dt — cast one side before calling (xxhash64 is " +
        "physical-type-sensitive, a mismatch silently drops real matches)")
    graft.functions.GraftFunctions.register(fact.sparkSession)
    val bf = dim.agg(
      expr(s"graft_bloom_agg(xxhash64($dimKey), ${expectedItems}L)")
        .as("__graft_bf")).scalar()
    fact.filter(
      call_function("graft_might_contain", bf, xxhash64(col(factKey))))
  }
}
