package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

package object queries {
  /** Cross-engine-deterministic half-up rounding: floor(x*10^n + 0.5)/10^n.
    *
    * Spark's round() reads the double's full decimal expansion while
    * DuckDB's multiplies-then-rounds — the two disagree on exact-half
    * rationals (e.g. 43/80 at 4 dp). When the input double is bit-identical
    * in both engines (anything derived from exact integer arithmetic:
    * averages of ints, count ratios), this formulation is bit-deterministic.
    * Every oracle uses the same floor(x*s + 0.5)/s expression.
    */
  private[graft] def fround(c: Column, n: Int): Column = {
    val s = math.pow(10, n)
    floor(c * s + lit(0.5)) / s
  }

  /** Arithmetic ntile(n) from a row number `rn` (1-based, long) and the
    * partition row count `pc` (long): first (pc mod n) buckets get
    * ceil(pc/n) rows, the rest floor(pc/n) — exactly the builtin's
    * distribution, but computable in the same WindowExec pass as `rn`
    * (the builtin is a SizeBasedWindowFunction needing an extra pass).
    * Cross-checked cell-for-cell against the builtin in `tools.WinProbe`.
    */
  private[graft] def arithNtile(rn: Column, pc: Column, n: Int): Column = {
    // exact long division a div b for non-negative operands (the double
    // quotient is exact because b divides a - pmod(a,b), values << 2^53)
    def ldiv(a: Column, b: Column): Column =
      ((a - pmod(a, b)) / b).cast("long")
    val q = ldiv(pc, lit(n.toLong))
    val r = pmod(pc, lit(n.toLong))
    val g = greatest(q, lit(1L))
    when(rn <= r * (q + lit(1L)), ldiv(rn + q, q + lit(1L)))
      .otherwise(r + ldiv(rn - r * (q + lit(1L)) + g - lit(1L), g))
  }
}
