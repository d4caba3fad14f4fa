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
  private[queries] def fround(c: Column, n: Int): Column = {
    val s = math.pow(10, n)
    floor(c * s + lit(0.5)) / s
  }
}
