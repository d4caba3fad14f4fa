package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Native Catalyst expression: cosine similarity of two numeric arrays.
  *
  * Why a custom Expression (SURVEY §4.2 / §2.10 L6): the composable
  * formulation `aggregate(zip_with(a,b,_*_),0d,_+_)` materializes an
  * intermediate 64-element array per row-pair and generates ~3× the
  * codegen; this expression is one fused primitive loop with no
  * allocation, participates in whole-stage codegen via [[doGenCode]], and
  * accumulates in double regardless of input element type (float parity
  * with the DuckDB oracle's explicit CAST(... AS DOUBLE) math).
  *
  * Semantics: dot(a,b) / (||a||·||b||), summed in index order. Inputs must
  * be equal-length arrays of float or double with no null elements
  * (embedding vectors); returns null if either array is null.
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends VectorBinaryExpression {
  override protected def finish(dot: Double, na: Double, nb: Double): Double =
    dot / (math.sqrt(na) * math.sqrt(nb))
  override protected def finishCode(dot: String, na: String, nb: String)
      : String =
    s"$dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb))"
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimilarity =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "cosine_sim"
}

/** Runtime registration of graft's SQL functions (idempotent). Sessions
  * created by the driver's Verify/Bench don't go through
  * SparkSessionExtensions, so queries call this directly; the extensions
  * hook in [[GraftExtensions]] covers spark.sql.extensions users. */
object GraftFunctions {
  private def binary(name: String, f: (Expression, Expression) => Expression)
      : Seq[Expression] => Expression = { children =>
    require(children.length == 2, s"$name takes exactly 2 arguments")
    f(children.head, children(1))
  }

  val cosineSimBuilder: Seq[Expression] => Expression =
    binary("cosine_sim", CosineSimilarity.apply)
  val dotProductBuilder: Seq[Expression] => Expression =
    binary("dot_product", DotProduct.apply)
  val l2DistanceBuilder: Seq[Expression] => Expression =
    binary("l2_distance", L2Distance.apply)

  // Spark's own bloom-sketch expressions (the pair InjectRuntimeFilter
  // uses), exposed as SQL functions for the explicit runtime-prefilter
  // operator (operators/BloomPrune.scala). Catalyst wraps the bare
  // AggregateFunction returned by the builder in an AggregateExpression
  // during resolution, same as the built-in registry entries.
  val bloomAggBuilder: Seq[Expression] => Expression = {
    case Seq(c) =>
      new org.apache.spark.sql.catalyst.expressions.aggregate
        .BloomFilterAggregate(c)
    case Seq(c, n) =>
      new org.apache.spark.sql.catalyst.expressions.aggregate
        .BloomFilterAggregate(c, n)
    case Seq(c, n, b) =>
      new org.apache.spark.sql.catalyst.expressions.aggregate
        .BloomFilterAggregate(c, n, b)
    case other => throw new IllegalArgumentException(
      s"graft_bloom_agg takes 1-3 arguments, got ${other.length}")
  }
  val mightContainBuilder: Seq[Expression] => Expression =
    binary("graft_might_contain",
      org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain.apply)

  val all: Seq[(String, Class[_], Seq[Expression] => Expression)] = Seq(
    ("cosine_sim", classOf[CosineSimilarity], cosineSimBuilder),
    ("dot_product", classOf[DotProduct], dotProductBuilder),
    ("l2_distance", classOf[L2Distance], l2DistanceBuilder),
    ("graft_bloom_agg",
      classOf[org.apache.spark.sql.catalyst.expressions.aggregate
        .BloomFilterAggregate], bloomAggBuilder),
    ("graft_might_contain",
      classOf[org.apache.spark.sql.catalyst.expressions
        .BloomFilterMightContain], mightContainBuilder))

  def register(spark: SparkSession): Unit =
    all.foreach { case (name, cls, builder) =>
      val fid = FunctionIdentifier(name)
      // idempotent-silent: re-registering an identical builder is a no-op
      // (query builders call this defensively; without the guard every
      // call after the first logs a `replaced a previously registered
      // function` warning — VERDICT r5 §wrong-4)
      if (!spark.sessionState.functionRegistry.functionExists(fid))
        spark.sessionState.functionRegistry.registerFunction(
          fid, new ExpressionInfo(cls.getName, name), builder)
    }
}
