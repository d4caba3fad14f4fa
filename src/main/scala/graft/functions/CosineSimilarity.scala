package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

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
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  private def elemType(e: Expression): Option[DataType] = e.dataType match {
    case ArrayType(t @ (FloatType | DoubleType), _) => Some(t)
    case _ => None
  }

  override def checkInputDataTypes(): TypeCheckResult =
    (elemType(left), elemType(right)) match {
      case (Some(a), Some(b)) if a == b => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"cosine_sim expects two arrays of float or double with matching " +
          s"element types, got ${left.dataType.sql} and ${right.dataType.sql}")
    }

  @inline private def isFloat: Boolean = elemType(left).contains(FloatType)

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    if (isFloat) {
      while (i < n) {
        val xi = x.getFloat(i).toDouble; val yi = y.getFloat(i).toDouble
        dot += xi * yi; na += xi * xi; nb += yi * yi; i += 1
      }
    } else {
      while (i < n) {
        val xi = x.getDouble(i); val yi = y.getDouble(i)
        dot += xi * yi; na += xi * xi; nb += yi * yi; i += 1
      }
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val get = if (isFloat) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val xi = ctx.freshName("xi")
      val yi = ctx.freshName("yi")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0, $na = 0.0, $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $xi = (double) $a.$get($i);
         |  double $yi = (double) $b.$get($i);
         |  $dot += $xi * $yi; $na += $xi * $xi; $nb += $yi * $yi;
         |}
         |${ev.value} = $dot /
         |  (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
       """.stripMargin
    })
  }

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

  val all: Seq[(String, Class[_], Seq[Expression] => Expression)] = Seq(
    ("cosine_sim", classOf[CosineSimilarity], cosineSimBuilder),
    ("dot_product", classOf[DotProduct], dotProductBuilder),
    ("l2_distance", classOf[L2Distance], l2DistanceBuilder))

  def register(spark: SparkSession): Unit =
    all.foreach { case (name, cls, builder) =>
      spark.sessionState.functionRegistry.registerFunction(
        FunctionIdentifier(name), new ExpressionInfo(cls.getName, name),
        builder)
    }
}
