package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Shared scaffolding for the fused vector kernels (SURVEY §4.2): one
  * primitive loop over two numeric arrays accumulating in double, with
  * whole-stage codegen. [[CosineSimilarity]], [[DotProduct]] and
  * [[L2Distance]] are each a two-line `finish` over the same loop — the
  * three kernels an embedding pipeline needs (angular similarity,
  * inner-product ANN, euclidean dedup).
  *
  * Element types per side: tinyint, float or double, independently (r7)
  * — so an int8-quantized base column scores directly against a
  * full-precision query with no reconstruction pass (for cosine the
  * per-vector scale cancels exactly, so ranking on raw codes is the
  * asymmetric-search fast path). Every element widens to double before
  * accumulating, regardless of input type, keeping oracle parity.
  */
trait VectorBinaryExpression extends BinaryExpression {
  override def dataType: DataType = DoubleType

  protected def elemType(e: Expression): Option[DataType] = e.dataType match {
    case ArrayType(t @ (ByteType | FloatType | DoubleType), _) => Some(t)
    case _ => None
  }

  override def checkInputDataTypes(): TypeCheckResult =
    (elemType(left), elemType(right)) match {
      case (Some(_), Some(_)) => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects two arrays of tinyint, float or double, " +
          s"got ${left.dataType.sql} and ${right.dataType.sql}")
    }

  /** (dot, na, nb) → result. */
  protected def finish(dot: Double, na: Double, nb: Double): Double
  /** Java expression over codegen vars (dot, na, nb). */
  protected def finishCode(dot: String, na: String, nb: String): String

  private def reader(t: DataType): (ArrayData, Int) => Double = t match {
    case ByteType  => (a, i) => a.getByte(i).toDouble
    case FloatType => (a, i) => a.getFloat(i).toDouble
    case _         => (a, i) => a.getDouble(i)
  }
  // resolved once per expression instance, not per row — the interpreted
  // path stays allocation-free in the loop
  @transient private lazy val readLeft = reader(elemType(left).get)
  @transient private lazy val readRight = reader(elemType(right).get)

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    val gx = readLeft
    val gy = readRight
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val xi = gx(x, i); val yi = gy(y, i)
      dot += xi * yi; na += xi * xi; nb += yi * yi; i += 1
    }
    finish(dot, na, nb)
  }

  private def getCall(t: DataType): String = t match {
    case ByteType  => "getByte"
    case FloatType => "getFloat"
    case _         => "getDouble"
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val getL = getCall(elemType(left).get)
    val getR = getCall(elemType(right).get)
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na"); val nb = ctx.freshName("nb")
      val xi = ctx.freshName("xi"); val yi = ctx.freshName("yi")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0, $na = 0.0, $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $xi = (double) $a.$getL($i);
         |  double $yi = (double) $b.$getR($i);
         |  $dot += $xi * $yi; $na += $xi * $xi; $nb += $yi * $yi;
         |}
         |${ev.value} = ${finishCode(dot, na, nb)};
       """.stripMargin
    })
  }
}

/** Inner product ⟨a,b⟩ (MIPS-style similarity). */
case class DotProduct(left: Expression, right: Expression)
    extends VectorBinaryExpression {
  override protected def finish(dot: Double, na: Double, nb: Double) = dot
  override protected def finishCode(dot: String, na: String, nb: String) = dot
  override protected def withNewChildrenInternal(l: Expression, r: Expression)
      : DotProduct = copy(left = l, right = r)
  override def prettyName: String = "dot_product"
}

/** Euclidean distance ‖a−b‖₂ = sqrt(na + nb − 2·dot). */
case class L2Distance(left: Expression, right: Expression)
    extends VectorBinaryExpression {
  override protected def finish(dot: Double, na: Double, nb: Double) =
    math.sqrt(math.max(0.0, na + nb - 2.0 * dot))
  override protected def finishCode(dot: String, na: String, nb: String) =
    s"java.lang.Math.sqrt(java.lang.Math.max(0.0, $na + $nb - 2.0 * $dot))"
  override protected def withNewChildrenInternal(l: Expression, r: Expression)
      : L2Distance = copy(left = l, right = r)
  override def prettyName: String = "l2_distance"
}
