package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Single-pass distributed second-moment aggregator over an embedding
  * column (SURVEY §2.10 L3/L6 extension, r11): folds each d-vector into
  * one flat buffer of d² + d + 1 doubles — Σ xᵢxⱼ (the Gram sums), Σ xᵢ
  * (the mean sums), and n — from which mean vector and covariance matrix
  * derive in closed form (cov(i,j) = Sᵢⱼ/n − (Sᵢ/n)(Sⱼ/n)). This is the
  * front half of PCA / whitening / Mahalanobis scoring over document
  * embeddings, computed the way a 100 TB pipeline must: the buffer is
  * merge-associative and commutative (element-wise add), so Spark's
  * partial aggregation applies — each task ships ONE (d²+d+1)-double
  * array through the shuffle regardless of row count, never a per-pair
  * or per-row intermediate. Per-row cost is the unavoidable d² Gram
  * update, done in a primitive while-loop over the unboxed buffer.
  *
  * Bounds: d ≤ 256 keeps the buffer ≤ ~516 KB — comfortably inside a
  * shuffle row; larger d belongs to a blocked formulation.
  */
class VecMomentsAgg(d: Int)
    extends Aggregator[Seq[Float], Array[Double], Array[Double]] {
  require(d > 0 && d <= 256, s"d must be in (0, 256], got $d")

  override def zero: Array[Double] = new Array[Double](d * d + d + 1)

  override def reduce(b: Array[Double], x: Seq[Float]): Array[Double] = {
    require(x.length == d, s"expected dim $d, got ${x.length}")
    // IndexedSeq access; copy to a primitive array once to keep the d²
    // loop unboxed
    val v = new Array[Double](d)
    var i = 0
    while (i < d) { v(i) = x(i).toDouble; i += 1 }
    i = 0
    while (i < d) {
      val xi = v(i)
      b(d * d + i) += xi
      var j = 0
      val row = i * d
      while (j < d) { b(row + j) += xi * v(j); j += 1 }
      i += 1
    }
    b(d * d + d) += 1.0
    b
  }

  override def merge(a: Array[Double], b: Array[Double]): Array[Double] = {
    var i = 0
    while (i < a.length) { a(i) += b(i); i += 1 }
    a
  }

  override def finish(b: Array[Double]): Array[Double] = b

  override def bufferEncoder: Encoder[Array[Double]] =
    VecMomentsAgg.doubleArrayEnc
  override def outputEncoder: Encoder[Array[Double]] =
    VecMomentsAgg.doubleArrayEnc
}

object VecMomentsAgg {
  private[functions] val doubleArrayEnc: Encoder[Array[Double]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Double]]()
}
