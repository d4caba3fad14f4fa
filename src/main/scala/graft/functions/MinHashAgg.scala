package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed MinHash-signature aggregator (SURVEY §2.10 L2/L6): aggregates one
  * shingle string per input row into a k-wide MinHash signature.
  *
  * This is the scale path — 64-bit integer hashing (FNV-1a base hash +
  * splitmix64 per-permutation mixing, both public-domain constructions),
  * one long[] buffer, zero allocation per row beyond the buffer. The
  * md5-based `q_minhash_band` declared query exists only because its
  * hashes must be bit-identical in DuckDB for the oracle; a real pipeline
  * uses this aggregator:
  *
  * {{{
  *   val sig = udaf(new MinHashAgg(64))
  *   shingles.groupBy("doc_id").agg(sig(col("gram")).as("signature"))
  * }}}
  *
  * Signature merge is element-wise min — associative and commutative, so
  * partial aggregation (map-side combine) applies; the shuffle carries one
  * k-long array per doc, not the shingle set. Estimated Jaccard(a,b) =
  * fraction of agreeing signature positions (property-tested).
  */
class MinHashAgg(k: Int) extends Aggregator[String, Array[Long], Array[Long]] {
  require(k > 0 && k <= 1024, s"k must be in (0, 1024], got $k")

  override def zero: Array[Long] = Array.fill(k)(Long.MaxValue)

  override def reduce(buf: Array[Long], shingle: String): Array[Long] = {
    val h0 = MinHashAgg.fnv1a64(shingle)
    var i = 0
    while (i < k) {
      val h = MinHashAgg.splitmix64(h0 ^ MinHashAgg.seed(i))
      if (h < buf(i)) buf(i) = h
      i += 1
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < k) { if (b(i) < a(i)) a(i) = b(i); i += 1 }
    a
  }

  override def finish(buf: Array[Long]): Array[Long] = buf

  override def bufferEncoder: Encoder[Array[Long]] = MinHashAgg.longArrayEnc

  override def outputEncoder: Encoder[Array[Long]] = MinHashAgg.longArrayEnc
}

object MinHashAgg {
  /** FNV-1a 64-bit over UTF-8 bytes (public-domain hash). */
  def fnv1a64(s: String): Long = {
    var h = 0xcbf29ce484222325L
    val bytes = s.getBytes("UTF-8")
    var i = 0
    while (i < bytes.length) {
      h ^= (bytes(i) & 0xffL)
      h *= 0x100000001b3L
      i += 1
    }
    h
  }

  /** splitmix64 finalizer (public-domain, Steele et al.). */
  def splitmix64(x0: Long): Long = {
    var x = x0 + 0x9e3779b97f4a7c15L
    x = (x ^ (x >>> 30)) * 0xbf58476d1ce4e5b9L
    x = (x ^ (x >>> 27)) * 0x94d049bb133111ebL
    x ^ (x >>> 31)
  }

  /** Deterministic per-permutation seed. */
  def seed(i: Int): Long = splitmix64(0x5eed5eed5eedL + i)

  /** Signature-agreement Jaccard estimate. */
  def estimate(a: Array[Long], b: Array[Long]): Double = {
    require(a.length == b.length)
    var eq = 0; var i = 0
    while (i < a.length) { if (a(i) == b(i)) eq += 1; i += 1 }
    eq.toDouble / a.length
  }

  private[functions] val longArrayEnc: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
}
