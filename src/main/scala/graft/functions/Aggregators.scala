package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed `Aggregator`s (SURVEY.md §7.4): custom aggregation functions on
  * the standard Spark API — partial aggregation (reduce) runs map-side,
  * merge runs on the reducer, exactly like built-in aggregates, so they
  * scale the same way.
  */
object Aggregators {

  /** Element-wise centroid of float vectors (e.g. per-label embedding
    * centroid). Buffer = (running sums, count). */
  class VectorCentroid(dim: Int)
      extends Aggregator[Array[Float], (Array[Double], Long), Array[Double]] {
    def zero: (Array[Double], Long) = (new Array[Double](dim), 0L)
    def reduce(b: (Array[Double], Long), v: Array[Float]): (Array[Double], Long) = {
      val (s, n) = b
      var i = 0
      while (i < dim && i < v.length) { s(i) += v(i); i += 1 }
      (s, n + 1)
    }
    def merge(a: (Array[Double], Long), b: (Array[Double], Long)): (Array[Double], Long) = {
      val (s1, n1) = a; val (s2, n2) = b
      var i = 0
      while (i < dim) { s1(i) += s2(i); i += 1 }
      (s1, n1 + n2)
    }
    def finish(b: (Array[Double], Long)): Array[Double] = {
      val (s, n) = b
      if (n == 0) s else s.map(_ / n)
    }
    def bufferEncoder: Encoder[(Array[Double], Long)] =
      Encoders.tuple(Encoders.javaSerialization[Array[Double]], Encoders.scalaLong)
    def outputEncoder: Encoder[Array[Double]] = ExprEncoders.doubleArray
  }

  /** MinHash signature of a SET of strings distributed across rows (e.g.
    * all shingles of a source/cluster): k universal-hash minima. Merge is
    * element-wise min — associative/commutative, so partial aggregation
    * is exact. */
  class MinHashSignature(k: Int) extends Aggregator[String, Array[Long], Array[Long]] {
    private val P = 2147483647L
    def zero: Array[Long] = Array.fill(k)(Long.MaxValue)
    private def h(j: Int, s: String): Long = {
      val a = 1103515245L * (j + 1) % P
      val b = 12345L * (j + 7919) % P
      val bytes = s.getBytes("UTF-8")
      val x = math.floorMod(org.apache.spark.unsafe.hash.Murmur3_x86_32
        .hashUnsafeBytes(bytes,
          org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET, bytes.length, 42).toLong, P)
      (a * x + b) % P
    }
    def reduce(buf: Array[Long], s: String): Array[Long] = {
      var j = 0
      while (j < k) { val v = h(j, s); if (v < buf(j)) buf(j) = v; j += 1 }
      buf
    }
    def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var j = 0
      while (j < k) { if (b(j) < a(j)) a(j) = b(j); j += 1 }
      a
    }
    def finish(b: Array[Long]): Array[Long] = b
    def bufferEncoder: Encoder[Array[Long]] = ExprEncoders.longArray
    def outputEncoder: Encoder[Array[Long]] = ExprEncoders.longArray
  }

  /** Quantized Gram matrix Σ q·qᵀ of float vectors (q = round(x·1000),
    * the engine's standing embedding quantization): the ONE corpus pass
    * PCA/whitening needs — everything downstream (power iteration,
    * eigen read-off) runs on the constant-size dim×dim result. Exact
    * Long sums; buffer = row-major dim² array; merge is element-wise
    * add, so partial aggregation is exact and map-side. Long headroom:
    * |G| ≤ 10⁶·n — swap the buffer to BigInt/decimal past ~10¹² rows. */
  class GramMatrix(dim: Int) extends Aggregator[Array[Float], Array[Long], Array[Long]] {
    def zero: Array[Long] = new Array[Long](dim * dim)
    def reduce(buf: Array[Long], v: Array[Float]): Array[Long] = {
      val q = new Array[Long](dim)
      var i = 0
      while (i < dim && i < v.length) {
        // HALF_UP away from zero — Spark SQL round()/DuckDB round()
        // semantics; Math.round is floor(x+0.5) (toward +inf), which
        // differs on negative exact halves and would silently diverge
        // from similarityPcaProject's expr-based quantize and the oracle
        val d = v(i).toDouble * 1000
        q(i) = (if (d < 0) -math.floor(-d + 0.5) else math.floor(d + 0.5)).toLong
        i += 1
      }
      i = 0
      while (i < dim) {
        val qi = q(i); var j = 0
        while (j < dim) { buf(i * dim + j) += qi * q(j); j += 1 }
        i += 1
      }
      buf
    }
    def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var i = 0
      while (i < a.length) { a(i) += b(i); i += 1 }
      a
    }
    def finish(b: Array[Long]): Array[Long] = b
    def bufferEncoder: Encoder[Array[Long]] = ExprEncoders.longArray
    def outputEncoder: Encoder[Array[Long]] = ExprEncoders.longArray
  }

  private object ExprEncoders {
    import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
    import org.apache.spark.sql.catalyst.encoders.AgnosticEncoders._
    val doubleArray: Encoder[Array[Double]] =
      ExpressionEncoder(ArrayEncoder(PrimitiveDoubleEncoder, containsNull = false))
    val longArray: Encoder[Array[Long]] =
      ExpressionEncoder(ArrayEncoder(PrimitiveLongEncoder, containsNull = false))
  }
}
