package graft.stats

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Distributed moment aggregates (SURVEY.md §2.6 A1/A2, §2.12).
  *
  * All three are fixed-length double-vector reductions with map-side
  * partial aggregation (Spark runs Aggregator-backed UDAFs as partial +
  * final, so the shuffle carries one buffer per partition, not rows).
  * Buffers size themselves lazily on the first row so callers don't
  * thread dimensions through.
  *
  * Reference semantics: per-user score sums (helpers.R:18, the meat),
  * crossprod Gramians (wcls.R:57,84 and every Hessian block).
  */
object Aggregates {

  case class VW(v: Seq[Double], w: Double)
  case class UVW(u: Seq[Double], v: Seq[Double], w: Double)

  private def grow(buf: Array[Double], n: Int): Array[Double] =
    if (buf.length >= n) buf else new Array[Double](n)

  /** Σ_rows w · v vᵀ (flattened p·p, row-major). */
  class GramAgg extends Aggregator[VW, Array[Double], Seq[Double]] {
    def zero: Array[Double] = Array.emptyDoubleArray
    def reduce(b0: Array[Double], in: VW): Array[Double] = {
      if (in.v == null) return b0
      val p = in.v.size
      val b = grow(b0, p * p)
      val v = new Array[Double](p)
      var i = 0
      while (i < p) { v(i) = in.v(i); i += 1 }
      i = 0
      while (i < p) {
        val wv = in.w * v(i)
        var j = 0
        while (j < p) { b(i * p + j) += wv * v(j); j += 1 }
        i += 1
      }
      b
    }
    def merge(a: Array[Double], b: Array[Double]): Array[Double] = {
      if (a.length == 0) return b
      if (b.length == 0) return a
      var i = 0
      while (i < a.length) { a(i) += b(i); i += 1 }
      a
    }
    def finish(b: Array[Double]): Seq[Double] = b.toSeq
    def bufferEncoder: Encoder[Array[Double]] = ExprEnc.doubleArray
    def outputEncoder: Encoder[Seq[Double]] = ExprEnc.doubleSeq
  }

  /** Σ_rows w · u vᵀ (flattened p·q, row-major). */
  class CrossAgg extends Aggregator[UVW, Array[Double], Seq[Double]] {
    def zero: Array[Double] = Array.emptyDoubleArray
    def reduce(b0: Array[Double], in: UVW): Array[Double] = {
      if (in.u == null || in.v == null) return b0
      val p = in.u.size; val q = in.v.size
      val b = grow(b0, p * q)
      var i = 0
      while (i < p) {
        val wu = in.w * in.u(i)
        var j = 0
        while (j < q) { b(i * q + j) += wu * in.v(j); j += 1 }
        i += 1
      }
      b
    }
    def merge(a: Array[Double], b: Array[Double]): Array[Double] = {
      if (a.length == 0) return b
      if (b.length == 0) return a
      var i = 0
      while (i < a.length) { a(i) += b(i); i += 1 }
      a
    }
    def finish(b: Array[Double]): Seq[Double] = b.toSeq
    def bufferEncoder: Encoder[Array[Double]] = ExprEnc.doubleArray
    def outputEncoder: Encoder[Seq[Double]] = ExprEnc.doubleSeq
  }

  /** Σ_rows w · v (length p). The A1 per-user score-sum aggregate. */
  class VecSumAgg extends Aggregator[VW, Array[Double], Seq[Double]] {
    def zero: Array[Double] = Array.emptyDoubleArray
    def reduce(b0: Array[Double], in: VW): Array[Double] = {
      if (in.v == null) return b0
      val p = in.v.size
      val b = grow(b0, p)
      var i = 0
      while (i < p) { b(i) += in.w * in.v(i); i += 1 }
      b
    }
    def merge(a: Array[Double], b: Array[Double]): Array[Double] = {
      if (a.length == 0) return b
      if (b.length == 0) return a
      var i = 0
      while (i < a.length) { a(i) += b(i); i += 1 }
      a
    }
    def finish(b: Array[Double]): Seq[Double] = b.toSeq
    def bufferEncoder: Encoder[Array[Double]] = ExprEnc.doubleArray
    def outputEncoder: Encoder[Seq[Double]] = ExprEnc.doubleSeq
  }

  private object ExprEnc {
    import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
    import scala.reflect.runtime.universe.TypeTag
    def of[T: TypeTag]: Encoder[T] = ExpressionEncoder[T]()
    val doubleArray: Encoder[Array[Double]] = of[Array[Double]]
    val doubleSeq: Encoder[Seq[Double]] = of[Seq[Double]]
  }

  /** DataFrame-callable forms: gram(varr, w), cross(uarr, varr, w), vsum(varr, w). */
  def gram(v: Column, w: Column): Column =
    udaf(new GramAgg, ExprEnc.of[VW]).apply(v, w)
  def cross(u: Column, v: Column, w: Column): Column =
    udaf(new CrossAgg, ExprEnc.of[UVW]).apply(u, v, w)
  def vsum(v: Column, w: Column): Column =
    udaf(new VecSumAgg, ExprEnc.of[VW]).apply(v, w)
}
