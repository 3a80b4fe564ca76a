package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** All (1-based start, md5 hex) k-token window hashes of a token array
  * in ONE pass — the d12/d12b windowing kernel.
  *
  * Replaces `transform(sequence(1, n−k+1), i → struct(i, concat_ws(" ",
  * slice(tk, i, k))))` + a downstream `md5`: higher-order lambdas
  * evaluate INTERPRETED per element, and each window materialized a
  * fresh k-element array plus a ~(7·k)-byte span string before hashing
  * — measured 271 µs/window CPU on the r17 long-doc corpus (3,552 s of
  * CPU for 13M windows at k=50; invisible at the short-doc corpus's
  * k=8/40-token shape that the original sizing was tested on). This
  * kernel joins the doc's tokens into one byte buffer with an offset
  * table, then runs md5 directly over each window's byte RANGE — no
  * per-window array, no span string, O(L·k) bytes hashed and nothing
  * else. Hash input is byte-identical to md5(array_to_string(tk[i:i+k-1],
  * ' ')): the buffer's separators are single spaces and windows start
  * and end on token boundaries.
  *
  * Precondition: token elements are non-null (the `split` contract that
  * feeds every call site); a null element hashes as an empty string.
  */
case class SpanWindowHashes(child: Expression, k: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  require(k >= 2, s"span_window_hashes needs k >= 2, got $k")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"span_window_hashes expects array<string>, got $t")
  }

  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("s", IntegerType, nullable = false),
      StructField("h", StringType, nullable = false))),
    containsNull = false)

  override protected def withNewChildInternal(c: Expression): SpanWindowHashes =
    copy(child = c)

  override def nullSafeEval(a: Any): Any =
    SpanWindowHashes.compute(a.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      x => s"graft.functions.SpanWindowHashes.compute($x, $k)")
}

object SpanWindowHashes {
  /** Column wrapper (the MinHashK/SimHash64 convention). */
  def spanWindowHashes(tokens: org.apache.spark.sql.Column, k: Int)
      : org.apache.spark.sql.Column =
    org.apache.spark.sql.graft.Bridge.toColumn(
      SpanWindowHashes(org.apache.spark.sql.graft.Bridge.toExpression(tokens), k))

  // MessageDigest is stateful; tasks on different threads may share the
  // generated class's static call site, so the instance is thread-local
  private val md = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }
  private val HEX = "0123456789abcdef".toCharArray

  /** Static kernel shared by interpreted eval and generated code. */
  def compute(tokens: ArrayData, k: Int): ArrayData = {
    val n = tokens.numElements()
    if (n < k) return new GenericArrayData(Array.empty[Any])
    val toks = new Array[Array[Byte]](n)
    var total = 0L
    var i = 0
    while (i < n) {
      toks(i) =
        if (tokens.isNullAt(i)) Array.emptyByteArray
        else tokens.getUTF8String(i).getBytes
      total += toks(i).length
      i += 1
    }
    val bufLen = total + (n - 1)
    require(bufLen <= Int.MaxValue,
      s"document too large for span windowing: $bufLen joined bytes")
    val buf = new Array[Byte](bufLen.toInt)
    val off = new Array[Int](n) // byte start of token i in buf
    var p = 0
    i = 0
    while (i < n) {
      off(i) = p
      System.arraycopy(toks(i), 0, buf, p, toks(i).length)
      p += toks(i).length
      if (i < n - 1) { buf(p) = ' '; p += 1 }
      i += 1
    }
    val digest = md.get()
    val out = new Array[Any](n - k + 1)
    var s = 0
    while (s <= n - k) {
      val last = s + k - 1
      val from = off(s)
      val until = if (last == n - 1) p else off(last + 1) - 1
      digest.reset()
      digest.update(buf, from, until - from)
      val d = digest.digest()
      val hex = new Array[Char](32)
      var b = 0
      while (b < 16) {
        hex(b * 2) = HEX((d(b) >> 4) & 0xf)
        hex(b * 2 + 1) = HEX(d(b) & 0xf)
        b += 1
      }
      out(s) = InternalRow(s + 1, UTF8String.fromString(new String(hex)))
      s += 1
    }
    new GenericArrayData(out)
  }
}
