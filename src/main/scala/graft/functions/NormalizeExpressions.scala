package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC canonical composition as a native codegen'd expression —
  * the kernel behind t32's normalization scrub. Spark's function
  * surface has no normalizer, and a Scala UDF would both fall out of
  * whole-stage codegen and pay SerDe per row; this is the §2.12
  * preference order (native Expression over UDF) applied to the very
  * first stage of every real ingest pipeline: canonicalize encoding
  * BEFORE any hash-keyed operator sees the bytes, because "café" with a
  * precomposed é and "café" with a combining acute are byte-different
  * inputs to exact dedup (d1), MinHash shingles (d2), and every stored
  * index key, while being the SAME text to every reader.
  *
  * The ASCII fast path (`isNormalized` is O(n) with no allocation and
  * trivially true for ASCII, which is most of a web corpus) returns the
  * input UTF8String untouched — the JDK normalize + UTF8String
  * round-trip is paid only by rows that actually carry marks. JDK
  * normalization implements the frozen Unicode canonical-composition
  * algorithm, the same definition DuckDB's `nfc_normalize` states (NFC
  * is stabilized: composition results never change across Unicode
  * versions for assigned codepoints).
  */
object NfcKernel {
  private val NFC = java.text.Normalizer.Form.NFC
  def nfc(s: UTF8String): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, NFC)) s
    else UTF8String.fromString(java.text.Normalizer.normalize(str, NFC))
  }
}

/** string → string; null-intolerant (UnaryExpression default). */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"nfc_normalize expects string, got $t")
  }

  override def dataType: DataType = StringType

  override protected def withNewChildInternal(c: Expression): NfcNormalize =
    copy(child = c)

  override def nullSafeEval(s: Any): Any =
    NfcKernel.nfc(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, x => s"graft.functions.NfcKernel.nfc($x)")
}

object NormalizeExpressions {
  /** Column-level NFC canonical composition over a string column. */
  def nfcNormalize(s: Column): Column =
    org.apache.spark.sql.graft.Bridge.toColumn(
      NfcNormalize(org.apache.spark.sql.graft.Bridge.toExpression(s)))
}
