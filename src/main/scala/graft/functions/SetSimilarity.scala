package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.BinaryExpression
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** One-pass set-Jaccard over two array<string> columns — value-
  * identical to `size(array_intersect(a,b)) / size(array_union(a,b))`
  * (distinct-element semantics, double division) wherever that form is
  * defined; on TWO empty arrays the kernel yields 0.0 (NOT NaN — NaN
  * sorts greater than every double in Spark SQL, so a `>= threshold`
  * filter would pass an ∅~∅ pair) where the HOF form raises under
  * ANSI mode — unreachable from d2/d8 (shingle arrays are non-empty),
  * pinned in JaccardSimSpec. All this without
  * MATERIALIZING either intermediate array: the
  * HOF form builds two result arrays (each with its own dedup hash
  * table) per pair, which dominated the d2 exact-verify stage at 24M
  * candidate pairs on the 200k skew corpus. The kernel keeps two hash
  * SETS (no arrays, no copies): |A∩B| counted while deduping b,
  * |A∪B| = |A| + |B| − |A∩B|.
  */
object JaccardSim {
  /** Static kernel shared by interpreted eval and generated code. */
  def compute(a: ArrayData, b: ArrayData): Double = {
    val na = a.numElements()
    val sa = new java.util.HashSet[UTF8String](na * 2)
    var i = 0
    while (i < na) { sa.add(a.getUTF8String(i)); i += 1 }
    val nb = b.numElements()
    val sb = new java.util.HashSet[UTF8String](nb * 2)
    var inter = 0
    var nbDistinct = 0
    var j = 0
    while (j < nb) {
      val e = b.getUTF8String(j)
      if (sb.add(e)) {
        nbDistinct += 1
        if (sa.contains(e)) inter += 1
      }
      j += 1
    }
    val union = sa.size + nbDistinct - inter
    // two empty arrays: 0/0 would be NaN, and Spark SQL sorts NaN
    // GREATER than every double, so a `sim >= threshold` verify filter
    // would PASS such a pair — define ∅~∅ as 0.0 in the kernel so the
    // invariant holds for any caller, not just the non-empty-shingle
    // contract upstream (r15 ADVICE #1)
    if (union == 0) 0.0 else inter.toDouble / union.toDouble
  }
}

case class JaccardSimExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(StringType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"jaccard_sim expects array<string> inputs, got ${left.dataType} / ${right.dataType}")
  }

  override def dataType: DataType = DoubleType

  override protected def withNewChildrenInternal(l: Expression, r: Expression): JaccardSimExpr =
    copy(left = l, right = r)

  override def nullSafeEval(a: Any, b: Any): Any =
    JaccardSim.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (x, y) => s"graft.functions.JaccardSim.compute($x, $y)")
}

object SetSimilarity {
  /** Column-level one-pass set Jaccard over array<string> columns. */
  def jaccard(a: Column, b: Column): Column =
    org.apache.spark.sql.graft.Bridge.toColumn(
      JaccardSimExpr(org.apache.spark.sql.graft.Bridge.toExpression(a),
        org.apache.spark.sql.graft.Bridge.toExpression(b)))
}
