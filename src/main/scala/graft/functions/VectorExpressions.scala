package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst dot product over two float/double array columns
  * (SURVEY.md §2.12 custom-code preference order: a codegen'd
  * `Expression` beats a UDF beats anything else). Sums in ascending
  * index order — the same order as the HOF `aggregate(zip_with(...))`
  * formulation and the DuckDB `list_reduce` oracle, so results are
  * bit-identical across all three.
  *
  * doGenCode emits a tight primitive loop (no per-element boxing, no
  * lambda dispatch) that stays inside whole-stage codegen.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"dot_product expects array<float|double> inputs, got ${left.dataType} / ${right.dataType}")
  }

  private def isFloat(t: DataType): Boolean =
    t.asInstanceOf[ArrayType].elementType == FloatType

  override def dataType: DataType = DoubleType

  override protected def withNewChildrenInternal(l: Expression, r: Expression): DotProduct =
    copy(left = l, right = r)

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val lf = isFloat(left.dataType); val rf = isFloat(right.dataType)
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      val xv = if (lf) x.getFloat(i).toDouble else x.getDouble(i)
      val yv = if (rf) y.getFloat(i).toDouble else y.getDouble(i)
      acc += xv * yv
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val getX = if (isFloat(left.dataType)) s"(double) $x.getFloat($i)" else s"$x.getDouble($i)"
      val getY = if (isFloat(right.dataType)) s"(double) $y.getFloat($i)" else s"$y.getDouble($i)"
      s"""
         |int $n = java.lang.Math.min($x.numElements(), $y.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += ($getX) * ($getY);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })
}

object VectorExpressions {
  /** Column-level dot product over array<float> columns. */
  def fdot(a: Column, b: Column): Column =
    org.apache.spark.sql.graft.Bridge.toColumn(
      DotProduct(org.apache.spark.sql.graft.Bridge.toExpression(a),
        org.apache.spark.sql.graft.Bridge.toExpression(b)))
}
