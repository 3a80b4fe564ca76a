package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

import graft.stats.BSpline

/** Native codegen'd B-spline basis evaluation (reference: R splines::bs
  * inside etwcls.R:115-123 tilt formulas; SURVEY.md P14). Replaces the
  * scalar UDF route: the fitted knot vector rides along as a codegen
  * reference object and the Cox-de Boor kernel runs as a direct method
  * call inside whole-stage codegen — no ScalaUDF boxing/encoding, no
  * codegen-stage break. ET/DR/PET evaluate two bases × up to three
  * fallback-ladder rungs over the full panel, so this sits on the tilt
  * hot path.
  */
case class BSplineBasisExpr(child: Expression, spline: BSpline)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case DoubleType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"bspline_basis expects double input, got $t")
  }

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override protected def withNewChildInternal(c: Expression): BSplineBasisExpr =
    copy(child = c)

  override def nullSafeEval(a: Any): Any =
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(spline.basis(a.asInstanceOf[Double]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bspline", spline, classOf[BSpline].getName)
    defineCodeGen(ctx, ev, x =>
      s"org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($ref.basis($x))")
  }
}
