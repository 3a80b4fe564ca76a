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

  override def nullable: Boolean = true

  // null on length mismatch or null elements — matching the HOF
  // aggregate(zip_with(...)) formulation's null propagation
  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (x.numElements() != y.numElements()) return null
    val lf = isFloat(left.dataType); val rf = isFloat(right.dataType)
    val n = x.numElements()
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
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
         |if ($x.numElements() != $y.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $n = $x.numElements();
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($x.isNullAt($i) || $y.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $acc += ($getX) * ($getY);
         |  }
         |  ${ev.value} = $acc;
         |}
       """.stripMargin
    })
}

/** 64-bit SimHash over a token array: per-token xxhash64 (seed 42,
  * matching Spark's xxhash64 function), sign-sum per bit, bits packed
  * into a long. Replaces a 64-lambda nested-HOF formulation with one
  * native expression; codegen emits a single static call so the row
  * stays inside whole-stage codegen.
  */
case class SimHash64(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(org.apache.spark.sql.types.StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"simhash64 expects array<string>, got $t")
  }

  override def dataType: DataType = org.apache.spark.sql.types.LongType

  override protected def withNewChildInternal(c: Expression): SimHash64 = copy(child = c)

  override def nullSafeEval(a: Any): Any =
    SimHash64.compute(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, x => s"graft.functions.SimHash64.compute($x)")
}

object SimHash64 {
  /** Static kernel shared by interpreted eval and generated code. */
  def compute(tokens: ArrayData): Long = {
    val counts = new Array[Int](64)
    val n = tokens.numElements()
    var i = 0
    while (i < n) {
      val s = tokens.getUTF8String(i)
      val h = org.apache.spark.sql.catalyst.expressions.XxHash64Function.hash(
        s, org.apache.spark.sql.types.StringType, 42L)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
        b += 1
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (counts(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }
}

object VectorExpressions {
  /** Column-level dot product over array<float> columns. */
  def fdot(a: Column, b: Column): Column =
    org.apache.spark.sql.graft.Bridge.toColumn(
      DotProduct(org.apache.spark.sql.graft.Bridge.toExpression(a),
        org.apache.spark.sql.graft.Bridge.toExpression(b)))

  /** Column-level 64-bit SimHash over an array<string> token column. */
  def simhash64(tokens: Column): Column =
    org.apache.spark.sql.graft.Bridge.toColumn(
      SimHash64(org.apache.spark.sql.graft.Bridge.toExpression(tokens)))
}
