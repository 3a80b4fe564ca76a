package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{BooleanType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.BloomFilter

/** Native codegen'd Bloom-filter membership test over a string column
  * (SURVEY.md §2.12 custom-code preference order: codegen'd
  * `Expression` > UDF). The filter rides along as a BROADCAST handle —
  * the expression tree ships only the ~100-byte broadcast stub to every
  * task, not the multi-MB bit array, and the membership probe is a
  * direct method call inside whole-stage codegen (no ScalaUDF boxing,
  * no codegen-stage break).
  *
  * One-sided guarantee (the property BloomScrubSpec pins): NEVER false
  * on an inserted key — so `filter(bloom_might_contain(c))` is a SOUND
  * pre-filter whose survivors still require an exact confirm join, and
  * the composed result is exact. That shape (compact sketch broadcast
  * map-side, exact shuffle join only over survivors) is the 100 TB
  * seat of ContaminationQueries.bloomScrub.
  */
case class BloomMightContainExpr(child: Expression, bloom: Broadcast[BloomFilter])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"bloom_might_contain expects string input, got $t")
  }

  override def dataType: DataType = BooleanType

  override protected def withNewChildInternal(c: Expression): BloomMightContainExpr =
    copy(child = c)

  override def nullSafeEval(v: Any): Any =
    bloom.value.mightContainBinary(v.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloomBc", bloom, classOf[Broadcast[BloomFilter]].getName)
    defineCodeGen(ctx, ev, c =>
      s"((org.apache.spark.util.sketch.BloomFilter) $ref.value()).mightContainBinary($c.getBytes())")
  }
}

object BloomMightContainExpr {
  def apply(c: Column, bloom: Broadcast[BloomFilter]): Column =
    Bridge.toColumn(new BloomMightContainExpr(Bridge.toExpression(c), bloom))
}
