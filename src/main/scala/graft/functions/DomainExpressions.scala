package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Frozen public-suffix rule snapshot — the stored-table discipline
  * (t19 vocab / PQ codebooks): the rule list is a versioned published
  * artifact (a PSL snapshot), persisted once via IndexStore and
  * injected as a driver-frozen reference object; a production deploy
  * swaps in the real ~9k-rule publicsuffix.org snapshot with zero code
  * change (the kernel is rule-count-agnostic; lookup is a hash set).
  *
  * Registered-domain (eTLD+1) extraction: host = the URL authority
  * (between "://" and the next '/'); labels = host split on '.'; the
  * LONGEST trailing label sequence present in the rule set is the
  * public suffix, and the registered domain is that suffix plus one
  * more label. No rule matching ⇒ the PSL's implicit '*' default: the
  * last two labels (the host itself when it has only one). Wildcard
  * (`*.ck`) and exception (`!www.ck`) PSL rule forms are NOT
  * implemented — the snapshot stored here contains none.
  */
final class SuffixRules(val rules: Array[String]) extends Serializable {

  @transient private lazy val set: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String](rules.length * 2)
    rules.foreach(s.add)
    s
  }

  @transient private lazy val maxLabels: Int =
    if (rules.isEmpty) 0 else rules.map(_.count(_ == '.') + 1).max

  /** url (string) → registered domain (see class doc). */
  def registeredDomain(url: UTF8String): UTF8String = {
    val s = url.toString
    val schemeEnd = s.indexOf("://")
    val hostStart = if (schemeEnd >= 0) schemeEnd + 3 else 0
    var hostEnd = s.indexOf('/', hostStart)
    if (hostEnd < 0) hostEnd = s.length
    val host = s.substring(hostStart, hostEnd)
    val labels = host.split('.')
    val n = labels.length
    // longest-match first; a rule never consumes the whole host (the
    // registrable part needs one label left)
    var k = math.min(maxLabels, n - 1)
    while (k >= 1) {
      val suffix = labels.slice(n - k, n).mkString(".")
      if (set.contains(suffix))
        return UTF8String.fromString(labels.slice(n - k - 1, n).mkString("."))
      k -= 1
    }
    UTF8String.fromString(
      if (n >= 2) labels.slice(n - 2, n).mkString(".") else host)
  }
}

/** url string → eTLD+1 registered domain against a frozen
  * [[SuffixRules]] snapshot — native codegen'd expression (the
  * BpeStats discipline: one kernel call per row, reference-object
  * rule table). */
case class RegisteredDomain(child: Expression, rules: SuffixRules)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"registered_domain expects string, got $t")
  }

  override def dataType: DataType = StringType

  override protected def withNewChildInternal(c: Expression): RegisteredDomain =
    copy(child = c)

  override def nullSafeEval(a: Any): Any =
    rules.registeredDomain(a.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val r = ctx.addReferenceObj("suffixRules", rules, classOf[SuffixRules].getName)
    defineCodeGen(ctx, ev, x => s"$r.registeredDomain($x)")
  }
}

object DomainExpressions {
  /** Column-level registered-domain extraction over a URL column. */
  def registeredDomain(url: Column, rules: SuffixRules): Column =
    org.apache.spark.sql.graft.Bridge.toColumn(
      RegisteredDomain(org.apache.spark.sql.graft.Bridge.toExpression(url), rules))
}
