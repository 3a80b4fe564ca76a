package graft.stats

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** R `splines::bs(x, df, degree)` replicated for Catalyst (SURVEY.md P14).
  *
  * Semantics (reference: etwcls.R:115-123 tilt formulas):
  *  - interior knots at type-7 quantiles of x (df - degree of them),
  *  - boundary knots at min/max, each repeated degree+1 times,
  *  - full Cox-de Boor basis of the given degree, first column dropped
  *    (bs() default intercept=FALSE).
  *
  * Knots are computed in one distributed pass (`percentile` is Spark's
  * exact interpolating percentile = R type 7; min/max in the same agg),
  * then baked into the per-row basis evaluation as literals.
  */
final case class BSpline(knots: Array[Double], degree: Int, nBasis: Int) {

  /** Evaluate the (dropped-intercept) basis at x: nBasis columns. */
  def basis(x: Double): Array[Double] = {
    val t = knots
    val nb0 = t.length - 1
    var bc = new Array[Double](nb0)
    var j = 0
    while (j < nb0) {
      bc(j) = if (t(j) < t(j + 1) && x >= t(j) && x < t(j + 1)) 1.0 else 0.0
      j += 1
    }
    // right-closed at the last distinct knot
    if (x == t(t.length - 1)) {
      var last = -1
      var k = 0
      while (k < t.length - 1) { if (t(k) < t(t.length - 1)) last = k; k += 1 }
      if (last >= 0) bc(last) = 1.0
    }
    var deg = 1
    while (deg <= degree) {
      val bn = new Array[Double](t.length - deg - 1)
      var i = 0
      while (i < bn.length) {
        var v = 0.0
        if (t(i + deg) > t(i)) v += (x - t(i)) / (t(i + deg) - t(i)) * bc(i)
        if (t(i + deg + 1) > t(i + 1)) v += (t(i + deg + 1) - x) / (t(i + deg + 1) - t(i + 1)) * bc(i + 1)
        bn(i) = v
        i += 1
      }
      bc = bn
      deg += 1
    }
    // drop first basis function (intercept=FALSE)
    val out = new Array[Double](nBasis)
    var m = 0
    while (m < nBasis) { out(m) = bc(m + 1); m += 1 }
    out
  }

  /** Basis as nBasis named Catalyst columns via the native codegen'd
    * expression (graft.functions.BSplineBasisExpr — same kernel, no UDF
    * boxing; subexpression elimination collapses the per-item extracts
    * to one basis evaluation per row). */
  def designOf(prefix: String, x: Column): Design = {
    val arrCol = org.apache.spark.sql.graft.Bridge.toColumn(
      graft.functions.BSplineBasisExpr(
        org.apache.spark.sql.graft.Bridge.toExpression(x.cast("double")), this))
    Design((0 until nBasis).map(j => (s"$prefix$j", arrCol.getItem(j))))
  }
}

object BSpline {
  /** Fit knots from data in one pass; mirrors bs(x, df=, degree=). */
  def fit(df: DataFrame, x: Column, dfParam: Int, degree: Int): BSpline = {
    val nInterior = dfParam - degree
    val probs = (1 to nInterior).map(i => i.toDouble / (nInterior + 1))
    val aggs = Seq(min(x).cast("double"), max(x).cast("double")) ++
      probs.map(p => percentile(x, lit(p)).cast("double"))
    val row = df.select(aggs: _*).head()
    val lo = row.getDouble(0); val hi = row.getDouble(1)
    val interior = (0 until nInterior).map(i => row.getDouble(2 + i))
    val knots = Array.fill(degree + 1)(lo) ++ interior ++ Array.fill(degree + 1)(hi)
    BSpline(knots, degree, dfParam)
  }
}
