package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.ClassifierQueries
import graft.stats.Glm

/** t16_quality_classifier semantics (the pin only freezes bytes):
  * the fit converges without separation, the model actually LEARNS
  * (accuracy beats the majority-class baseline), probabilities are
  * proper, and the whole query is deterministic across runs.
  */
class QualityClassifierSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val dir = "/root/testdata/sf0.01"

  test("IRLS converges cleanly and the classifier beats the base rate") {
    val base = ClassifierQueries.featureFrame(spark, dir)
    val fit = Glm.logistic(base, ClassifierQueries.design, col("y"))
    assert(fit.converged, "IRLS did not converge")
    assert(!fit.warning, "separation warning on a non-separable fit")
    assert(fit.coef.toArray.forall(v => !v.isNaN && !v.isInfinite))

    val out = ClassifierQueries.tQualityClassifier.fn(spark, dir)
      .select(col("label"), col("keep")).collect()
      .map(r => (r.getLong(0) == 1L, r.getBoolean(1)))
    val n = out.length.toDouble
    val acc = out.count { case (y, k) => y == k } / n
    val baseRate = math.max(out.count(_._1), out.count(!_._1)) / n
    assert(acc > baseRate + 0.05,
      s"classifier learned nothing: acc=$acc vs majority baseline=$baseRate")
    assert(acc > 0.7, s"acc=$acc")
  }

  test("probabilities are proper and the output is deterministic") {
    def run() = ClassifierQueries.tQualityClassifier.fn(spark, dir)
      .collect().map(_.toSeq).toSeq
    val a = run()
    assert(a.forall { r =>
      val p = r(2).asInstanceOf[Double]; p > 0.0 && p < 1.0
    })
    assert(a == run())
  }
}
