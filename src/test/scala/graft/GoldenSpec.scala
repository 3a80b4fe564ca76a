package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.stats.Battery

/** Cross-implementation golden test (SURVEY.md §5.2b, BASELINE.md target 1):
  * run every estimator on the reference's committed example_dat.csv (same
  * input bytes, independent math stack) and require the published
  * estimates/SEs of example_estimates.csv at printed precision.
  */
class GoldenSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .appName("golden")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  // example_estimates.csv, transposed: method -> (est, se) x (Intercept, Slope)
  private val golden: Map[String, Seq[(Double, Double)]] = Map(
    "WCLS-Internal"     -> Seq((-1.876, 1.259), (6.355, 1.379)),
    "WCLS-Pooled"       -> Seq((-0.738, 0.751), (4.281, 0.794)),
    "P-WCLS-Internal"   -> Seq((-1.814, 1.276), (6.321, 1.385)),
    "P-WCLS-Pooled"     -> Seq((-2.363, 0.98), (6.07, 0.994)),
    "P-WCLS-Pooled-Obs" -> Seq((-2.441, 0.988), (6.272, 1.037)),
    "ET-WCLS-Equal"     -> Seq((-1.802, 1.514), (5.688, 1.682)),
    "ET-WCLS-Kron"      -> Seq((-1.826, 1.238), (5.924, 1.365)),
    "ET-WCLS"           -> Seq((-2.003, 1.11), (6.028, 1.22)),
    "DR-WCLS"           -> Seq((-2.164, 1.157), (5.944, 1.286)),
    "PET-WCLS"          -> Seq((-2.561, 0.964), (5.817, 0.959)))

  private lazy val panel = Battery.examplePanel(spark).cache()

  for (method <- Battery.methodNames) {
    test(s"$method reproduces example_estimates.csv") {
      val r = Battery.run(method, panel)
      val want = golden(method)
      for (i <- 0 until 2) {
        val (est, se) = want(i)
        assert(math.abs(r.betaR(i) - est) < 5e-4 + 1e-9,
          s"estimate[$i]: got ${r.betaR(i)}, want $est")
        assert(math.abs(r.seBetaR(i) - se) < 5e-4 + 1e-9,
          s"se[$i]: got ${r.seBetaR(i)}, want $se")
      }
    }
  }
}
