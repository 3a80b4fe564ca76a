package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.stats.{Battery, LocalBattery}

/** The executor-local battery must reproduce the same goldens as the
  * distributed one (example_estimates.csv on example_dat.csv), loading
  * rows in the reference's order.
  */
class LocalGoldenSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

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

  private lazy val panel: LocalBattery.Panel = {
    val rows = Battery.examplePanel(spark)
      .orderBy("_rowidx")
      .select("y", "a", "x1", "x2", "x3", "p_h", "p_h_a", "is_internal", "user_id")
      .collect()
    LocalBattery.Panel(
      rows.map(_.getDouble(0)), rows.map(_.getDouble(1)), rows.map(_.getDouble(2)),
      rows.map(_.getDouble(3)), rows.map(_.getDouble(4)), rows.map(_.getDouble(5)),
      rows.map(_.getDouble(6)), rows.map(_.getBoolean(7)), rows.map(_.getLong(8)))
  }

  for (method <- LocalBattery.methodNames) {
    test(s"local $method reproduces example_estimates.csv") {
      val r = LocalBattery.run(method, panel)
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
