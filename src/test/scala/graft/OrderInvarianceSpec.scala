package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.stats.Battery

/** SURVEY.md §7.4.2: the reference encodes time by row position; the
  * engine must be invariant to row order and partitioning because the
  * cluster key is derived from explicit (t, user_id), not layout.
  */
class OrderInvarianceSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("WCLS estimates are invariant to row shuffling and repartitioning") {
    val panel = Battery.examplePanel(spark)
      .filter(col("user_id") <= 120 || (col("user_id") > 400 && col("user_id") <= 520))
    val base = Battery.run("WCLS-Pooled", panel)
    val shuffled = Battery.run("WCLS-Pooled",
      panel.repartition(17, col("x3")).sortWithinPartitions("y"))
    for (i <- 0 until 2) {
      assert(math.abs(base.betaR(i) - shuffled.betaR(i)) < 1e-9,
        s"beta[$i]: ${base.betaR(i)} vs ${shuffled.betaR(i)}")
      assert(math.abs(base.seBetaR(i) - shuffled.seBetaR(i)) < 1e-9,
        s"se[$i]: ${base.seBetaR(i)} vs ${shuffled.seBetaR(i)}")
    }
  }
}
