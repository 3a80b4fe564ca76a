package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.stats.Battery

/** Dev probe harness (forked JVM — sbt console's layered classloader
  * can't load Spark encoders). Drives estimators on degenerate panels.
  */
object ProbeMain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val p = Battery.examplePanel(spark)

    def tryRun(label: String)(f: => stats.EstimateResult): Unit =
      try {
        val r = f
        println(s"$label => beta=${r.betaR} se=${r.seBetaR} warn=${r.tiltWarning}")
      } catch {
        case e: Throwable =>
          println(s"$label => ${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(140)}")
      }

    tryRun("ET_ALL_INTERNAL") { Battery.run("ET-WCLS", p.filter(col("is_internal"))) }
    tryRun("WCLS_TINY_40ROWS") { Battery.run("WCLS-Internal", p.filter(col("user_id") <= 2)) }
    tryRun("DR_SMALL") { Battery.run("DR-WCLS",
      p.filter(col("user_id") <= 50 || (col("user_id") > 400 && col("user_id") <= 450))) }

    if (args.contains("edge")) {
      try {
        val pr = graft.harness.SimulationRunner.perRepResults(
          spark, Seq(graft.harness.SimulationRunner.Cell(20, 20)), nReps = 1,
          methods = Seq("NOT-A-METHOD"))
        println("EDGE_UNKNOWN_METHOD_ROWS=" + pr.count())
      } catch { case e: Throwable => println("EDGE=" + e.getClass.getSimpleName + ": " + String.valueOf(e.getMessage).take(120)) }
      try {
        val m = graft.harness.SimulationRunner.metrics(
          graft.harness.SimulationRunner.perRepResults(
            spark, Seq(graft.harness.SimulationRunner.Cell(20, 20)), nReps = 1,
            methods = Seq("WCLS-Internal")))
        m.select("method", "coef", "empirical_se", "empirical_rel_efficiency").show(4, false)
      } catch { case e: Throwable => println("EDGE=" + e.getClass.getSimpleName + ": " + String.valueOf(e.getMessage).take(120)) }
    }

    if (args.contains("sim")) {
      val t0 = System.nanoTime()
      val perRep = graft.harness.SimulationRunner.perRepResults(
        spark, Seq(graft.harness.SimulationRunner.Cell(100, 100)), nReps = 20,
        methods = Seq("WCLS-Internal", "WCLS-Pooled", "PET-WCLS"))
      graft.harness.SimulationRunner.metrics(perRep)
        .select("coef", "method", "avg_estimate", "empirical_se", "coverage", "empirical_rel_efficiency")
        .show(20, false)
      println(f"SIM_WALL=${(System.nanoTime() - t0) / 1e9}%.1f s")
    }
    spark.stop()
  }
}
