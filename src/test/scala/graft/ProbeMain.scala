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
    spark.stop()
  }
}
