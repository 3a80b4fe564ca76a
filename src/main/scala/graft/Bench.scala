package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Headline = the scale-sensitive queries. s4/s5/s6 run fixed-size
    // statistical workloads on the committed golden panel (constant time
    // regardless of sf) — correctness-gated via Verify + GoldenSpec, not
    // throughput benchmarks, so they are excluded here.
    val headline = SparkEntry.queries -- Seq(
      "s4_estimator_battery", "s5_awcls", "s6_aic_ladder")
    // JVM/codegen warm-up so the first timed query isn't charged for it:
    // one relational shape, one aggregation shape, and one tiny harness
    // battery (the generator + LocalBattery JIT otherwise lands entirely
    // on whichever h-query happens to run first)
    try {
      SparkEntry.queries("q13_case_bucket")(spark, sfDir).count()
      SparkEntry.queries("q1_pricing_summary")(spark, sfDir).count()
      graft.harness.SimulationRunner.perRepResults(
        spark, Seq(graft.harness.SimulationRunner.Cell(5, 5)), nReps = 1,
        methods = Seq("WCLS-Internal")).count()
    } catch { case scala.util.control.NonFatal(_) => () }
    val results = headline.map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() }
      catch { case scala.util.control.NonFatal(_) => -1L }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
