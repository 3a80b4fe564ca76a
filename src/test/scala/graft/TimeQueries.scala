package graft

import org.apache.spark.sql.SparkSession

/** Ad-hoc per-query timing probe: `Test/runMain graft.TimeQueries q1 q2 …`
  * times each named SparkEntry query (repeats allowed) against
  * SPARK_GRAFT_SF_DIR (default sf0.1) at PROBE_CPUS (default 32). For
  * iterating on a single query's plan without paying a full Bench run.
  */
object TimeQueries {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("PROBE_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    args.foreach { name =>
      val t0 = System.nanoTime()
      val n = SparkEntry.queries(name)(spark, dir).count()
      println(f"$name rows=$n time=${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
