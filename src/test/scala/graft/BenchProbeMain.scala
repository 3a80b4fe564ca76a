package graft

import org.apache.spark.sql.SparkSession

/** Dev probe: run named SparkEntry queries with full stack traces
  * (Bench swallows exceptions into -1; this is the diagnosis path).
  * Usage: Test/runMain graft.BenchProbeMain q20_sessionize q21_asof_join
  */
object BenchProbeMain {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val names = if (args.nonEmpty) args.toSeq else SparkEntry.queries.keys.toSeq.sorted
    // SPARK_GRAFT_PROBE_OUT=<dir>: also dump each query's parquet + the
    // oracle_sql.json subset, so tools/check_oracle.py can gate just the
    // probed queries without a full Verify run
    val outDir = sys.env.get("SPARK_GRAFT_PROBE_OUT")
    names.foreach { n =>
      val t0 = System.nanoTime()
      try {
        val df = SparkEntry.queries(n)(spark, sfDir)
        val c = outDir match {
          case Some(d) =>
            df.write.mode("overwrite").parquet(s"$d/$n"); df.count()
          case None => df.count()
        }
        println(f"PROBE $n OK rows=$c t=${(System.nanoTime() - t0) / 1e9}%.3f")
      } catch {
        case e: Throwable =>
          println(s"PROBE $n FAIL ${e.getClass.getName}: ${e.getMessage}")
          e.printStackTrace()
      }
    }
    outDir.foreach { d =>
      val subset = SparkEntry.oracleSql.filter { case (k, _) => names.contains(k) }
      val json = subset.map { case (k, v) =>
        "\"" + k + "\": " + com.fasterxml.jackson.databind.json.JsonMapper.builder()
          .build().writeValueAsString(v)
      }.mkString("{", ",\n", "}")
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"$d/oracle_sql.json"), json)
    }
    spark.stop()
  }
}
