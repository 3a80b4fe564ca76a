package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off decomposition probe for v6_pq_ann stage costs. */
object ProbePq {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val emb = graft.sources.Tables.embeddings(spark, dir)
    println("emb rows=" + t("emb count") { emb.count() })
    t("probe run 1") { graft.operators.VectorQueries.vPqAnn.fn(spark, dir).count() }
    t("probe run 2") { graft.operators.VectorQueries.vPqAnn.fn(spark, dir).count() }
    spark.stop()
  }
}
