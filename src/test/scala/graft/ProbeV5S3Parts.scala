package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Dev probe for the r18→r19 v5/s3 watch items: decompose each query's
  * wall time into its driver half (sample collect + local k-means fit;
  * IRLS iteration loop) vs the cluster half, on the same warm session
  * the bench uses —
  *   SPARK_GRAFT_SF_DIR=… Test/runMain graft.ProbeV5S3Parts
  * Output is PART lines (seconds, min of 3 after a warm pass).
  */
object ProbeV5S3Parts {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def timed(name: String)(body: => Unit): Unit = {
      body // warm
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
      }
      println(f"PART $name min=${ts.min}%.3f all=${ts.map(t => f"$t%.3f").mkString(",")}")
    }

    // ---- v5 halves -----------------------------------------------------
    val emb = Tables.embeddings(spark, sfDir).select(col("vec_id"), col("embedding"))
    timed("v5_sample_collect") {
      val step = math.max(1L, emb.count() / 1000L)
      emb.filter(col("vec_id") % step === 0).orderBy("vec_id").limit(2000)
        .select(col("embedding")).collect()
    }
    val sample = {
      val step = math.max(1L, emb.count() / 1000L)
      emb.filter(col("vec_id") % step === 0).orderBy("vec_id").limit(2000)
        .select(col("embedding")).collect()
        .map(_.getSeq[Float](0).map(_.toDouble).toArray)
    }
    timed("v5_local_kmeans_fit") {
      graft.operators.LocalKMeans.fit(sample, k = 16, iters = 10, seed = 42L)
    }
    timed("v5_full_query") {
      SparkEntry.queries("v5_ivf_ann")(spark, sfDir).count()
    }

    // ---- s3 halves -----------------------------------------------------
    val li = Tables.lineitem(spark, sfDir)
      .select(col("l_quantity"), col("l_discount"), col("l_returnflag"))
    timed("s3_stage_materialize") { li.count() }
    timed("s3_full_query") {
      SparkEntry.queries("s3_logistic_irls")(spark, sfDir).count()
    }
    spark.stop()
  }
}
