package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Dev probe: per-STAGE task-duration spread for the d2 grid-blocked
  * mine on the skew corpus — attributes the query-level max task to
  * the stage that owns it. `Test/runMain graft.ProbeD2Stages [dir]`.
  */
object ProbeD2Stages {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_skew_200000")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val byStage = scala.collection.mutable.Map
      .empty[Int, scala.collection.mutable.ArrayBuffer[Long]]
    val names = scala.collection.mutable.Map.empty[Int, String]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(te: SparkListenerTaskEnd): Unit = synchronized {
        byStage.getOrElseUpdate(te.stageId,
          scala.collection.mutable.ArrayBuffer.empty[Long]) += te.taskInfo.duration
      }
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit =
        synchronized {
          names(sc.stageInfo.stageId) =
            sc.stageInfo.name.take(60) + " | " +
              sc.stageInfo.details.linesIterator.take(1).mkString.take(80)
        }
    })

    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val t0 = System.nanoTime()
    val n = graft.operators.DedupQueries.minHashPairs(docs, saltAbove = 0L).count()
    println(f"[probe] rows=$n wall=${(System.nanoTime() - t0) / 1e9}%.1f s")
    Thread.sleep(1000)
    byStage.toSeq.sortBy(-_._2.max).take(12).foreach { case (sid, ds) =>
      val s = ds.sorted
      println(f"[stage $sid%4d] tasks=${s.size}%4d med=${s(s.size / 2)}%6d ms " +
        f"max=${s.last}%6d ms  ${names.getOrElse(sid, "?")}")
    }
    spark.stop()
  }
}
