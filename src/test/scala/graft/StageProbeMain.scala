package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Dev probe: per-STAGE task distribution of one query run — stage id,
  * task count, wall, executor-runtime sum, and max/median task time —
  * the diagnosis layer under SkewBench's per-query task stats (which
  * stage owns the straggler?). Usage:
  *   Test/runMain graft.StageProbeMain d12long [nDocs]   # long-doc d12
  *   Test/runMain graft.StageProbeMain <query_name>      # sf0.1 query
  */
object StageProbeMain {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    final case class St(name: String, tasks: Int, wallMs: Long, runMs: Long,
                        taskMs: scala.collection.mutable.ArrayBuffer[Long])
    val stages = scala.collection.concurrent.TrieMap.empty[Int, St]
    val taskMs = scala.collection.concurrent.TrieMap
      .empty[Int, scala.collection.mutable.ArrayBuffer[Long]]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(te: SparkListenerTaskEnd): Unit =
        taskMs.getOrElseUpdate(te.stageId,
          scala.collection.mutable.ArrayBuffer.empty[Long]).synchronized {
          taskMs(te.stageId) += te.taskInfo.duration
        }
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        stages(si.stageId) = St(si.name.split("\n").head.take(80), si.numTasks,
          si.completionTime.getOrElse(0L) - si.submissionTime.getOrElse(0L),
          si.taskMetrics.executorRunTime,
          taskMs.getOrElse(si.stageId, scala.collection.mutable.ArrayBuffer.empty))
      }
    })
    val t0 = System.nanoTime()
    val rows = args.headOption match {
      case Some("d12long") =>
        val n = args.lift(1).getOrElse("5000")
        val docs = spark.read.parquet(s"/tmp/graft_skew_long_$n/documents.parquet")
        graft.operators.DedupQueries.dupSubstringsOf(docs, 50).count()
      case Some(q) =>
        SparkEntry.queries(q)(spark,
          sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")).count()
      case None => sys.error("usage: StageProbeMain d12long|<query> [nDocs]")
    }
    println(f"TOTAL rows=$rows wall=${(System.nanoTime() - t0) / 1e9}%.1fs")
    Thread.sleep(1000)
    stages.toSeq.sortBy(-_._2.wallMs).take(10).foreach { case (id, s) =>
      val ts = s.taskMs.sorted
      val med = if (ts.isEmpty) 0L else ts(ts.size / 2)
      val mx = if (ts.isEmpty) 0L else ts.last
      println(f"stage=$id%-4d tasks=${s.tasks}%-4d wall=${s.wallMs / 1000.0}%6.1fs " +
        f"cpu=${s.runMs / 1000.0}%7.1fs taskMed=${med}ms taskMax=${mx}ms  ${s.name}")
    }
    spark.stop()
  }
}
