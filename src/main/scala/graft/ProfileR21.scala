package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** r21 optimization-round measurement harness (guide §1): phase-level
  * wall/job/stage/task breakdown of the expensive lifecycle queries, and
  * a generic per-query job-count profile. Dev tool only — never on any
  * query path; Bench/Verify are untouched.
  *
  * Usage:
  *   sbt "runMain graft.ProfileR21 p12"       phase breakdown of p12
  *   sbt "runMain graft.ProfileR21 q <name>"  generic profile of a query
  */
object ProfileR21 {

  final class Counters extends SparkListener {
    val jobs = new java.util.concurrent.atomic.AtomicInteger
    val stages = new java.util.concurrent.atomic.AtomicInteger
    val tasks = new java.util.concurrent.atomic.AtomicInteger
    val taskMs = new java.util.concurrent.atomic.AtomicLong
    override def onJobStart(j: SparkListenerJobStart): Unit = { jobs.incrementAndGet(); () }
    override def onStageCompleted(st: SparkListenerStageCompleted): Unit = { stages.incrementAndGet(); () }
    override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
      tasks.incrementAndGet(); taskMs.addAndGet(t.taskInfo.duration); ()
    }
    def snap: (Int, Int, Int, Long) = (jobs.get, stages.get, tasks.get, taskMs.get)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val b0 = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
    val b = if (sys.env.get("GRAFT_PROF_CONF").contains("1"))
      b0.config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
    else b0
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val c = new Counters
    spark.sparkContext.addSparkListener(c)

    def phase[T](name: String)(f: => T): T = {
      System.gc()
      val (j0, s0, t0, m0) = c.snap
      val w0 = System.nanoTime()
      val r = f
      val w = (System.nanoTime() - w0) / 1e9
      // listener events are async; give the bus a beat to drain
      Thread.sleep(150)
      val (j1, s1, t1, m1) = c.snap
      println(f"[phase] $name%-38s wall=$w%7.3f s jobs=${j1 - j0}%3d stages=${s1 - s0}%3d tasks=${t1 - t0}%5d taskTime=${(m1 - m0) / 1000.0}%8.2f s")
      r
    }

    args.headOption.getOrElse("p12") match {
      case "explain" =>
        // dump .explain("formatted") for the named queries to plans/r21/
        val suffix = args(1) // "before" | "after"
        val names = args.drop(2)
        val dir = java.nio.file.Paths.get("plans/r21")
        java.nio.file.Files.createDirectories(dir)
        names.foreach { n =>
          val fn = SparkEntry.queries(n)
          val df = fn(spark, sfDir)
          val txt = df.queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)
          java.nio.file.Files.writeString(dir.resolve(s"${n}_$suffix.txt"), txt)
          println(s"[explain] wrote ${n}_$suffix.txt (${txt.length} chars)")
        }

      case "jobs" =>
        // one warm + one traced run; prints every job's callsite +
        // description so redundant actions are attributable to code
        val name = args(1)
        val fn = SparkEntry.queries.collectFirst {
          case (n, f) if n == name || n.startsWith(name + "_") => f }.get
        fn(spark, sfDir).count()
        val lines = new java.util.concurrent.ConcurrentLinkedQueue[String]()
        val jl = new SparkListener {
          override def onJobStart(j: SparkListenerJobStart): Unit = {
            val cs = j.stageInfos.lastOption.map(_.name).getOrElse("?")
            val nt = j.stageInfos.map(_.numTasks).sum
            lines.add(f"[job] ${j.jobId}%4d stages=${j.stageInfos.size}%2d tasks=$nt%4d  $cs")
            ()
          }
        }
        spark.sparkContext.addSparkListener(jl)
        fn(spark, sfDir).count()
        Thread.sleep(300)
        lines.forEach(l => println(l))

      case "q" =>
        // q <name> [<name> ...] — several queries per JVM so startup is
        // paid once; 2 timed reps each after an untimed-by-name warm
        args.drop(1).foreach { name =>
          val fn = SparkEntry.queries.collectFirst {
            case (n, f) if n == name || n.startsWith(name + "_") => f }.get
          phase(s"$name warm")(fn(spark, sfDir).count())
          (1 to 2).foreach { i => phase(s"$name rep$i")(fn(spark, sfDir).count()) }
        }

      case "p12" =>
        import graft.operators.{PipelineQueries => PQ, UrlQueries, Scaffold}
        import graft.sources.{Tables, IndexStore, IncrementalRelease}
        (1 to 3).foreach { rep =>
          println(s"== p12 rep $rep ==")
          val docs = Tables.documents(spark, sfDir)
          val withUrl = docs.withColumn("url", Scaffold.messyUrlFunnel)
          val day1 = withUrl.filter(col("doc_id") < 400L)
          val inc = withUrl.filter(col("doc_id") >= 400L)
          val root = PQ.fuzzyReleaseRoot(spark, sfDir)
          val srcStamp = phase("sourceStamp")(IndexStore.sourceStamp(spark, s"$sfDir/documents.parquet"))
          val urlPath = IndexStore.indexPath(sfDir, "p12_urlcanon_lt400")
          phase("ensure url index")(IndexStore.ensure(spark, urlPath,
            s"v2|corpus=(doc_id < 400)|inject=funnelv2|src=$srcStamp") {
            UrlQueries.initStoredUrlIndex(spark, urlPath, day1.select(col("doc_id"), col("url")))
          })
          val fzPath = IndexStore.indexPath(sfDir, "p12_fuzzyrel_lt400")
          phase("ensure fz index")(IndexStore.ensure(spark, fzPath,
            s"v3|boundary=400|probe=250|corpus=500|thr=0.4|inject=funnelv2|src=$srcStamp") {
            PQ.initFuzzyMineIndex(spark, fzPath, day1)
          })
          def tbl(n: String) = IndexStore.readSwappable(spark, fzPath, n)
          val canon1 = day1.drop("url").join(tbl("canonids"), "doc_id")
          val rel1 = phase("day1 fuzzyReleasedByGrams (lazy)")(
            PQ.fuzzyReleasedByGrams(tbl("evalgrams"), canon1, tbl("pairs")))
          phase("day1 publishFull")(IncrementalRelease.publishFull(rel1, root))
          val asm = phase("day2 fuzzyStoredAssembly")(
            PQ.fuzzyStoredAssembly(spark, urlPath, fzPath, root, inc))
          val rel2 = phase("day2 fuzzyReleasedByGrams (lazy)")(
            PQ.fuzzyReleasedByGrams(PQ.fuzzyStoredEvalGrams(spark, fzPath, inc),
              asm.canon, asm.pairs))
          phase("day2 publishDelta")(IncrementalRelease.publishDelta(rel2, root))
        }

      case "p12d" =>
        import graft.operators.{PipelineQueries => PQ, UrlQueries, Scaffold, DedupClusters}
        import graft.sources.{Tables, IndexStore, IncrementalRelease}
        val docs = Tables.documents(spark, sfDir)
        val withUrl = docs.withColumn("url", Scaffold.messyUrlFunnel)
        val day1 = withUrl.filter(col("doc_id") < 400L)
        val inc = withUrl.filter(col("doc_id") >= 400L)
        val root = PQ.fuzzyReleaseRoot(spark, sfDir)
        val srcStamp = IndexStore.sourceStamp(spark, s"$sfDir/documents.parquet")
        val urlPath = IndexStore.indexPath(sfDir, "p12_urlcanon_lt400")
        IndexStore.ensure(spark, urlPath,
          s"v2|corpus=(doc_id < 400)|inject=funnelv2|src=$srcStamp") {
          UrlQueries.initStoredUrlIndex(spark, urlPath, day1.select(col("doc_id"), col("url")))
        }
        val fzPath = IndexStore.indexPath(sfDir, "p12_fuzzyrel_lt400")
        IndexStore.ensure(spark, fzPath,
          s"v3|boundary=400|probe=250|corpus=500|thr=0.4|inject=funnelv2|src=$srcStamp") {
          PQ.initFuzzyMineIndex(spark, fzPath, day1)
        }
        def tbl(n: String) = IndexStore.readSwappable(spark, fzPath, n)
        val canon1 = day1.drop("url").join(tbl("canonids"), "doc_id")
        IncrementalRelease.publishFull(
          PQ.fuzzyReleasedByGrams(tbl("evalgrams"), canon1, tbl("pairs")), root)
        (1 to 2).foreach { rep =>
          println(s"== p12 day-2 detail rep $rep ==")
          val asm = phase("assembly")(
            PQ.fuzzyStoredAssembly(spark, urlPath, fzPath, root, inc))
          val evalG = phase("storedEvalGrams (construct)")(
            PQ.fuzzyStoredEvalGrams(spark, fzPath, inc))
          val cc = phase("connectedComponents")(
            DedupClusters.connectedComponents(asm.pairs.select("a", "b")))
          val kb = phase("keepBest")(
            DedupClusters.keepBest(asm.canon, cc))
          phase("keepBest count")(kb.count())
          val st = phase("fuzzyStages construct")(
            PQ.fuzzyStagesFromCanonGrams(evalG, asm.canon, asm.pairs, 10000000L))
          phase("released count")(st.released.count())
          phase("publishDelta")(IncrementalRelease.publishDelta(
            st.released.withColumn("split", graft.operators.SampleQueries.splitCol), root))
        }

      case "p10" =>
        phase("p10 warm")(SparkEntry.queries("p10_incremental_release")(spark, sfDir).count())
        (1 to 2).foreach { i => phase(s"p10 rep$i")(SparkEntry.queries("p10_incremental_release")(spark, sfDir).count()) }

      case other =>
        val fn = SparkEntry.queries.collectFirst { case (n, f) if n.startsWith(other) => f }.get
        phase(s"$other warm")(fn(spark, sfDir).count())
        (1 to 2).foreach { i => phase(s"$other rep$i")(fn(spark, sfDir).count()) }
    }
    spark.stop()
  }
}
