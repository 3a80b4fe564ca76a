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
    val all = SparkEntry.queries -- Seq(
      "s4_estimator_battery", "s5_awcls", "s6_aic_ladder")
    // Optional focused run (comma-separated full query names): extends a
    // committed multi-launch record with queries added AFTER the record
    // was taken, under the identical warm + min-of-reps protocol,
    // without re-running the whole catalog.
    val headline = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
      .fold(all) { sel =>
        // a typo'd / stale selector name would otherwise silently
        // shrink the run — a focused re-measure that measures nothing
        // must FAIL, not appear to succeed (r15 ADVICE #3)
        val unknown = sel -- all.keySet
        require(unknown.isEmpty,
          s"SPARK_GRAFT_BENCH_ONLY names not in the bench catalog: " +
            s"${unknown.toSeq.sorted.mkString(", ")}")
        all.view.filterKeys(sel).toMap
      }
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
    // Deterministic measurement (VERDICT r6 finding #2): queries run in
    // sorted-name order (Map iteration order varied run-to-run, so JIT /
    // page-cache warm-up landed on different queries each round), each
    // timed over `reps` runs keeping the MIN of the SUCCESSFUL reps —
    // the min is the stable estimator of the query's intrinsic cost
    // under one-off GC/JIT noise; a failed rep must never become the
    // min (a fast crash is not a fast query), and all-failed reports -1.
    // Memo state is restored between reps so a rep that populated the
    // dedup pairs memos does not turn the next rep into a cached scan;
    // cross-query reuse (d5/d6 reading d2/d4's pairs) stays exactly as
    // a single sequential run would see it.
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "2").toInt.max(1)
    // Load-robustness (VERDICT r7 #3): min-of-reps rejects one-off GC/JIT
    // spikes but not a machine that is busy for the whole run, so (a) each
    // query gets an UNTIMED warm pass before its timed reps — per-query
    // codegen (Janino) and JIT are paid there, not in the measurement —
    // and (b) the 1-minute load average is sampled before and after and
    // recorded in the JSON, so a polluted run is detectable after the
    // fact instead of masquerading as a regression (r7 shipped a 5.8×
    // phantom on s3 this way).
    def loadAvg(): Double =
      try {
        val src = scala.io.Source.fromFile("/proc/loadavg")
        try src.mkString.split(" ")(0).toDouble finally src.close()
      } catch { case scala.util.control.NonFatal(_) => -1.0 }
    val loadStart = loadAvg()
    val results: Seq[(String, Double)] =
      headline.toSeq.sortBy(_._1).map { case (name, fn) =>
        val memoBefore = graft.operators.DedupQueries.memoState()
        try { fn(spark, sfDir).count() } // warm pass — never timed
        catch {
          case scala.util.control.NonFatal(e) =>
            // a -1 in the JSON is undiagnosable from the driver's tail
            // capture alone (r11: q20/q21 silently -1 for a round);
            // stderr carries the cause without touching the JSON line
            System.err.println(s"[bench] $name warm pass failed: " +
              s"${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(300)}")
        }
        // Measurement isolation (r15): staged frames (eager
        // localCheckpoints) pin executor storage blocks until a JVM GC
        // lets the ContextCleaner reclaim them — across a 100+-query
        // run the accumulated blocks degrade LATE queries by 50%+ (the
        // t/v/x families measured 1.6× their fresh-JVM cost while early
        // families were unaffected). A GC nudge before each query's
        // timed reps drains the previous queries' dead blocks so every
        // query measures in comparable JVM state — the state a
        // production job (one query per application) actually sees.
        // Runs OUTSIDE the timed region; the min-of-reps discipline is
        // unchanged.
        System.gc()
        val times = (1 to reps).flatMap { _ =>
          // every timed rep (incl. the first, which now follows the warm
          // pass) starts from the pre-query memo state, so no rep scans
          // a cache the sequential run would have had to build
          graft.operators.DedupQueries.restoreMemoState(memoBefore)
          val t0 = System.nanoTime()
          try { fn(spark, sfDir).count(); Some((System.nanoTime() - t0) / 1e9) }
          catch { case scala.util.control.NonFatal(_) => None }
        }
        name -> times.minOption.getOrElse(-1.0)
      }
    val loadEnd = loadAvg()
    // The driver captures only the LAST ~2000 chars of the run's output
    // and parses the JSON line out of that tail: full query names at
    // nanosecond precision made the line ~2900 chars, so every round's
    // BENCH artifact shipped with the line's head clipped and
    // parsed=null. Emit the spec's compact form instead — short query
    // keys (the unique id prefix: q1, v6, t11...) and millisecond
    // precision — which keeps the whole line under ~1000 chars. The
    // full-name/full-precision map goes to BENCH_LOCAL.json (gitignored)
    // for local inspection.
    def fmt(v: Double): String =
      if (v < 0) "-1" else String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    def shortKey(name: String): String = name.takeWhile(_ != '_')
    val collisions = results.groupBy { case (k, _) => shortKey(k) }
      .collect { case (_, vs) if vs.size > 1 => vs.map(_._1) }.flatten.toSet
    val qs = results.map { case (k, v) =>
      val key = if (collisions(k)) k else shortKey(k)
      "\"" + key + "\":" + fmt(v)
    }.mkString("{", ",", "}")
    // failed queries report -1 in `queries` but must not SUBTRACT from
    // the total (r11 shipped total=55.8 with two -1s folded in)
    val total = results.map(_._2).filter(_ >= 0).sum
    val full = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    try java.nio.file.Files.writeString(java.nio.file.Paths.get("BENCH_LOCAL.json"),
      s"""{"total":$total,"queries":$full,"sf":"$sfDir","loadavg_start":$loadStart,"loadavg_end":$loadEnd}""" + "\n")
    catch { case scala.util.control.NonFatal(_) => () }
    println(s"""{"metric":"total","value":${fmt(total)},"unit":"sec","queries":$qs,"sf":"$sfDir","loadavg_start":$loadStart,"loadavg_end":$loadEnd}""")
    spark.stop()
  }
}
