package graft.harness

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.stats.Battery

/** The reference's COMPLETE 13-cell sample-size grid
  * (simulation.R:204-209), per-cell checkpointed under
  * `results/acceptance` (reusing — never recomputing — the five
  * committed acceptance cells), in two replication tiers:
  *
  *  - 10 cells at 400 reps (the reference's n_replications), gated by
  *    the full AcceptanceChecks battery with (1600,1600) as the
  *    sharpest cell;
  *  - the three 6400-scale cells — 256k rows/rep at (6400,6400) —
  *    ALSO at 400 reps by default (the committed round-7 state: the
  *    COMPLETE published workload, 52,000 fits), gated by the
  *    scaleChecks battery whose tolerances derive from the rep count.
  *    GRAFT_GRID_SCALE_REPS can lower this for a quick pass; quick
  *    passes write to a sibling `*_quickpass_*` directory (and
  *    GridRunner refuses lower-rep overwrites outright), so the
  *    committed 400-rep checkpoints and pinned figure frames are safe.
  *
  * Afterwards emits the full-grid metrics CSV and the two S4
  * figure-input frames (FigureFrames) alongside the checkpoints.
  *
  * Usage: `runMain graft.harness.FullGrid [checkpointDir]`; reps via
  * GRAFT_GRID_REPS / GRAFT_GRID_SCALE_REPS, cores via SPARK_GRAFT_CPUS.
  */
object FullGrid {

  /** simulation.R:205-209 `sample_size_pairs`, split by tier. */
  val fullRepCells: Seq[SimulationRunner.Cell] = Seq(
    (25, 25), (100, 100), (400, 400), (1600, 1600),
    (100, 25), (100, 400), (100, 1600),
    (25, 100), (400, 100), (1600, 100)).map((SimulationRunner.Cell.apply _).tupled)

  val scaleCells: Seq[SimulationRunner.Cell] = Seq(
    (6400, 6400), (100, 6400), (6400, 100)).map((SimulationRunner.Cell.apply _).tupled)

  def main(args: Array[String]): Unit = {
    val checkpointDir = args.headOption.getOrElse("results/acceptance")
    val nReps = sys.env.getOrElse("GRAFT_GRID_REPS", "400").toInt
    val scaleReps = sys.env.getOrElse("GRAFT_GRID_SCALE_REPS", "400").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val t0 = System.nanoTime()

    // quick passes (non-default rep counts) go to a sibling directory so
    // they can never overwrite the committed 400-rep checkpoints that
    // AcceptanceSpec/FigureFramesSpec pin (GridRunner additionally
    // refuses lower-rep overwrites outright)
    def tierDir(reps: Int): String =
      if (reps == 400) checkpointDir else s"${checkpointDir}_quickpass_$reps"
    val (perRepFull, stFull) = GridRunner.runGrid(
      spark, fullRepCells, nReps, Battery.methodNames, Some(tierDir(nReps)))
    val (perRepScale, stScale) = GridRunner.runGrid(
      spark, scaleCells, scaleReps, Battery.methodNames, Some(tierDir(scaleReps)))
    (stFull ++ stScale).foreach(s => println(
      s"[full-grid] cell ${s.cell.nInternal}/${s.cell.nExternal}: " +
        (if (s.loadedFromCheckpoint) "loaded from checkpoint" else "computed")))

    val metricsFull = SimulationRunner.metrics(perRepFull).cache()
    val metricsScale = SimulationRunner.metrics(perRepScale).cache()

    // tier 1: the full acceptance battery over the 400-rep cells
    val checksFull = AcceptanceChecks.check(metricsFull, nReps)
      .map { case (n, ok, d) => (s"full400_$n", ok, d) }

    // tier 2: reduced-precision battery (shared with AcceptanceChecks —
    // same truth/row plumbing, low-rep tolerances, no ranking checks)
    val checksScale = AcceptanceChecks.scaleChecks(metricsScale, scaleReps, (6400, 6400))

    // full-grid artifacts: metrics CSV + the two S4 figure-input frames.
    // Same quick-pass protection: the committed fig_* frames are
    // byte-pinned, so a non-default-rep run must not overwrite them.
    val artifactDir =
      if (nReps == 400 && scaleReps == 400) checkpointDir
      else s"${checkpointDir}_quickpass_${nReps}_$scaleReps"
    val metricsAll = metricsFull.unionByName(metricsScale)
      .orderBy("n_internal", "n_external", "coef", "method")
    metricsAll.coalesce(1).write.mode("overwrite").option("header", "true")
      .csv(s"$artifactDir/metrics_csv_full")
    FigureFrames.seCurveFrame(metricsAll).coalesce(1)
      .write.mode("overwrite").option("header", "true")
      .csv(s"$artifactDir/fig_se_curve")
    FigureFrames.boxplotFrame(perRepFull).coalesce(1)
      .write.mode("overwrite").option("header", "true")
      .csv(s"$artifactDir/fig_boxplot_400_400")

    val checks = checksFull ++ checksScale
    checks.foreach { case (name, ok, detail) =>
      println(s"[full-grid] ${if (ok) "PASS" else "FAIL"} $name — $detail")
    }
    println(f"[full-grid] wall=${(System.nanoTime() - t0) / 1e9}%.1f s; " +
      s"${checks.count(_._2)}/${checks.size} checks passed")
    spark.stop()
    if (checks.exists(c => !c._2)) sys.exit(1)
  }
}
