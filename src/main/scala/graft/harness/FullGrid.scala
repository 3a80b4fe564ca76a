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
  *  - the three 6400-scale cells at GRAFT_GRID_SCALE_REPS (default 50)
  *    reps — 256k rows/rep at (6400,6400) — gated by the
  *    reduced-precision checks (coverage/unbiasedness tolerances widen
  *    as 1/√reps; rMSE/efficiency rankings are too noisy at 50 reps to
  *    assert).
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
    val scaleReps = sys.env.getOrElse("GRAFT_GRID_SCALE_REPS", "50").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val t0 = System.nanoTime()

    val (perRepFull, stFull) = GridRunner.runGrid(
      spark, fullRepCells, nReps, Battery.methodNames, Some(checkpointDir))
    val (perRepScale, stScale) = GridRunner.runGrid(
      spark, scaleCells, scaleReps, Battery.methodNames, Some(checkpointDir))
    (stFull ++ stScale).foreach(s => println(
      s"[full-grid] cell ${s.cell.nInternal}/${s.cell.nExternal}: " +
        (if (s.loadedFromCheckpoint) "loaded from checkpoint" else "computed")))

    val metricsFull = SimulationRunner.metrics(perRepFull).cache()
    val metricsScale = SimulationRunner.metrics(perRepScale).cache()

    // tier 1: the full acceptance battery over the 400-rep cells
    val checksFull = AcceptanceChecks.check(metricsFull, nReps)
      .map { case (n, ok, d) => (s"full400_$n", ok, d) }

    // tier 2: reduced-precision checks at `scaleReps` reps
    val rows = AcceptanceChecks.collectRows(metricsScale)
    val mcErr = 3.0 * math.sqrt(0.05 * 0.95 / scaleReps)
    def truth(coef: String): Double = if (coef == "Intercept") -2.0 else 5.0
    val incomplete = rows.filter(_.nRepsUsed != scaleReps)
    val wi = rows.filter(_.method == "WCLS-Internal")
    val ub = rows.filter(r => r.nInternal == 6400 && r.nExternal == 6400 &&
      AcceptanceChecks.unbiasedMethods.contains(r.method))
    val pooled = rows.filter(r => r.nInternal == 6400 && r.nExternal == 6400 &&
      r.method == "WCLS-Pooled")
    val checksScale = Seq(
      ("scale_completeness_all_reps_used", incomplete.isEmpty,
        if (incomplete.isEmpty) s"all groups used $scaleReps/$scaleReps reps"
        else incomplete.map(r => s"${r.nInternal}/${r.nExternal} ${r.method} ${r.coef}: ${r.nRepsUsed}").mkString("; ")),
      ("scale_coverage_wcls_internal_all_cells",
        wi.nonEmpty && wi.forall(r => math.abs(r.coverage - 0.95) < mcErr),
        wi.map(r => f"${r.nInternal}/${r.nExternal} ${r.coef}: ${r.coverage}%.3f").mkString(", ") +
          f" (tol ±$mcErr%.3f)"),
      ("scale_unbiased_z_test_at_6400_6400",
        ub.nonEmpty && ub.forall(r =>
          math.abs(r.avgEstimate - truth(r.coef)) < 3.0 * r.empiricalSe / math.sqrt(scaleReps.toDouble)),
        ub.map(r => f"${r.method} ${r.coef}: est ${r.avgEstimate}%.3f").mkString(", ")),
      ("scale_wcls_pooled_biased_at_6400_6400",
        pooled.nonEmpty && pooled.forall(r =>
          r.coverage < 0.5 && math.abs(r.avgEstimate) < math.abs(truth(r.coef))),
        pooled.map(r => f"${r.coef}: est ${r.avgEstimate}%.3f cov ${r.coverage}%.3f").mkString(", ")))

    // full-grid artifacts: metrics CSV + the two S4 figure-input frames
    val metricsAll = metricsFull.unionByName(metricsScale)
      .orderBy("n_internal", "n_external", "coef", "method")
    metricsAll.coalesce(1).write.mode("overwrite").option("header", "true")
      .csv(s"$checkpointDir/metrics_csv_full")
    FigureFrames.seCurveFrame(metricsAll).coalesce(1)
      .write.mode("overwrite").option("header", "true")
      .csv(s"$checkpointDir/fig_se_curve")
    FigureFrames.boxplotFrame(perRepFull).coalesce(1)
      .write.mode("overwrite").option("header", "true")
      .csv(s"$checkpointDir/fig_boxplot_400_400")

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
