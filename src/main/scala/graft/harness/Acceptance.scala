package graft.harness

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.stats.Battery

/** Statistical acceptance for BASELINE.md target 2 (reference:
  * simulation.R:516-530 bolding rules, results/simulation_results.csv):
  * a reduced-grid Monte-Carlo rerun must show
  *
  *  - coverage within MC error (3·√(.05·.95/n)) of 0.95 for the unbiased
  *    methods,
  *  - avg estimates unbiased by the reference's own z-test
  *    (|bias| < 3·empSE/√n) for those methods,
  *  - WCLS-Pooled biased-by-design (significantly biased toward zero,
  *    coverage far below nominal — reference: 0.610/0.588 at 400/400),
  *  - PET-WCLS the best method: lowest rMSE of all methods and highest
  *    empirical relative efficiency among valid (non-WCLS-Pooled) methods,
  *  - tilt-warning parity: identical counts across the five tilt-based
  *    methods (the warning comes from the shared tilt fit), zero for
  *    non-tilt methods, rare at 400/400 (reference: 1/400) and present
  *    at 25/25 (reference: 13/400).
  */
object AcceptanceChecks {

  final case class MetricRow(
      nInternal: Int, nExternal: Int, coef: String, method: String,
      avgEstimate: Double, empiricalSe: Double, rmse: Double,
      coverage: Double, nTiltWarnings: Long, relEff: Option[Double],
      nRepsUsed: Long)

  val unbiasedMethods: Set[String] =
    Set("WCLS-Internal", "P-WCLS-Internal", "P-WCLS-Pooled", "P-WCLS-Pooled-Obs")
  val tiltMethods: Set[String] =
    Set("ET-WCLS-Equal", "ET-WCLS-Kron", "ET-WCLS", "DR-WCLS", "PET-WCLS")

  private[harness] def truth(coef: String): Double = if (coef == "Intercept") -2.0 else 5.0

  /** Reduced-precision battery for low-rep tiers (e.g. the 6400-scale
    * grid cells at 50 reps): completeness, WCLS-Internal coverage at a
    * tolerance that widens as 1/√nReps, the unbiasedness z-test and the
    * pooled-bias negative control at `bigCell`. Ranking assertions
    * (PET supremacy) are deliberately absent — too MC-noisy at low reps.
    * Shares truth()/collectRows with the full battery so the tiers
    * cannot drift apart. */
  def scaleChecks(metrics: DataFrame, nReps: Int,
                  bigCell: (Int, Int)): Seq[(String, Boolean, String)] = {
    val rows = collectRows(metrics)
    val mcErr = 3.0 * math.sqrt(0.05 * 0.95 / nReps)
    val incomplete = rows.filter(_.nRepsUsed != nReps)
    val wi = rows.filter(_.method == "WCLS-Internal")
    val ub = rows.filter(r => r.nInternal == bigCell._1 && r.nExternal == bigCell._2 &&
      unbiasedMethods.contains(r.method))
    val pooled = rows.filter(r => r.nInternal == bigCell._1 && r.nExternal == bigCell._2 &&
      r.method == "WCLS-Pooled")
    Seq(
      ("scale_completeness_all_reps_used", incomplete.isEmpty,
        if (incomplete.isEmpty) s"all groups used $nReps/$nReps reps"
        else incomplete.map(r => s"${r.nInternal}/${r.nExternal} ${r.method} ${r.coef}: ${r.nRepsUsed}").mkString("; ")),
      ("scale_coverage_wcls_internal_all_cells",
        wi.nonEmpty && wi.forall(r => math.abs(r.coverage - 0.95) < mcErr),
        wi.map(r => f"${r.nInternal}/${r.nExternal} ${r.coef}: ${r.coverage}%.3f").mkString(", ") +
          f" (tol ±$mcErr%.3f)"),
      (s"scale_unbiased_z_test_at_${bigCell._1}_${bigCell._2}",
        ub.nonEmpty && ub.forall(r =>
          math.abs(r.avgEstimate - truth(r.coef)) < 3.0 * r.empiricalSe / math.sqrt(nReps.toDouble)),
        ub.map(r => f"${r.method} ${r.coef}: est ${r.avgEstimate}%.3f").mkString(", ")),
      (s"scale_wcls_pooled_biased_at_${bigCell._1}_${bigCell._2}",
        pooled.nonEmpty && pooled.forall(r =>
          r.coverage < 0.5 && math.abs(r.avgEstimate) < math.abs(truth(r.coef))),
        pooled.map(r => f"${r.coef}: est ${r.avgEstimate}%.3f cov ${r.coverage}%.3f").mkString(", ")))
  }

  def collectRows(metrics: DataFrame): Seq[MetricRow] =
    metrics.select("n_internal", "n_external", "coef", "method", "avg_estimate",
        "empirical_se", "rmse", "coverage", "n_tilt_warnings",
        "empirical_rel_efficiency", "n_reps_used")
      .collect().toSeq.map { r =>
        MetricRow(r.getInt(0), r.getInt(1), r.getString(2), r.getString(3),
          r.getDouble(4), r.getDouble(5), r.getDouble(6), r.getDouble(7),
          r.getLong(8), if (r.isNullAt(9)) None else Some(r.getDouble(9)),
          r.getLong(10))
      }

  /** Run every acceptance assertion; returns (name, passed, detail).
    * Every filtered subset is asserted nonEmpty before its forall so a
    * method rename fails loudly instead of passing vacuously. */
  def check(metrics: DataFrame, nReps: Int): Seq[(String, Boolean, String)] = {
    val rows = collectRows(metrics)
    if (rows.isEmpty)
      return Seq(("metrics_table_nonempty", false, "metrics table has 0 rows"))
    val mcErr = 3.0 * math.sqrt(0.05 * 0.95 / nReps)
    val cells = rows.map(r => (r.nInternal, r.nExternal)).distinct.sorted
    def at(ni: Int, ne: Int)(p: MetricRow => Boolean): Seq[MetricRow] =
      rows.filter(r => r.nInternal == ni && r.nExternal == ne && p(r))
    val big = cells.last // the largest cell carries the sharpest assertions
    // The PET-supremacy RANKING checks (5/6) are pinned to the paper's
    // headline cell (400,400) when the grid contains it: method rankings
    // are MC-noisy, and the reference's own 13-cell results
    // (results/simulation_results.csv) flip the best-rMSE method at
    // 25/25 (WCLS-Pooled) and 6400/6400 (P-WCLS-Pooled), so "PET best at
    // whatever cell happens to be largest" is not a reference property —
    // "PET best at 400/400" (the printed table, simulation.R:471-530) is.
    val petCell = if (cells.contains((400, 400))) (400, 400) else big

    val checks = Seq.newBuilder[(String, Boolean, String)]

    // 0. completeness: every (cell, method, coef) used all nReps reps
    val incomplete = rows.filter(_.nRepsUsed != nReps)
    checks += (("completeness_all_reps_used", incomplete.isEmpty,
      if (incomplete.isEmpty) s"all groups used $nReps/$nReps reps"
      else incomplete.map(r => s"${r.nInternal}/${r.nExternal} ${r.method} ${r.coef}: ${r.nRepsUsed}")
        .mkString("; ")))

    // 1. WCLS-Internal coverage within MC error of 0.95 in EVERY cell
    val wi = rows.filter(_.method == "WCLS-Internal")
    checks += (("coverage_wcls_internal_all_cells",
      wi.nonEmpty && wi.forall(r => math.abs(r.coverage - 0.95) < mcErr),
      wi.map(r => f"${r.nInternal}/${r.nExternal} ${r.coef}: ${r.coverage}%.3f").mkString(", ") +
        f" (tol ±$mcErr%.3f)"))

    // 2. all unbiased methods: coverage within MC error at the largest cell
    val ub = at(big._1, big._2)(r => unbiasedMethods.contains(r.method))
    checks += (("coverage_unbiased_at_largest_cell",
      ub.nonEmpty && ub.forall(r => math.abs(r.coverage - 0.95) < mcErr),
      ub.map(r => f"${r.method} ${r.coef}: ${r.coverage}%.3f").mkString(", ")))

    // 3. unbiasedness z-test (simulation.R:522-528 rule) at the largest cell
    checks += (("unbiased_z_test_at_largest_cell",
      ub.nonEmpty && ub.forall(r => math.abs(r.avgEstimate - truth(r.coef)) < 3.0 * r.empiricalSe / math.sqrt(nReps.toDouble)),
      ub.map(r => f"${r.method} ${r.coef}: est ${r.avgEstimate}%.3f vs ${truth(r.coef)}%.0f ±${3.0 * r.empiricalSe / math.sqrt(nReps.toDouble)}%.3f").mkString(", ")))

    // 4. WCLS-Pooled is the biased-by-design negative control
    val pooled = at(big._1, big._2)(_.method == "WCLS-Pooled")
    checks += (("wcls_pooled_biased_negative_control",
      pooled.nonEmpty && pooled.forall(r =>
        r.coverage < 0.8 &&
          math.abs(r.avgEstimate - truth(r.coef)) > 3.0 * r.empiricalSe / math.sqrt(nReps.toDouble) &&
          math.abs(r.avgEstimate) < math.abs(truth(r.coef))), // shrunk toward 0
      pooled.map(r => f"${r.coef}: est ${r.avgEstimate}%.3f cov ${r.coverage}%.3f").mkString(", ")))

    // 5. PET-WCLS best rMSE of ALL methods at the headline cell
    val byCoef = at(petCell._1, petCell._2)(_ => true).groupBy(_.coef)
    val petBestRmse = byCoef.forall { case (_, rs) =>
      rs.minBy(_.rmse).method == "PET-WCLS"
    }
    checks += (("pet_wcls_lowest_rmse",
      petBestRmse,
      byCoef.map { case (c, rs) =>
        val best = rs.minBy(_.rmse)
        f"$c: best=${best.method} (${best.rmse}%.3f)"
      }.mkString(", ")))

    // 6. PET-WCLS highest empirical relative efficiency among valid methods
    // NaN would win Scala's Double ordering — only defined ratios compete
    def validEff(rs: Seq[MetricRow]): Seq[MetricRow] =
      rs.filter(r => r.method != "WCLS-Pooled" && r.relEff.exists(e => !e.isNaN))
    val petBestEff = byCoef.forall { case (_, rs) =>
      validEff(rs).maxByOption(_.relEff.get).exists(_.method == "PET-WCLS")
    }
    checks += (("pet_wcls_best_rel_efficiency",
      petBestEff,
      byCoef.map { case (c, rs) =>
        validEff(rs).maxByOption(_.relEff.get) match {
          case Some(best) => f"$c: best=${best.method} (${best.relEff.get}%.3f)"
          case None => s"$c: no method with a defined efficiency ratio"
        }
      }.mkString(", ")))

    // 7. tilt-warning parity: equal counts across all five tilt methods
    //    (the warning is a property of the shared tilt fit), zero elsewhere
    val parityOk = cells.forall { case (ni, ne) =>
      val tiltCounts = at(ni, ne)(r => tiltMethods.contains(r.method)).map(_.nTiltWarnings).distinct
      val nonTilt = at(ni, ne)(r => !tiltMethods.contains(r.method))
      tiltCounts.size == 1 && nonTilt.nonEmpty && nonTilt.forall(_.nTiltWarnings == 0L)
    }
    checks += (("tilt_warning_parity", parityOk,
      cells.map { case (ni, ne) =>
        val c = at(ni, ne)(r => tiltMethods.contains(r.method)).map(_.nTiltWarnings).distinct
        s"$ni/$ne: ${c.mkString("/")}"
      }.mkString(", ")))

    // 8. tilt-warning rates: rare at the largest cell (reference 1/400),
    //    present at 25/25 (reference 13/400) once reps give it a chance
    val bigTilt = at(big._1, big._2)(r => tiltMethods.contains(r.method)).map(_.nTiltWarnings).maxOption.getOrElse(0L)
    val smallTilt = at(cells.head._1, cells.head._2)(r => tiltMethods.contains(r.method)).map(_.nTiltWarnings).maxOption.getOrElse(0L)
    val bigBound = math.max(4L, math.ceil(0.02 * nReps).toLong)
    val smallOk = nReps < 100 || smallTilt >= 1L
    checks += (("tilt_warning_rates",
      bigTilt <= bigBound && smallOk,
      s"largest cell: $bigTilt (≤ $bigBound), smallest cell: $smallTilt (≥1 when nReps ≥ 100)"))

    // 9. pooled bias scales with the external fraction (reference:
    //    WCLS-Pooled coverage 0.218 at 100/400 < 0.610 at 400/400 <
    //    0.945 at 400/100): naive pooling collapses exactly when the
    //    biased external study dominates. Runs when the asymmetric
    //    cells are in the grid.
    val povCov = Seq((100, 400), (400, 400), (400, 100)).map { case (ni, ne) =>
      at(ni, ne)(r => r.method == "WCLS-Pooled" && r.coef == "Slope")
        .map(_.coverage).headOption
    }
    povCov match {
      case Seq(Some(extDom), Some(bal), Some(intDom)) =>
        checks += (("pooled_bias_scales_with_external_fraction",
          extDom < bal && bal < intDom && extDom < 0.4 && intDom > 0.85,
          f"slope coverage: 100/400=$extDom%.3f < 400/400=$bal%.3f < 400/100=$intDom%.3f"))
      case _ => () // asymmetric cells not in this grid
    }

    checks.result()
  }
}

/** Reduced-grid Monte-Carlo acceptance run (BASELINE.md target 2):
  * 5 cells (3 symmetric + 2 asymmetric) × 400 reps × all 10 methods,
  * per-cell checkpointed under
  * `results/acceptance`, metric table written alongside, assertions
  * printed and reflected in the exit code.
  *
  * Usage: `runMain graft.harness.Acceptance [checkpointDir]`, reps via
  * GRAFT_ACCEPT_REPS (default 400), parallelism via SPARK_GRAFT_CPUS.
  */
object Acceptance {
  def main(args: Array[String]): Unit = {
    val checkpointDir = args.headOption.getOrElse("results/acceptance")
    val nReps = sys.env.getOrElse("GRAFT_ACCEPT_REPS", "400").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val cells = Seq(SimulationRunner.Cell(25, 25), SimulationRunner.Cell(100, 100),
      SimulationRunner.Cell(400, 400), SimulationRunner.Cell(100, 400),
      SimulationRunner.Cell(400, 100))
    val t0 = System.nanoTime()
    val (perRep, statuses) = GridRunner.runGrid(
      spark, cells, nReps, Battery.methodNames, Some(checkpointDir))
    statuses.foreach(s => println(
      s"[acceptance] cell ${s.cell.nInternal}/${s.cell.nExternal}: " +
        (if (s.loadedFromCheckpoint) "loaded from checkpoint" else "computed")))

    val metrics = SimulationRunner.metrics(perRep).cache()
    metrics.coalesce(1).write.mode("overwrite").option("header", "true")
      .csv(s"$checkpointDir/metrics_csv")
    SimulationRunner.prettyTable(metrics).show(100, truncate = false)

    val checks = AcceptanceChecks.check(metrics, nReps)
    checks.foreach { case (name, ok, detail) =>
      println(s"[acceptance] ${if (ok) "PASS" else "FAIL"} $name — $detail")
    }
    println(f"[acceptance] wall=${(System.nanoTime() - t0) / 1e9}%.1f s; " +
      s"${checks.count(_._2)}/${checks.size} checks passed")
    spark.stop()
    if (checks.exists(c => !c._2)) sys.exit(1)
  }
}
