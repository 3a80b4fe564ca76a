package graft.harness

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.gen.PanelGenerator
import graft.stats.Battery

/** The reference's SENSITIVITY analysis (sensitivity.R:368-370) run for
  * real: three perturbed data-generating processes, each at the paper's
  * cell (400,400) × 400 replications × all 10 methods, with the
  * scenario-specific true β_r (each DGP has its own marginal estimand):
  *
  *  - `x2_0`   (x2_coef=0):  β_true=(1,2) — the x2 pathway is OFF, so
  *    naive pooling's bias mechanism disappears: EVERY method, including
  *    WCLS-Pooled, should be unbiased with nominal coverage.
  *  - `x2_2`   (x2_coef=2):  β_true=(3,0) — the bias mechanism is back
  *    with the opposite sign; WCLS-Pooled collapses again, the valid
  *    methods stay nominal.
  *  - `x12sq`  (x2_coef=-3, x21sq_coef=0.3): a quadratic x1 term enters
  *    x2, so the linear working model is misspecified — the scenario
  *    probes robustness rather than asserting exact nominal behavior.
  *
  * Per-scenario per-rep results are checkpointed under
  * `results/sensitivity/<label>` (GridRunner semantics: reruns load,
  * config changes recompute). Checks print and gate the exit code.
  *
  * Usage: `runMain graft.harness.SensitivityGrid [dir]`; reps via
  * GRAFT_SENS_REPS (default 400), cores via SPARK_GRAFT_CPUS.
  */
object SensitivityGrid {

  final case class Scenario(label: String, x2Coef: Double, x21sqCoef: Double,
                            truth: Array[Double])

  /** sensitivity.R:368-370 — labels match the reference's sens_label
    * suffixes. */
  val scenarios: Seq[Scenario] = Seq(
    Scenario("x2_0", 0.0, 0.0, Array(1.0, 2.0)),
    Scenario("x2_2", 2.0, 0.0, Array(3.0, 0.0)),
    Scenario("x12sq", -3.0, 0.3, Array(-2.0, 5.0)))

  /** Per-scenario structural checks over a metrics table (shared by the
    * run main and SensitivitySpec, which re-asserts them from the
    * committed checkpoints). */
  def scenarioChecks(sc: Scenario, metrics: org.apache.spark.sql.DataFrame,
                     nReps: Int): Seq[(String, Boolean, String)] = {
    val mcErr = 3.0 * math.sqrt(0.05 * 0.95 / nReps)
    val rows = AcceptanceChecks.collectRows(metrics)
    def z(r: AcceptanceChecks.MetricRow): Double = {
      val t = if (r.coef == "Intercept") sc.truth(0) else sc.truth(1)
      math.abs(r.avgEstimate - t) / (r.empiricalSe / math.sqrt(nReps.toDouble))
    }
    val unbiasedSet = rows.filter(r =>
      AcceptanceChecks.unbiasedMethods.contains(r.method))
    val checks = Seq.newBuilder[(String, Boolean, String)]
    checks += ((s"${sc.label}_completeness",
      rows.nonEmpty && rows.forall(_.nRepsUsed == nReps),
      s"${rows.size} groups"))
    if (sc.label != "x12sq") {
      // correctly-specified scenarios: valid (weighted/centered)
      // methods keep nominal coverage and pass the unbiasedness z-test
      checks += ((s"${sc.label}_unbiased_methods_nominal_coverage",
        unbiasedSet.nonEmpty &&
          unbiasedSet.forall(r => math.abs(r.coverage - 0.95) < mcErr),
        unbiasedSet.map(r => f"${r.method} ${r.coef}: ${r.coverage}%.3f").mkString(", ")))
      checks += ((s"${sc.label}_unbiased_methods_z_test",
        unbiasedSet.nonEmpty && unbiasedSet.forall(r => z(r) < 3.0),
        unbiasedSet.map(r => f"${r.method} ${r.coef}: z=${z(r)}%.1f").mkString(", ")))
    } else {
      // quadratic misspecification: the unmodeled −0.9·x1² curvature in
      // the marginal effect (−2+5x1−0.9x1²) lands ENTIRELY on the
      // intercept of the (1, x1) projection — E[x1³]=0 under the
      // symmetric innovations keeps the slope clean. Measured (400
      // reps): every valid method's intercept shifts to ≈−3.2…−3.6
      // (z≈14-15, coverage ~0.82-0.86); slope coverage stays 0.94-0.98.
      val slopes = unbiasedSet.filter(_.coef == "Slope")
      val icpts = unbiasedSet.filter(_.coef == "Intercept")
      checks += (("x12sq_slope_inference_robust",
        slopes.nonEmpty && slopes.forall(r =>
          math.abs(r.coverage - 0.95) < mcErr && z(r) < 3.0),
        slopes.map(r => f"${r.method}: cov ${r.coverage}%.3f z=${z(r)}%.1f").mkString(", ")))
      checks += (("x12sq_intercept_absorbs_curvature",
        icpts.nonEmpty && icpts.forall(r =>
          z(r) > 3.0 && r.avgEstimate < sc.truth(0)),
        icpts.map(r => f"${r.method}: est ${r.avgEstimate}%.3f z=${z(r)}%.1f").mkString(", ")))
    }
    // pooling: unbiased exactly when the x2 pathway is off
    val pooled = rows.filter(_.method == "WCLS-Pooled")
    if (sc.label == "x2_0")
      checks += (("x2_0_pooling_bias_mechanism_off",
        pooled.nonEmpty && pooled.forall(r =>
          math.abs(r.coverage - 0.95) < mcErr && z(r) < 3.0),
        pooled.map(r => f"${r.coef}: cov ${r.coverage}%.3f z=${z(r)}%.1f").mkString(", ")))
    if (sc.label == "x2_2")
      // forall, like x2_0's: measured cov 0.748/0.775 with z≈21 on BOTH
      // coefficients — a regression restoring nominal pooled coverage on
      // either one must trip the gate
      checks += (("x2_2_pooling_biased_again",
        pooled.nonEmpty && pooled.forall(r => r.coverage < 0.8 && z(r) > 3.0),
        pooled.map(r => f"${r.coef}: cov ${r.coverage}%.3f z=${z(r)}%.1f").mkString(", ")))
    checks.result()
  }

  def main(args: Array[String]): Unit = {
    val baseDir = args.headOption.getOrElse("results/sensitivity")
    val nReps = sys.env.getOrElse("GRAFT_SENS_REPS", "400").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val t0 = System.nanoTime()

    val cell = SimulationRunner.Cell(400, 400)
    val allChecks = scenarios.flatMap { sc =>
      val cfg = PanelGenerator.Config(x2Coef = sc.x2Coef, x21sqCoef = sc.x21sqCoef)
      val (perRep, _) = GridRunner.runGrid(
        spark, Seq(cell), nReps, Battery.methodNames,
        Some(s"$baseDir/${sc.label}"), cfg, truth = sc.truth)
      val metrics = SimulationRunner.metrics(perRep, sc.truth).cache()
      metrics.coalesce(1).write.mode("overwrite").option("header", "true")
        .csv(s"$baseDir/${sc.label}/metrics_csv")
      println(s"=== scenario ${sc.label} (truth ${sc.truth.mkString("/")}) ===")
      SimulationRunner.prettyTable(metrics).show(30, truncate = false)
      scenarioChecks(sc, metrics, nReps)
    }

    allChecks.foreach { case (name, ok, detail) =>
      println(s"[sensitivity] ${if (ok) "PASS" else "FAIL"} $name — $detail")
    }
    println(f"[sensitivity] wall=${(System.nanoTime() - t0) / 1e9}%.1f s; " +
      s"${allChecks.count(_._2)}/${allChecks.size} checks passed")
    spark.stop()
    if (allChecks.exists(c => !c._2)) sys.exit(1)
  }
}
