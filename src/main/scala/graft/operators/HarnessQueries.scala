package graft.operators

import org.apache.spark.sql.functions._

import graft.gen.PanelGenerator
import graft.harness.SimulationRunner

/** Driver-surface queries for the synthetic-panel generator (SURVEY.md
  * §2.2 G1-G6) and the Monte-Carlo harness (§2.11 H1-H5). Rows-only
  * (RNG streams have no SQL analogue) but fully deterministic — the
  * generator is counter-based and partition-invariant.
  */
object HarnessQueries {

  /** Panel generator summary: per-study moments of a seeded panel. */
  val gPanel = QueryDef(
    "g1_panel_summary",
    (s, _) => {
      val cfg = PanelGenerator.Config(nInternal = 100, nExternal = 100)
      PanelGenerator.panel(s, seed = 1L, cfg)
        .groupBy(col("is_internal"))
        .agg(
          count(lit(1)).as("n_rows"),
          countDistinct(col("user_id")).as("n_users"),
          round(avg("x1"), 6).as("mean_x1"),
          round(avg("p_h"), 6).as("mean_p_h"),
          round(avg("a"), 6).as("treatment_rate"),
          round(avg("y"), 6).as("mean_y"))
        .orderBy("is_internal")
    })

  /** Mini Monte-Carlo: 1 cell × 3 reps × 3 methods, per-rep estimates +
    * aggregated metrics — the full H1-H5 pipeline end to end. */
  val hSimulation = QueryDef(
    "h1_simulation_metrics",
    (s, _) => {
      val perRep = SimulationRunner.perRepResults(
        s, Seq(SimulationRunner.Cell(30, 30)), nReps = 3,
        methods = Seq("WCLS-Internal", "WCLS-Pooled", "P-WCLS-Pooled"))
      SimulationRunner.metrics(perRep)
        .select(
          col("n_internal"), col("n_external"), col("coef"), col("method"),
          round(col("avg_estimate"), 6).as("avg_estimate"),
          round(col("empirical_se"), 6).as("empirical_se"),
          round(col("rmse"), 6).as("rmse"),
          round(col("coverage"), 6).as("coverage"),
          col("n_tilt_warnings"))
        .orderBy("coef", "method")
    })

  /** Sensitivity scenarios (sensitivity.R:23,53,368-370, H10): rerun the
    * harness under perturbed data-generating processes
    * (x2_coef, x21sq_coef) ∈ {(0,0), (2,0), (-3,0.3)}. */
  val hSensitivity = QueryDef(
    "h2_sensitivity_scenarios",
    (s, _) => {
      // the (x2Coef, x21sqCoef) perturbation tuples are OWNED by
      // SensitivityGrid.scenarios (sensitivity.R:368-370) — h2 keeps its
      // original pinned display labels but can never drift from the DGPs
      // the full sensitivity gate runs
      val labels = Map(
        "x2_0" -> "no_x2_effect", "x2_2" -> "positive_x2", "x12sq" -> "quadratic")
      graft.harness.SensitivityGrid.scenarios.map { sc =>
        // getOrElse: a scenario added/renamed in SensitivityGrid must show
        // up here (under its raw label) rather than throw at query time
        val name = labels.getOrElse(sc.label, sc.label)
        val perRep = SimulationRunner.perRepResults(
          s, Seq(SimulationRunner.Cell(30, 30)), nReps = 2,
          methods = Seq("WCLS-Internal"),
          cfg0 = graft.gen.PanelGenerator.Config(
            x2Coef = sc.x2Coef, x21sqCoef = sc.x21sqCoef))
        SimulationRunner.metrics(perRep)
          .select(
            org.apache.spark.sql.functions.lit(name).as("scenario"),
            col("coef"), col("method"),
            org.apache.spark.sql.functions.round(col("avg_estimate"), 6).as("avg_estimate"),
            org.apache.spark.sql.functions.round(col("analytical_se"), 6).as("analytical_se"))
      }.reduce(_ unionByName _).orderBy("scenario", "coef")
    })

  /** H5-H8 pretty-table emission over a mini grid (the reference's
    * 13-column result schema with formatted cells). */
  val hPrettyTable = QueryDef(
    "h3_pretty_table",
    (s, _) => {
      val perRep = SimulationRunner.perRepResults(
        s, Seq(SimulationRunner.Cell(30, 30)), nReps = 2,
        methods = Seq("WCLS-Internal", "WCLS-Pooled"))
      SimulationRunner.prettyTable(SimulationRunner.metrics(perRep))
    })

  val all: Seq[QueryDef] = Seq(gPanel, hSimulation, hSensitivity, hPrettyTable)
}
