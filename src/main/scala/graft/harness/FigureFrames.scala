package graft.harness

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.stats.Battery

/** S4 figure-INPUT frames (the reference's two PDF figures are drawn
  * from exactly these tables; the engine emits the tables — plotting is
  * presentation, not data processing):
  *
  *  - [[seCurveFrame]]: the long-form input of
  *    `figures/sample_size_se.pdf` (simulation.R:330-397) — empirical SE
  *    per (coefficient, method, varying sample size) along the two grid
  *    slices n_internal=100 and n_external=100, restricted to the five
  *    methods the reference plots (simulation.R:280-287).
  *  - [[boxplotFrame]]: the long frame behind
  *    `figures/estimates_400_400.pdf` (simulation.R:399-419) — per-rep
  *    estimates and estimation errors at cell (400,400), with the
  *    reference's Method/Coefficient factor numbering, ET-WCLS-Equal
  *    excluded (its spread blows up the y-axis; simulation.R:415-416).
  */
object FigureFrames {

  /** simulation.R:281-287 `methods_for_se_plot`. */
  val seCurveMethods: Seq[String] = Seq(
    "WCLS-Internal", "P-WCLS-Pooled", "ET-WCLS", "DR-WCLS", "PET-WCLS")

  /** Long-form SE-curve frame from a metrics table (any cell coverage;
    * the full reference figure needs the 13-cell grid so each panel has
    * x ∈ {25,100,400,1600,6400}). Columns: panel (internal_100 |
    * external_100), coef, method, x (the VARYING sample size),
    * empirical_se, n_reps_used. Cell (100,100) appears in both panels,
    * as in the reference's two `result_df` slices. */
  def seCurveFrame(metrics: DataFrame): DataFrame = {
    val m = metrics.filter(col("method").isin(seCurveMethods: _*))
    def slice(panel: String, fixed: Column, x: Column): DataFrame =
      m.filter(fixed === 100)
        .select(lit(panel).as("panel"), col("coef"), col("method"),
          x.cast("int").as("x"),
          round(col("empirical_se"), 6).as("empirical_se"),
          col("n_reps_used"))
    slice("internal_100", col("n_internal"), col("n_external"))
      .unionByName(slice("external_100", col("n_external"), col("n_internal")))
      .orderBy("panel", "coef", "method", "x")
  }

  /** Boxplot long frame from per-rep results: cell (400,400), one row
    * per (replication, method, coefficient) with estimate and
    * estimation_error = estimate − β_true. method_number /
    * coefficient_number are the reference's 1-based factor positions
    * (`which.max(method_names == method)`, simulation.R:407-410) —
    * assigned over the FULL method list before ET-WCLS-Equal is
    * dropped, so ET-WCLS-Kron stays 7 etc. */
  def boxplotFrame(perRep: DataFrame): DataFrame = {
    val methodNumber = Battery.methodNames.zipWithIndex
      .foldLeft(lit(-1)) { case (acc, (m, i)) =>
        when(col("method") === m, i + 1).otherwise(acc)
      }
    perRep
      .filter(col("n_internal") === 400 && col("n_external") === 400 &&
        col("method") =!= "ET-WCLS-Equal")
      .select(
        col("replication"),
        col("method"),
        methodNumber.as("method_number"),
        col("coef").as("coefficient"),
        when(col("coef") === "Intercept", 1).otherwise(2).as("coefficient_number"),
        round(col("estimate"), 6).as("estimate"),
        round(col("estimate") - SimulationRunner.truthCol, 6).as("estimation_error"))
      .orderBy("coefficient_number", "method_number", "replication")
  }
}
