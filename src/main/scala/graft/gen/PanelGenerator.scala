package graft.gen

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Seeded synthetic MRT panel generator (reference: generate_data.R:2-94,
  * SURVEY.md §2.2 G1-G6) as pure Catalyst expressions over spark.range.
  *
  * RNG is COUNTER-BASED and keyed by (seed, stream, user, t): every draw
  * is a pure function of its key via xxhash64, so results are invariant
  * to partitioning and row order (SURVEY.md §7.4.1 — Spark's rand(seed)
  * is partition-dependent and unacceptable here). The AR(1) recursion is
  * unrolled into a closed-form weighted sum of the per-step innovations,
  * so each row is computed independently — no sequential scan, no
  * cross-row dependency, embarrassingly parallel at any scale.
  *
  * The R stream itself is not reproducible on the JVM (SURVEY.md §5.2):
  * this generator matches the reference's DISTRIBUTIONS; cross-
  * implementation goldens use the committed example_dat.csv instead.
  */
object PanelGenerator {

  final case class Config(
      tMax: Int = 20, dof: Int = 10, nInternal: Int = 100, nExternal: Int = 100,
      arParam: Double = 0.5, x2Coef: Double = -3.0, x21sqCoef: Double = 0.0)

  /** U(0,1) strictly inside (0,1), from a 64-bit counter hash. */
  private def unif(seed: Column, stream: Column, user: Column, t: Column, k: Int): Column = {
    val h = xxhash64(seed, stream, user, t, lit(k))
    (call_function("shiftrightunsigned", h, lit(11)).cast("double") + 0.5) / lit(9007199254740992.0) // 2^53
  }

  /** Standard normal via Box-Muller on two counter-uniforms. */
  private def normal(seed: Column, stream: Column, user: Column, t: Column, k: Int): Column =
    sqrt(lit(-2.0) * log(unif(seed, stream, user, t, 2 * k))) *
      cos(lit(2.0 * math.Pi) * unif(seed, stream, user, t, 2 * k + 1))

  /** Student-t(dof) as z0 / sqrt(chi²_dof / dof) from dof+1 normals. */
  private def studentT(seed: Column, stream: Column, user: Column, t: Column, dof: Int): Column = {
    val z0 = normal(seed, stream, user, t, 0)
    val chi2 = (1 to dof).map(j => { val z = normal(seed, stream, user, t, j); z * z })
      .reduce(_ + _)
    z0 / sqrt(chi2 / lit(dof.toDouble))
  }

  /** Stationary AR(1) at time t, closed form:
    * x_t = ar^t·x₀ + Σ_{j=1..t} ar^(t-j)·e_j, x₀ ~ N(0, 1/(1-ar²)).
    * Each term keyed independently — O(t) hashes per row, zero shuffle.
    */
  private def ar1(seed: Column, stream: Column, user: Column, t: Column, ar: Double): Column = {
    val x0 = normal(seed, stream, user, lit(0), 0) / lit(math.sqrt(1.0 - ar * ar))
    val innov = aggregate(
      sequence(lit(1), t),
      lit(0.0),
      (acc, j) => acc * lit(ar) + normal(seed, stream, user, j, 0))
    // Horner over j ascending: acc = Σ ar^(t-j) e_j  (e_t gets weight 1)
    pow(lit(ar), t.cast("double")) * x0 + innov
  }

  /** Generate the panel: one row per (user_id 1..n, t 1..tMax), schema
    * matching FIXTURES.md §A1 plus explicit `t` (+ seed for lineage). */
  def panel(spark: SparkSession, seed: Long, cfg: Config): DataFrame = {
    val n = cfg.nInternal + cfg.nExternal
    val base = spark.range(n.toLong * cfg.tMax)
      .withColumn("user_id", (col("id") % n) + 1)       // user-fastest, like the
      .withColumn("t", (col("id") / n + 1).cast("int")) // reference's layout
      .drop("id")
    withPanelColumns(base, lit(seed), cfg)
  }

  /** All replications of a cell as ONE range — a `replication` column
    * (1..nReps) and per-row seed `seedBase + replication`. Draws are
    * bit-identical to nReps separate `panel(spark, seedBase + rep, cfg)`
    * calls (the RNG only sees the seed VALUE), but the plan carries a
    * single generator expression tree instead of nReps unioned copies —
    * at 400 reps that is the difference between a ~100 KB and a ~40 MB
    * task binary, and between one and 400 codegen compilations.
    */
  def panelReps(spark: SparkSession, seedBase: Long, cfg: Config, nReps: Int): DataFrame = {
    val n = cfg.nInternal + cfg.nExternal
    val perRep = n.toLong * cfg.tMax
    val base = spark.range(perRep * nReps)
      .withColumn("replication", (col("id") / perRep + 1).cast("int"))
      .withColumn("rid", col("id") % perRep)
      .withColumn("user_id", (col("rid") % n) + 1)
      .withColumn("t", (col("rid") / n + 1).cast("int"))
      .drop("id", "rid")
    withPanelColumns(base, lit(seedBase) + col("replication").cast("long"), cfg)
  }

  private def withPanelColumns(base: DataFrame, sc: Column, cfg: Config): DataFrame = {
    val u = col("user_id"); val t = col("t")

    val isInt = u <= cfg.nInternal
    val x1 = ar1(sc, lit("x1"), u, t, cfg.arParam)
    val df1 = base
      .withColumn("is_internal", isInt)
      .withColumn("is_external", !isInt)
      .withColumn("x1", x1)
    val x2 = when(col("is_internal"),
        lit(1.0) - col("x1") + lit(cfg.x21sqCoef) * col("x1") * col("x1") +
          lit(3.0) * studentT(sc, lit("x2i"), u, t, cfg.dof))
      .otherwise(lit(2.7) * studentT(sc, lit("x2e"), u, t, cfg.dof))
    val df2 = df1.withColumn("x2", x2)
      .withColumn("x3",
        lit(-1.0) + lit(0.5) * col("x1") - lit(0.8) * col("x2") +
          studentT(sc, lit("x3"), u, t, cfg.dof))
    val pH = lit(1.0) / (lit(1.0) + exp(
      lit(0.2) + lit(0.3) * col("is_internal").cast("double") +
        lit(0.05) * col("x1") - lit(0.03) * col("x2") + lit(0.06) * col("x3")))
    val df3 = df2.withColumn("p_h", pH)
      .withColumn("a_logical", unif(sc, lit("a"), u, t, 0) < col("p_h"))
      .withColumn("a", col("a_logical").cast("double"))
      .withColumn("p_h_a", col("a") * col("p_h") + (lit(1.0) - col("a")) * (lit(1.0) - col("p_h")))
      .withColumn("epsilon", ar1(sc, lit("eps"), u, t, cfg.arParam))
      .withColumn("treatment_effect",
        lit(1.0) + lit(2.0) * col("x1") + lit(cfg.x2Coef) * col("x2"))
    df3.withColumn("y",
        lit(4.0) + lit(2.0) * col("x1") - lit(1.5) * col("x1") * col("x2") +
          lit(0.4) * pow(col("x3"), 3.0) + col("a") * col("treatment_effect") + col("epsilon"))
      .withColumn("ones", lit(1.0))
  }
}
