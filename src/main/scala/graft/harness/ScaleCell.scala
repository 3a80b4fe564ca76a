package graft.harness

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.stats.Battery

/** Reference-maximum grid cell run: (n_internal, n_external) =
  * (6400, 6400) — 256k rows per replication, the largest cell of the
  * reference grid (simulation.R:204-209) — executed for real through
  * BOTH execution routes, with wall-clock and cross-route agreement
  * printed. Results are recorded in ACCEPTANCE.md §"Reference-scale
  * cell".
  *
  * Routing decision this run pins down: at 256k rows/rep the panel is
  * ~25 MB of task-local arrays — comfortably inside one executor task —
  * so the default `maxLocalRows = 500000` keeps the reference's ENTIRE
  * grid on the replication-parallel local route (one task per (cell,
  * rep), all cores busy across reps). The distributed route exists for
  * cells that outgrow a task (≥ ~1M rows/rep); it pays per-fit Spark
  * job overhead ×(methods × reps), so it should stay the overflow path,
  * not the default.
  *
  * Usage: `runMain graft.harness.ScaleCell`; reps via GRAFT_SCALE_REPS
  * (default 25), distributed-route comparison reps via
  * GRAFT_SCALE_DIST_REPS (default 3), cores via SPARK_GRAFT_CPUS.
  */
object ScaleCell {
  def main(args: Array[String]): Unit = {
    val nReps = sys.env.getOrElse("GRAFT_SCALE_REPS", "25").toInt
    val nDistReps = sys.env.getOrElse("GRAFT_SCALE_DIST_REPS", "3").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val cell = SimulationRunner.Cell(6400, 6400)
    val methods = Battery.methodNames

    def timed[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[scale-cell] $label wall=${(System.nanoTime() - t0) / 1e9}%.1f s")
      r
    }

    // LOCAL route — the route the default threshold actually picks
    val local = timed(s"local route $nReps reps x ${methods.size} methods") {
      val df = SimulationRunner.perRepResults(
        spark, Seq(cell), nReps, methods).cache()
      println(s"[scale-cell] local per-rep rows=${df.count()}")
      df
    }
    val metrics = SimulationRunner.metrics(local)
    SimulationRunner.prettyTable(metrics).show(30, truncate = false)
    val incomplete = metrics.filter(col("n_reps_used") =!= nReps).count()
    println(s"[scale-cell] groups with missing reps: $incomplete (expect 0)")

    // DISTRIBUTED route on a rep subset — overflow-path timing + parity
    val dist = timed(s"distributed route $nDistReps reps") {
      val df = SimulationRunner.perRepResults(
        spark, Seq(cell), nDistReps, methods, maxLocalRows = 1000L).cache()
      println(s"[scale-cell] distributed per-rep rows=${df.count()}")
      df
    }
    val joined = local.filter(col("replication") <= nDistReps)
      .select(col("replication"), col("method"), col("coef"),
        col("estimate").as("e_l"), col("se").as("s_l"))
      .join(dist.select(col("replication"), col("method"), col("coef"),
        col("estimate").as("e_d"), col("se").as("s_d")),
        Seq("replication", "method", "coef"))
    val agg = joined.agg(
      count(lit(1)).as("n"),
      max(abs(col("e_l") - col("e_d"))).as("max_d_est"),
      max(abs(col("s_l") - col("s_d"))).as("max_d_se")).head()
    println(s"[scale-cell] route agreement over ${agg.getLong(0)} rows: " +
      s"max|d_estimate|=${agg.getDouble(1)}, max|d_se|=${agg.getDouble(2)}")
    // tolerance 1e-6: the two routes sum 256k-term moment matrices in
    // different orders (fused task-local loop vs distributed MomentPass
    // tree), so agreement scales with n·ulp — observed ~1e-8 at this
    // size, asserted with margin; both are exact to ~8 significant
    // digits on O(1) estimates. The row count must be EXACT — a
    // silently-dropped (singular) replication in either route would
    // otherwise shrink the comparison without failing the gate.
    val expectRows = nDistReps.toLong * methods.size * SimulationRunner.coefNames.size
    val ok = agg.getLong(0) == expectRows && incomplete == 0L &&
      agg.getDouble(1) < 1e-6 && agg.getDouble(2) < 1e-6
    println(s"[scale-cell] ${if (ok) "PASS" else "FAIL"} route equivalence at (6400,6400)")
    spark.stop()
    if (!ok) sys.exit(1)
  }
}
