package graft.plans

import org.apache.spark.sql.DataFrame

/** Eager materialization of an intermediate frame — the engine's single
  * seam for the "compute once, feed several consumers / break codegen
  * fusion" pattern (multi-branch dedup inputs, stored ANN code indexes,
  * iterative-plan truncation).
  *
  * Two modes, selected by session conf (ADVICE r6: a hard-coded
  * localCheckpoint bakes a single-node fault-tolerance trade-off into
  * every operator):
  *
  *  - default: eager `localCheckpoint` — executor-local blocks, zero
  *    lineage, reclaimed by the ContextCleaner when the frame becomes
  *    unreferenced. Right for single-node / local[n]: nothing to lose
  *    executors to, and no distributed FS round-trip.
  *  - `spark.graft.reliableCheckpoint=true` (requires
  *    `sparkContext.setCheckpointDir` on HDFS/S3): eager reliable
  *    `checkpoint` — blocks survive executor loss, dynamic-allocation
  *    decommissions and preemption. The setting for multi-executor
  *    clusters, where a lost localCheckpoint block kills the job
  *    non-recoverably. IMPORTANT: reliable checkpoint files are only
  *    garbage-collected when the SparkContext was CREATED with
  *    `spark.cleaner.referenceTracking.cleanCheckpoints=true` (a
  *    SparkConf setting, not settable per-session) — set it in the
  *    cluster deployment or the checkpoint dir grows for the
  *    application's lifetime (one frame copy per staged call).
  *
  * Both modes produce identical data and the same downstream plan shape
  * (a scan over materialized blocks); StageSpec pins the equivalence.
  */
object Stage {

  // warn once per JVM, not once per staged call
  @volatile private var warnedGc = false

  def apply(df: DataFrame): DataFrame =
    // Idempotent on an ALREADY-materialized frame (r21): a frame whose
    // whole plan is one checkpoint/RDD scan (LogicalRDD root — exactly
    // what both branches below return) or a driver-local literal
    // (LocalRelation) is already "computed once"; re-checkpointing it
    // copies every block for zero sharing benefit. Callers routinely
    // compose staged frames into guards that stage again
    // (x5's evalG.staged → guardedBroadcast re-staged each of its three
    // per-n rounds), so the seam itself now recognizes its own output.
    // Any transformation ON TOP of a checkpoint (even a select) still
    // stages normally — only the bare scan is a no-op. Matched on the
    // OPTIMIZED plan (computed anyway before any materialization):
    // `Seq(..).toDF(names)` analyzes as Project-over-LocalRelation and
    // only folds to a bare LocalRelation after optimization.
    df.queryExecution.optimizedPlan match {
      case _: org.apache.spark.sql.execution.LogicalRDD => df
      case _: org.apache.spark.sql.catalyst.plans.logical.LocalRelation => df
      case _ => materialize(df)
    }

  private def materialize(df: DataFrame): DataFrame =
    if (df.sparkSession.conf.getOption("spark.graft.reliableCheckpoint").contains("true")) {
      // Assert (loudly), don't just document, the GC precondition: without
      // cleanCheckpoints=true on the SparkConf the checkpoint dir grows one
      // frame copy per staged call for the application's lifetime — a
      // silent disk leak. Not throwable: the conf is fixed at context
      // creation, and a long-lived session mid-job is better served by a
      // leak warning than an abort.
      val cleans = reliableGcConfigured(df.sparkSession)
      if (!cleans && !warnedGc) {
        warnedGc = true
        org.slf4j.LoggerFactory.getLogger(getClass).warn(
          "spark.graft.reliableCheckpoint=true but the SparkContext was " +
          "created WITHOUT spark.cleaner.referenceTracking.cleanCheckpoints" +
          "=true: reliable checkpoint files will never be garbage-collected " +
          "and the checkpoint dir grows one frame copy per staged call. Set " +
          "it on the SparkConf at context creation.")
      }
      df.checkpoint(eager = true)
    } else
      df.localCheckpoint(eager = true)

  /** True iff the context was created with checkpoint GC enabled — the
    * precondition for leak-free reliable-checkpoint mode (SparkConf-only;
    * cannot be flipped per-session). Exposed for StageSpec. */
  private[graft] def reliableGcConfigured(s: org.apache.spark.sql.SparkSession): Boolean =
    s.sparkContext.getConf
      .getBoolean("spark.cleaner.referenceTracking.cleanCheckpoints", defaultValue = false)

  /** `df.staged` postfix syntax. */
  implicit class StageOps(private val df: DataFrame) extends AnyVal {
    def staged: DataFrame = Stage(df)
  }
}
