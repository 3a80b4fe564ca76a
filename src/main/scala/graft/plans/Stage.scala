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
