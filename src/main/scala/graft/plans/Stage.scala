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
  def apply(df: DataFrame): DataFrame =
    if (df.sparkSession.conf.getOption("spark.graft.reliableCheckpoint").contains("true"))
      df.checkpoint(eager = true)
    else
      df.localCheckpoint(eager = true)

  /** `df.staged` postfix syntax. */
  implicit class StageOps(private val df: DataFrame) extends AnyVal {
    def staged: DataFrame = Stage(df)
  }
}
