package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter

import graft.functions.RepetitionExpressions.gopherStats
import graft.operators.{PiiQueries, TextQueries}
import graft.sources.IndexStore

/** STREAMING curation gate — the front door of a crawl-ingest pipeline
  * run as a Structured Streaming sink (the fourth stored-table ingest
  * lifecycle, after DedupIngest / EmbedIngest / SketchIngest): each
  * micro-batch of arriving `(doc_id, text)` documents is
  *
  *  1. GATED map-side — the published Gopher battery (`GopherStats`,
  *     one kernel call per row, `passes_gopher`) AND the t2 quality
  *     rule (shared `qualityExpr`, threshold `minQuality`) — exactly
  *     the batch t23/t9 semantics restricted to the batch;
  *  2. PII-SCRUBBED — survivors pass through t18's fixed-order
  *     map-side redaction before anything downstream sees them — and
  *     handed to `onKept(scrubbed, batchId)` (write to the corpus
  *     landing zone, feed DedupIngest — caller's choice);
  *  3. AUDITED — ONE attrition row per batch (docs/tokens in, kept,
  *     dropped-by-gate split, PII-touched count) appends to the
  *     STORED audit table at `auditPath` — the gate-health time series
  *     a curation dashboard reads without replaying the stream.
  *
  * Scale shape per batch: the gate and the scrub are pure codegen'd
  * map work (zero shuffles, zero streaming state — no state store at
  * any corpus size); the audit is a 1-row driver-side append. Cost is
  * O(batch), independent of stream lifetime.
  *
  * Delivery semantics: `onKept` is at-least-once relative to the
  * streaming checkpoint (key the sink by batchId — the foreachBatch
  * discipline). The AUDIT append is EXACTLY-ONCE under crash/replay:
  * each batch's row publishes under a deterministic per-batchId tag
  * via sweep-stage-rename ([[IndexStore.publishTaggedAppend]]), so a
  * replayed batch sweeps its crashed prior attempt and republishes
  * the same row instead of double-counting — the SketchIngest
  * contract, shared machinery.
  */
object GateIngest {

  private[graft] val auditTable = "gate_audit"

  /** The shared map-side gate + scrub, factored out so the streaming
    * path and GateIngestSpec's batch-twin assertions can never drift:
    * returns the batch with `__q`, `passes_gopher`, `kept`, PII counts
    * and `redacted` columns attached. */
  private[graft] def gateFrame(batch: DataFrame, minQuality: Double): DataFrame = {
    // a null text must LOSE at the gate, not vanish from the audit: a
    // NULL riding through split/&&/when would count in n_in but in
    // NEITHER drop bucket, silently breaking n_in = kept + dropped —
    // coalesced to "", it fails the Gopher word-count rule and lands
    // in drop_gopher like any other junk arrival
    val withText = batch.withColumn("text", coalesce(col("text"), lit("")))
    val tk = split(col("text"), " ")
    val gated = withText
      .withColumn("__q", TextQueries.qualityExpr(tk, length(col("text"))))
      .withColumn("__gs", gopherStats(tk, split(col("text"), "\n"),
        TextQueries.stopwords))
      .withColumn("passes_gopher", col("__gs.passes_gopher"))
      .drop("__gs")
      .withColumn("kept", col("passes_gopher") && col("__q") >= minQuality)
    PiiQueries.piiScrub(gated)
  }

  /** Gate-internal columns gateFrame attaches — everything `onKept`
    * must NOT see (the hand-off contract is the caller's own columns
    * with `text` scrubbed). */
  private val internalCols =
    Seq("__q", "passes_gopher", "kept", "n_emails", "n_phones", "n_ipv4",
      "redacted")

  /** The audit table's schema, fixed here so a pre-publish read can
    * return the promised EMPTY frame instead of failing on a
    * nonexistent path. */
  private val auditSchema = org.apache.spark.sql.types.StructType(
    Seq("n_in", "n_kept", "drop_gopher", "drop_quality", "tokens_in",
      "tokens_kept", "pii_docs", "batch_id").map(n =>
      org.apache.spark.sql.types.StructField(n,
        org.apache.spark.sql.types.LongType, nullable = true)))

  /** The per-batch gate body (factored r20 so the composed crawl
    * front-door — [[CrawlIngest]] — and direct drivers share it):
    * gate + scrub → hand survivors to the caller → tagged audit row.
    * Returns the same scrubbed-survivor frame handed to `onKept`
    * (composed lifecycles build their downstream plan from it). */
  private[graft] def ingestGateBatch(s: org.apache.spark.sql.SparkSession,
                                     auditPath: String, batch: DataFrame,
                                     prefix: String, batchId: Long,
                                     minQuality: Double,
                                     onKept: (DataFrame, Long) => Unit): DataFrame = {
    graft.sources.IndexStore.requireMonotonicBatch(
      s, auditPath, Seq(auditTable), prefix, batchId)
    val g = graft.plans.Stage(gateFrame(batch, minQuality))
    val kept = g.filter(col("kept"))
    // hand off the CALLER's columns only, text scrubbed — no
    // gate internals ride into the corpus landing zone
    val handOff = kept.withColumn("text", col("redacted"))
      .drop(internalCols: _*)
    onKept(handOff, batchId)
    // one audit row; tokens_kept counts the PRE-redaction text so
    // the attrition math is about the gate, not the placeholders
    val row = g.agg(
      count(lit(1)).as("n_in"),
      sum(when(col("kept"), 1L).otherwise(0L)).as("n_kept"),
      sum(when(!col("passes_gopher"), 1L).otherwise(0L)).as("drop_gopher"),
      sum(when(col("passes_gopher") && !col("kept"), 1L).otherwise(0L))
        .as("drop_quality"),
      sum(size(split(col("text"), " ")).cast("long")).as("tokens_in"),
      sum(when(col("kept"), size(split(col("text"), " ")).cast("long"))
        .otherwise(0L)).as("tokens_kept"),
      sum(when(col("kept") &&
        (col("n_emails") + col("n_phones") + col("n_ipv4")) > 0, 1L)
        .otherwise(0L)).as("pii_docs"))
      .withColumn("batch_id", lit(batchId))
    IndexStore.publishTaggedAppend(s, auditPath, auditTable,
      StreamIdentity.batchTag(prefix, batchId)) { stage =>
      row.coalesce(1).write.mode("overwrite").parquet(stage)
    }
    handOff
  }

  /** Build the foreachBatch writer for a streaming `(doc_id, text)`
    * frame. `auditPath` must be an initialized IndexStore dir (any
    * existing index path, or a fresh dir — the audit table is created
    * on first append). The caller sets trigger/checkpoint options and
    * calls `.start()`. */
  def gateIngest(docs: DataFrame, auditPath: String,
                 onKept: (DataFrame, Long) => Unit,
                 minQuality: Double = 0.25,
                 streamId: Option[String] = None): DataStreamWriter[Row] =
    docs.writeStream.foreachBatch { (batch: Dataset[Row], batchId: Long) =>
      val b = batch.persist()
      try {
        if (!b.isEmpty) {
          val s = b.sparkSession
          // incarnation-namespaced tag — see StreamIdentity (r17 advice):
          // un-namespaced, a fresh checkpoint's batch 0 would sweep away
          // the previous incarnation's committed b0 audit row
          val prefix = StreamIdentity.incarnationPrefix(s, streamId)
          ingestGateBatch(s, auditPath, b.toDF(), prefix, batchId,
            minQuality, onKept)
          ()
        }
      } finally b.unpersist()
    }

  /** Read the accumulated audit table (empty frame if no batch has
    * published yet — a dashboard polling an idle stream must not
    * throw on the not-yet-created path). */
  def auditTableOf(s: org.apache.spark.sql.SparkSession,
                   auditPath: String): DataFrame = {
    val path = IndexStore.tableDataPath(s, auditPath, auditTable)
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(s.sparkContext.hadoopConfiguration)
    if (fs.exists(new org.apache.hadoop.fs.Path(path)))
      s.read.parquet(path)
    else
      s.createDataFrame(s.sparkContext.emptyRDD[Row], auditSchema)
  }
}
