package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter

import graft.operators.{DedupQueries, SampleQueries, UrlQueries}
import graft.sources.IncrementalRelease

/** STREAMING crawl front-door — the ELEVENTH lifecycle (r20, the r19
  * verdict's #4): the crawl-shaped composition the four stage ingests
  * left to hand-wiring, run as ONE micro-batch body under ONE
  * checkpoint. Each micro-batch of newly crawled
  * `(doc_id, text, url[, source, lang])` rows flows
  *
  *   URL keeper probe (+ fold)            — d14b, first-crawled wins
  *   → Gopher/quality gate + PII scrub    — t23/t9-rule + t18, audited
  *   → MinHash near-dup probe (+ fold)    — d2/d8, keep-first drop
  *   → release delta publish              — p10, versioned artifact
  *
  * exactly the order the batch funnels mandate (URL dedup before any
  * content pass; gates before near-dup so junk never pollutes the
  * index; scrub before anything downstream persists text).
  *
  * Composition semantics (CrawlIngestSpec pins both):
  *  - BATCH-TWIN EQUALITY: under the monotone-crawl-id contract the
  *    released corpus after N batches equals the one-shot batch
  *    composition over the concatenated arrivals — URL min-id
  *    election, gate, scrub, then near-dup keep-first (drop the
  *    greater side of every pair). First-crawled-wins per stage makes
  *    stream order and batch election agree.
  *  - EXACTLY-ONCE across ALL folded stores, by composing each
  *    family's own contract under the SAME incarnation tag: the URL
  *    keeper fold, the gate-audit row and the MinHash index fold are
  *    tagged publishes (sweep-stage-rename; a replay sweeps its own
  *    attempt and republishes), the release is versioned with the
  *    empty-diff replay no-op, and every store fail-stops a rewound
  *    checkpoint via the shared monotonic-batch gates. A crash BETWEEN
  *    stage folds replays the whole batch: stages before the crash
  *    sweep-and-converge, stages after run for the first time — no
  *    store double-folds, none is skipped.
  *
  * The released document's `text` is the SCRUBBED text and `n_chars`
  * its length (the scrub precedes everything that persists — a crawl
  * release never ships raw PII); `split` is the shared deterministic
  * split column. The release grows append-only: each batch publishes
  * prior-release ∪ batch survivors (survivors are anti-joined against
  * the prior release's ids, so a replayed batch contributes nothing
  * new and the delta no-ops).
  *
  * Scale shape per batch: every stage is O(batch) — the three indexes
  * are touched only through guarded-broadcast map-side probes and
  * batch-sized tagged appends, the gate/scrub are codegen'd map work,
  * and the release pays publishDelta's documented per-publish
  * fingerprint scan (release-sized) plus an O(touched-buckets) write.
  * No streaming state store at any corpus size — state lives in the
  * four stores, exactly the sibling-lifecycle posture.
  */
object CrawlIngest {

  /** The per-batch front-door body (factored so crash/replay drivers —
    * tests, backfills — can invoke it outside a streaming query with an
    * explicit prefix). See the object doc for the stage order and the
    * exactly-once composition argument. */
  private[graft] def ingestCrawlBatch(s: SparkSession,
                                      urlIndexPath: String,
                                      gateAuditPath: String,
                                      dedupIndexPath: String,
                                      releaseRoot: String,
                                      batch: DataFrame,
                                      prefix: String, batchId: Long,
                                      minQuality: Double = 0.25,
                                      k: Int = 16, bands: Int = 4,
                                      threshold: Double = 0.5,
                                      nBuckets: Int = 8,
                                      onVerdicts: (DataFrame, Long) => Unit = (_, _) => (),
                                      onKept: (DataFrame, Long) => Unit = (_, _) => (),
                                      onPairs: (DataFrame, Long) => Unit = (_, _) => (),
                                      onManifest: (DataFrame, Long) => Unit = (_, _) => ()): Unit = {
    val tag = StreamIdentity.batchTag(prefix, batchId)
    // ---- 1. URL stage: probe + keeper fold (first-crawled wins) ------
    graft.sources.IndexStore.requireMonotonicBatch(
      s, urlIndexPath, Seq("keepers"), prefix, batchId)
    val verdicts = UrlQueries.ingestUrlBatch(s, urlIndexPath,
      batch.select(col("doc_id"), col("url")), tag,
      v => onVerdicts(v, batchId))
    val urlKept = batch.drop("url").join(
      verdicts.filter(col("doc_id") === col("keeper_id")).select(col("doc_id")),
      "doc_id")
    // ---- 2. gate + scrub (audit row appends under the same tag) ------
    val scrubbed = GateIngest.ingestGateBatch(s, gateAuditPath, urlKept,
      prefix, batchId, minQuality, (kept, id) => onKept(kept, id))
    val survivorsIn = graft.plans.Stage(
      scrubbed.withColumn("n_chars", length(col("text")).cast("long")))
    // ---- 3. near-dup stage: probe + index fold (keep-first drop) -----
    val pairs = DedupIngest.ingestDedupBatch(s, dedupIndexPath, survivorsIn,
      prefix, batchId, k, bands, threshold, (p, id) => onPairs(p, id))
    // pairs are a<b normalized; under monotone ids the greater side
    // is always the newer doc — keep-first drops it
    val dropIds = pairs.select(col("b").as("doc_id")).distinct()
    // staged: the emptiness gate, the prior-release anti-join and the
    // publish each evaluate this frame — unstaged, the whole
    // gate→signatures→verify plan would re-execute per consumer
    val survivors = graft.plans.Stage(
      survivorsIn.join(dropIds, Seq("doc_id"), "left_anti")
        .withColumn("split", SampleQueries.splitCol))
    // ---- 4. release: append-only delta publish -----------------------
    val prior =
      if (IncrementalRelease.versions(s, releaseRoot).nonEmpty)
        Some(IncrementalRelease.readCurrent(s, releaseRoot))
      else None
    val complete = prior match {
      case Some(p) =>
        // replay-safe: a batch whose docs already shipped (crash after
        // the version committed) contributes nothing → empty diff no-op
        p.unionByName(
          survivors.join(p.select(col("doc_id")), Seq("doc_id"), "left_anti"),
          allowMissingColumns = true)
      case None => survivors
    }
    if (prior.nonEmpty || !survivors.isEmpty)
      ReleaseIngest.ingestReleaseBatch(s, releaseRoot, complete, prefix,
        batchId, nBuckets, onManifest)
  }

  /** Build the foreachBatch writer for a streaming crawl frame against
    * the four stores (URL keeper index, gate-audit store, MinHash
    * index, release root — each initialized by its own family's init).
    * The caller sets trigger / checkpoint options and calls
    * `.start()`. */
  def crawlIngest(docs: DataFrame,
                  urlIndexPath: String, gateAuditPath: String,
                  dedupIndexPath: String, releaseRoot: String,
                  minQuality: Double = 0.25,
                  k: Int = 16, bands: Int = 4, threshold: Double = 0.5,
                  nBuckets: Int = 8,
                  onVerdicts: (DataFrame, Long) => Unit = (_, _) => (),
                  onKept: (DataFrame, Long) => Unit = (_, _) => (),
                  onPairs: (DataFrame, Long) => Unit = (_, _) => (),
                  onManifest: (DataFrame, Long) => Unit = (_, _) => (),
                  streamId: Option[String] = None): DataStreamWriter[Row] =
    docs.writeStream.foreachBatch { (batch: Dataset[Row], batchId: Long) =>
      val b = batch.persist()
      try {
        if (!b.isEmpty) {
          val s = b.sparkSession
          val prefix = StreamIdentity.incarnationPrefix(s, streamId)
          ingestCrawlBatch(s, urlIndexPath, gateAuditPath, dedupIndexPath,
            releaseRoot, b.toDF(), prefix, batchId, minQuality, k, bands,
            threshold, nBuckets, onVerdicts, onKept, onPairs, onManifest)
        }
      } finally b.unpersist()
    }
}
