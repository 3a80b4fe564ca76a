package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.streaming.DataStreamWriter

import graft.sources.{IncrementalRelease, IndexStore}

/** STREAMING release publication — p10's incremental-release lineage
  * (publishFull / publishDelta) run as a Structured Streaming sink:
  * the tenth lifecycle, giving the RELEASE artifact family the same
  * streaming seat the five stored-index families have. Each micro-
  * batch carries a snapshot's COMPLETE logical release frame (the
  * publishDelta contract: the diff finds what changed — producers
  * never pre-compute deltas). The first publish against an empty root
  * is FULL; every later batch publishes a DELTA version whose write is
  * O(touched buckets), and the caller receives the published
  * artifact's manifest per batch (`onManifest` — release dashboards,
  * downstream triggers).
  *
  * Delivery semantics — exactly-once VERSIONS, in three layers:
  *  1. a publish that crashes mid-write leaves an uncommitted version
  *     dir and orphan pool files; the next publish's built-in sweep
  *     (`vSweepUncommitted` + `gcUnreferencedPool`) heals them before
  *     writing — no batch-start sweep call is needed here because the
  *     publisher already owns one;
  *  2. a REPLAYED batch (crash after the version committed but before
  *     the streaming checkpoint advanced) re-publishes identical
  *     content — publishDelta's empty-diff no-op returns the current
  *     manifest WITHOUT minting a version, so replays converge with no
  *     version litter;
  *  3. a REWOUND checkpoint (an older snapshot re-arriving under a
  *     lower batchId) would be a genuine regression-publish — a real
  *     new version stepping the artifact backwards — and fail-stops at
  *     the per-incarnation monotonic batch stamp below: the
  *     `requireMonotonicBatch` discipline restated for a versioned
  *     artifact, which has no tagged data files to inspect, so the
  *     last applied batchId is carried in a stamp keyed by the
  *     checkpointed query id ([[StreamIdentity]] — stable across
  *     restarts of the same checkpoint, fresh for a fresh one; a fresh
  *     incarnation legitimately starts over at batch 0 and publishes
  *     its snapshot as the next delta — which also means the rewind
  *     gate is PER-INCARNATION: a fresh checkpoint fed an older
  *     snapshot is indistinguishable from a legitimate new snapshot
  *     and publishes it. Deployments that need cross-incarnation
  *     regression protection must carry a snapshot watermark in the
  *     data and gate upstream; the stamp cannot see content age).
  *
  * Notification semantics — `onManifest` is AT-LEAST-ONCE per version,
  * NOT exactly-once: the callback fires after the batch stamp, so a
  * crash between the stamp and the callback replays as `==`, whose
  * re-publish no-ops via the empty diff and then fires `onManifest`
  * again with the same manifest. (Skipping the callback on `==` would
  * flip the failure mode to ZERO notifications for that version — the
  * crash window between stamp and callback would swallow it — which is
  * strictly worse for the dashboards/triggers this hook feeds.) Make
  * `onManifest` side effects idempotent, keyed by the manifest's
  * version or the batchId it receives.
  *
  * Scale shape: identical to p10's — the stream adds NO corpus-sized
  * state of its own (no streaming state store; the artifact IS the
  * state), each batch pays one fingerprint scan per diff side and an
  * O(touched buckets) write.
  */
object ReleaseIngest {

  private def stampName(prefix: String) = s"_graft_release_stream_$prefix"

  /** The per-batch ingest body (factored out so crash/rewind drivers —
    * tests, backfills — can invoke it outside a streaming query with an
    * explicit prefix). Empty-skip → gate → publish → advance the stamp
    * → hand the manifest to the caller (at-least-once per version —
    * see the object doc's Notification semantics). */
  private[graft] def ingestReleaseBatch(s: SparkSession, root: String,
                                        batch: DataFrame, prefix: String,
                                        batchId: Long, nBuckets: Int,
                                        onManifest: (DataFrame, Long) => Unit): Unit = {
    // spurious empty trigger — skip without advancing the stamp (see
    // the releaseIngest doc for why "the corpus became empty" cannot
    // ride this sink either way)
    if (batch.isEmpty) return
    val last = IndexStore.readStamp(s, root, stampName(prefix)).map(_.toLong)
    // == is a legitimate replay (publish committed, checkpoint did not
    // advance) and converges via the empty-diff no-op; < is a rewind
    require(last.forall(batchId >= _),
      s"release stream batch $batchId arrived after batch ${last.get} was " +
        s"applied under $root (incarnation $prefix) — a rewound checkpoint " +
        "would regression-publish an older snapshot; restore the checkpoint " +
        "or start a fresh incarnation from the intended snapshot")
    val manifest =
      if (IncrementalRelease.versions(s, root).isEmpty)
        IncrementalRelease.publishFull(batch, root, nBuckets)
      else
        IncrementalRelease.publishDelta(batch, root, nBuckets)
    // stamp AFTER the publish: a crash in between replays as ==, which
    // re-publishes the identical content and no-ops
    IndexStore.writeStamp(s, root, stampName(prefix), batchId.toString)
    onManifest(manifest, batchId)
  }

  /** Build the foreachBatch writer for a stream of complete logical
    * release frames (full release contract columns) against the
    * versioned root at `root`. The caller sets trigger / checkpoint
    * options and calls `.start()`.
    *
    * EMPTY micro-batches are skipped — deliberately, for two stacked
    * reasons: Structured Streaming delivers spurious empty batches
    * (trigger fires, no data), which must not advance the lineage; and
    * the publisher itself REFUSES to commit an empty release (a
    * zero-document artifact is a contract violation, not a snapshot),
    * so "the corpus became empty" cannot ride this sink either way —
    * a takedown-to-zero event is an operational action on the root,
    * not a publishable version. ReleaseIngestSpec pins the no-op. */
  def releaseIngest(docs: DataFrame, root: String,
                    onManifest: (DataFrame, Long) => Unit,
                    nBuckets: Int = 8,
                    streamId: Option[String] = None): DataStreamWriter[Row] =
    docs.writeStream.foreachBatch { (batch: Dataset[Row], batchId: Long) =>
      val b = batch.persist()
      try {
        val s = b.sparkSession
        val prefix = StreamIdentity.incarnationPrefix(s, streamId)
        // the body owns the empty-skip, so direct drivers get it too
        ingestReleaseBatch(s, root, b.toDF(), prefix, batchId, nBuckets,
          onManifest)
      } finally b.unpersist()
    }
}
