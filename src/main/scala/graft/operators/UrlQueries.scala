package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** URL canonicalization + URL-keyed deduplication (d14) — the FIRST
  * dedup every crawl pipeline runs, before any content pass: the same
  * page is fetched under scheme/host case variants, default ports,
  * `www.` prefixes, tracker query params (`utm_*`, `fbclid`, `gclid`),
  * fragments, and trailing slashes, and deduping on the RAW url string
  * misses all of them (cf. the CCNet/RefinedWeb URL-level pass).
  *
  * Canonical form (fixed order, each step on the previous one's
  * output — the t18/t32 progressive discipline, stated identically in
  * both engines):
  *   1. lowercase the scheme and the authority (never the path: paths
  *      are case-significant);
  *   2. strip the scheme's default port (`:443` for https, `:80` for
  *      http — a non-default port is identity-significant and stays);
  *   3. strip a leading `www.`;
  *   4. drop the fragment (`#...` — client-side only);
  *   5. drop tracker params (`utm_*`, `fbclid`, `gclid`) WITHIN the
  *      isolated query substring (values may legally contain `/`),
  *      plus any dangling `?`/`&` they leave; non-tracker params
  *      survive;
  *   6. strip one trailing slash unless the path is root.
  * Schemes are NOT folded (http ≠ https — different resources until
  * proven otherwise) and non-tracker query order is preserved (param
  * reordering changes semantics for some endpoints).
  *
  * Scale shape: canonicalization is pure map-side codegen'd regex work
  * (literal patterns, compiled once per task). The keep election is
  * ONE canonical-key aggregate with map-side partial `min` — shuffle
  * rows are (canonical, doc_id), address-width, never document bytes —
  * broadcast-free, and the per-source audit is a second aggregate of
  * |sources| rows on the already-thin frame. At 100 TB the canonical
  * key is the natural bucketing column for the downstream exact-dedup
  * stage, so this pass's shuffle is reusable layout, not overhead.
  */
object UrlQueries {

  /** Tracker removal in two anchored passes over the ISOLATED QUERY
    * SUBSTRING (r19, the r18 advice finding: applied to the whole
    * tail with value class `[^&#/]*`, a tracker value containing a
    * `/` — legal inside query values per RFC 3986 §3.4 — stopped the
    * strip mid-value and left a mangled residue key, so same-page
    * URLs differing only in a slash-bearing tracker value neither
    * unified nor kept their original query). The query is split off
    * at the first `?` AFTER the fragment drop, so values stop only at
    * `&` and path crossing is structurally impossible; the r18
    * anchoring (no match on `?xgclid=1`) is preserved. Pass 1 removes
    * every `&tracker=value`; pass 2 removes a LEADING `tracker=value[&]`.
    * Consecutive trackers work because pass 1 leaves the leading one
    * for pass 2. */
  private val trackerAmpRe = "&(utm_[a-z]+|fbclid|gclid)=[^&]*"
  private val trackerLeadRe = "^(utm_[a-z]+|fbclid|gclid)=[^&]*&?"

  /** The d14 messy-URL injection — collision-HEAVY by design (host mod
    * 7 × page mod 50 → ≤ 700 canonical addresses per corpus), right
    * for a dedup OPERATOR test where every status class must be
    * populated. The funnel oracles (p9/p12) inject their own
    * funnel-shaped `u` (per-doc-unique pages, ~10 % dup rate —
    * [[Scaffold.messyUrlFunnel]]) and reuse [[urlCanonChain]]. */
  private[graft] val urlInjectCte: String = """u AS (
        SELECT doc_id, source,
               CASE doc_id % 6
                 WHEN 0 THEN 'https://www.d' || CAST(doc_id % 7 AS VARCHAR) || '.com/a/' || CAST(doc_id % 50 AS VARCHAR)
                 WHEN 1 THEN 'HTTPS://' || upper('d' || CAST(doc_id % 7 AS VARCHAR) || '.com') || '/a/' || CAST(doc_id % 50 AS VARCHAR) || '/'
                 WHEN 2 THEN 'https://www.d' || CAST(doc_id % 7 AS VARCHAR) || '.com:443/a/' || CAST(doc_id % 50 AS VARCHAR)
                 WHEN 3 THEN 'https://d' || CAST(doc_id % 7 AS VARCHAR) || '.com/a/' || CAST(doc_id % 50 AS VARCHAR) || '?utm_source=x&utm_campaign=y'
                 WHEN 4 THEN 'https://www.d' || CAST(doc_id % 7 AS VARCHAR) || '.com/a/' || CAST(doc_id % 50 AS VARCHAR) || '#frag'
                 ELSE 'http://d' || CAST(doc_id % 7 AS VARCHAR) || '.com/b/' || CAST(doc_id % 50 AS VARCHAR)
               END AS url
        FROM documents)"""

  /** The canonicalization chain (steps 1–6 of the object-doc contract)
    * restated once for ALL consuming oracles — d14 full run, d14b
    * stored probe, and the p9/p12 URL-first funnel stages (ONE
    * definition, the d10OracleCtes discipline). Reads a CTE `u` with
    * (doc_id, source, url); yields `c` with `canonical_url`. Stated
    * WITHOUT the `WITH` keyword so the funnel oracles can prepend
    * `WITH RECURSIVE` (their connected-components closure needs it);
    * the d14 oracles use the plain-`WITH` wrapper. */
  private[graft] val urlCanonChain: String = """c1 AS (
        SELECT doc_id, source, url,
               lower(regexp_extract(url, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) AS scheme,
               regexp_replace(url, '^[A-Za-z][A-Za-z0-9+.-]*://', '') AS rest
        FROM u),
      c2 AS (
        SELECT doc_id, source, url, scheme,
               regexp_replace(
                 CASE scheme
                   WHEN 'https' THEN regexp_replace(lower(regexp_extract(rest, '^([^/?#]*)', 1)), ':443$', '')
                   WHEN 'http' THEN regexp_replace(lower(regexp_extract(rest, '^([^/?#]*)', 1)), ':80$', '')
                   ELSE lower(regexp_extract(rest, '^([^/?#]*)', 1))
                 END, '^www[.]', '') AS auth,
               regexp_replace(regexp_extract(rest, '^[^/?#]*(.*)$', 1), '#.*$', '') AS tail1
        FROM c1),
      c3 AS (
        SELECT doc_id, source, url, scheme, auth,
               regexp_extract(tail1, '^([^?]*)', 1) AS path0,
               regexp_replace(regexp_replace(regexp_replace(
                 regexp_extract(tail1, '^[^?]*\?(.*)$', 1),
                 '&(utm_[a-z]+|fbclid|gclid)=[^&]*', '', 'g'),
                 '^(utm_[a-z]+|fbclid|gclid)=[^&]*&?', ''),
                 '&$', '') AS q
        FROM c2),
      c AS (
        SELECT doc_id, source, url,
               scheme || '://' || auth ||
               regexp_replace(regexp_replace(
                 path0 || CASE WHEN q <> '' THEN '?' || q ELSE '' END,
                 '([^/])/$', '\1'),
                 '^/$', '') AS canonical_url
        FROM c3)"""

  private val urlOracleCtes: String =
    "\n      WITH " + urlInjectCte + ",\n      " + urlCanonChain

  /** Canonicalize a URL column (see object doc for the contract). */
  private[graft] def canonicalUrl(u: Column): Column = {
    val scheme = lower(regexp_extract(u, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    val rest = regexp_replace(u, "^[A-Za-z][A-Za-z0-9+.-]*://", "")
    val auth0 = lower(regexp_extract(rest, "^([^/?#]*)", 1))
    val auth1 = when(scheme === "https", regexp_replace(auth0, ":443$", ""))
      .when(scheme === "http", regexp_replace(auth0, ":80$", ""))
      .otherwise(auth0)
    val auth = regexp_replace(auth1, "^www[.]", "")
    val tail0 = regexp_extract(rest, "^[^/?#]*(.*)$", 1)
    val tail1 = regexp_replace(tail0, "#.*$", "")
    // isolate path vs query at the FIRST '?' (fragment already gone),
    // strip trackers within the query only, then reassemble — a query
    // emptied of every param folds back to the bare path. The instr
    // guard short-circuits the whole split/strip/reassemble chain (five
    // regex ops) on query-less URLs — the common crawl case, and the
    // r19 bench showed the tracker-isolation fix's extra regex passes
    // as a real 1.5× on d14; a no-'?' tail is definitionally its own
    // path0 with an empty query, so the guard is a pure evaluation
    // shortcut, not a semantic branch
    val path0 = regexp_extract(tail1, "^([^?]*)", 1)
    val query0 = regexp_extract(tail1, "^[^?]*[?](.*)$", 1)
    val query1 = regexp_replace(regexp_replace(query0, trackerAmpRe, ""),
      trackerLeadRe, "")
    val query2 = regexp_replace(query1, "&$", "")
    val tail3 = when(instr(tail1, "?") === 0, tail1)
      .otherwise(when(query2 === "", path0)
        .otherwise(concat(path0, lit("?"), query2)))
    val tail4 = regexp_replace(tail3, "([^/])/$", "$1")
    // unify the empty path with the bare root slash — 'ex.com' and
    // 'ex.com/' are the single most common crawl variant pair
    val tail = regexp_replace(tail4, "^/$", "")
    // a null url is a malformed ingest row: loud beats lossy (the
    // documentsJsonl discipline) — a silent null canonical key would
    // drop the row from every keyed join downstream
    when(u.isNull, raise_error(lit(
      "canonicalUrl: null url — malformed ingest row")))
      .otherwise(concat(scheme, lit("://"), auth, tail))
  }

  /** Per-doc canonical mapping + global keep election (min doc_id per
    * canonical URL): adds `canonical_url` and `is_kept`. */
  private[graft] def urlDedup(docs: DataFrame, urlCol: String = "url"): DataFrame = {
    val withCanon = docs.withColumn("canonical_url", canonicalUrl(col(urlCol)))
    val keepers = withCanon.groupBy(col("canonical_url"))
      .agg(min(col("doc_id")).as("__keep_id"))
    withCanon.join(keepers, Seq("canonical_url"))
      .withColumn("is_kept", col("doc_id") === col("__keep_id"))
      .drop("__keep_id")
  }

  /** The URL-KEPT rows themselves (min-doc_id row per canonical URL) in
    * ONE aggregate — the exactCanonOf shape applied to the address key:
    * groupBy(canonical) with min_by carrying the whole row, so the
    * funnel stage pays a single canonical-keyed shuffle and no join-back
    * (r19; [[urlDedup]] keeps the join-back form because d14's audit
    * needs `is_kept` on EVERY row, kept and dropped alike). At 100 TB
    * the canonical key is the natural bucketing column for the
    * downstream exact-dedup stage, so this shuffle is reusable layout. */
  private[graft] def urlCanonOf(docs: DataFrame, urlCol: String = "url"): DataFrame =
    docs
      .groupBy(canonicalUrl(col(urlCol)).as("__cu"))
      .agg(min_by(struct(docs.columns.map(col): _*), col("doc_id")).as("__r"))
      .select(col("__r.*"))

  // ---- d14b: stored canonical-URL index probe --------------------------

  private val FormatStamp = "_graft_url_format"
  // v2 (r19): tracker stripping moved to the ISOLATED query substring
  // (values may cross '/'), changing canonical keys for slash-bearing
  // tracker values — a keeper table persisted under v1 semantics holds
  // incompatible keys and must be rebuilt, so the format value is the
  // CANONICALIZATION version, not just the layout (the stamp exists to
  // catch exactly this class of silent-probe-miss)
  private val FormatValue = "urlcanon-v2:(canonical_url, keeper_id)"

  /** Build the stored canonical-URL keeper table from a corpus
    * snapshot: one row per canonical URL carrying the elected keeper
    * (min doc_id). Unlike the log-structured count indexes (d10b/d12b),
    * this is a KEYED KEEPER table — daily maintenance is the versioned
    * rename-swap rebuild of changed keys, not delta appends, so no
    * compaction job is needed. */
  def initStoredUrlIndex(s: org.apache.spark.sql.SparkSession, path: String,
                         docs: DataFrame): Unit = {
    graft.sources.IndexStore.clearStamp(s, path, FormatStamp)
    docs.withColumn("canonical_url", canonicalUrl(col("url")))
      .groupBy(col("canonical_url")).agg(min(col("doc_id")).as("keeper_id"))
      .write.mode("overwrite")
      .parquet(graft.sources.IndexStore.resetTablePath(s, path, "keepers"))
    graft.sources.IndexStore.writeStamp(s, path, FormatStamp, FormatValue)
  }

  /** Probe a new-crawl increment against the stored keeper table —
    * the O(increment)/day seat of d14 (a daily pipeline never re-scans
    * the corpus to dedup today's fetch): per batch doc, the keeper and
    * a three-way verdict — `dup_of_stored` (the address already
    * shipped; first-crawled wins, so the STORED keeper stands),
    * `unique` (first occurrence anywhere), `dup_in_batch` (new address
    * fetched twice today; min batch doc_id wins).
    *
    * Scale shape: the batch's distinct canonical keys go through the
    * MEASURED broadcast guard and semi-join the index MAP-SIDE — the
    * index is scanned once, never shuffled, and the matched slice is
    * increment-sized by construction (≤ |batch keys|), so the verdict
    * joins are broadcasts. Past the guard cap everything degrades to
    * the scale-safe canonical-keyed shuffle join. */
  /** The canonicalized batch, staged once per lifecycle call. */
  private def canonBatch(batch: DataFrame): DataFrame =
    graft.plans.Stage(batch.withColumn("canonical_url", canonicalUrl(col("url"))))

  /** Stored keeper rows whose canonical key appears in the (already
    * canonicalized, staged) batch: the batch's distinct keys go
    * through the MEASURED broadcast guard and semi-join the index
    * MAP-SIDE — the index is scanned once, never shuffled, and the
    * slice is increment-sized by construction (≤ |batch keys|). */
  private def storedMatched(s: org.apache.spark.sql.SparkSession, path: String,
                            b: DataFrame, maxBroadcastKeys: Long): DataFrame = {
    val idx = graft.sources.IndexStore.readSwappable(s, path, "keepers")
    val keys = QueryDef.guardedBroadcast(
      b.select(col("canonical_url")).distinct(), maxBroadcastKeys)
    idx.join(keys, Seq("canonical_url"), "left_semi")
  }

  /** Verdict frame from the shared staged frames (see
    * [[ingestUrlBatch]] for why these are threaded, not recomputed).
    * Both small sides (the matched index slice, the per-key batch
    * minima) go through the MEASURED guard — they are increment-sized
    * by construction, but "small by construction" is exactly the claim
    * the guard discipline exists to verify: past the cap every join
    * degrades to the scale-safe canonical-keyed shuffle. */
  /** The broadcast DECISION for the staged matched slice — one count
    * of the materialized blocks per lifecycle call, threaded to every
    * consumer (computing it inside each consumer would re-run the
    * count per join — the r18 review's double-count finding). */
  private def matchedIsSmall(staged: DataFrame, cap: Long): Boolean =
    staged.count() <= cap

  private def verdictsOf(b: DataFrame, matched: DataFrame, mSmall: Boolean,
                         maxBroadcastKeys: Long): DataFrame = {
    val bmin = QueryDef.guardedBroadcast(
      b.groupBy(col("canonical_url")).agg(min(col("doc_id")).as("__batch_keep")),
      maxBroadcastKeys)
    val m = if (mSmall) broadcast(matched) else matched
    b.join(m, Seq("canonical_url"), "left")
      .join(bmin, Seq("canonical_url"))
      .select(col("doc_id"),
        coalesce(col("keeper_id"), col("__batch_keep")).as("keeper_id"),
        when(col("keeper_id").isNotNull, lit("dup_of_stored"))
          .when(col("doc_id") === col("__batch_keep"), lit("unique"))
          .otherwise(lit("dup_in_batch")).as("status"))
      .orderBy("doc_id")
  }

  def probeUrlBatch(s: org.apache.spark.sql.SparkSession, path: String,
                    batch: DataFrame,
                    maxBroadcastKeys: Long = 5000000L): DataFrame = {
    graft.sources.IndexStore.requireStamp(s, path, FormatStamp, FormatValue,
      "url-index format")
    val b = canonBatch(batch)
    val matched = graft.plans.Stage(storedMatched(s, path, b, maxBroadcastKeys))
    verdictsOf(b, matched, matchedIsSmall(matched, maxBroadcastKeys),
      maxBroadcastKeys)
  }

  // ---- streaming lifecycle surface (UrlIngest) -------------------------

  /** Heal a crashed/replayed STREAMING batch's keeper files before
    * re-probing — idempotent; called by `UrlIngest` at batch start. */
  def sweepUrlStreamBatch(s: org.apache.spark.sql.SparkSession, path: String,
                          tag: String): Unit =
    graft.sources.IndexStore.sweepTaggedFiles(s, path, "keepers", tag)

  /** Replay-safe tagged append of the batch's NEW canonical keepers
    * (first occurrence of an address nobody stored yet; min batch
    * doc_id wins inside the batch). Appends are append-only BY
    * CONSTRUCTION — only keys absent from the index at append time are
    * written, and streaming batches are sequential, so the one-row-
    * per-canonical invariant the probe relies on holds across any
    * number of folds. Duplicate ADDRESSES are the operator's normal
    * input; a duplicate DOC ID is a pipeline bug — the detectable
    * slice (a batch id that is already a stored KEEPER, which is
    * exactly what a re-sent batch under a fresh tag produces)
    * fail-stops on the increment-sized matched frame, never a full
    * index scan. */
  /** Gate + fold from the shared staged frames: fail-stop on a batch
    * doc id that is already a stored keeper (a re-sent batch under a
    * fresh tag — the detectable slice of duplicate-doc ingestion,
    * checked on the increment-sized matched frame), then publish the
    * batch's NEW canonical keepers under the tag. */
  private def gateAndFold(s: org.apache.spark.sql.SparkSession, path: String,
                          b: DataFrame, matched: DataFrame, tag: String,
                          mSmall: Boolean, maxBroadcastKeys: Long): Unit = {
    // measured guards, never bare hints: these frames are increment-
    // sized by construction, and the guard is what keeps that claim
    // honest when the increment itself outgrows the broadcast cap
    val bIds = QueryDef.guardedBroadcast(
      b.select(col("doc_id")).distinct(), maxBroadcastKeys)
    val clash = matched
      .join(bIds, matched("keeper_id") === bIds("doc_id"), "left_semi")
      .count()
    require(clash == 0,
      s"appendUrlKeepersTagged: $clash batch doc ids are already stored " +
        s"keepers under $path — batch ids must be disjoint from ingested docs")
    val mKeys = (if (mSmall) broadcast(matched) else matched)
      .select(col("canonical_url"))
    val newKeepers = b
      .join(mKeys, Seq("canonical_url"), "left_anti")
      .groupBy(col("canonical_url")).agg(min(col("doc_id")).as("keeper_id"))
    graft.sources.IndexStore.publishTaggedAppend(s, path, "keepers", tag) { stage =>
      newKeepers.write.mode("overwrite").parquet(stage)
    }
  }

  def appendUrlKeepersTagged(s: org.apache.spark.sql.SparkSession, path: String,
                             batch: DataFrame, tag: String,
                             maxBroadcastKeys: Long = 5000000L): Unit = {
    graft.sources.IndexStore.requireStamp(s, path, FormatStamp, FormatValue,
      "url-index format")
    sweepUrlStreamBatch(s, path, tag) // a prior attempt must not trip the gate
    val b = canonBatch(batch)
    val matched = graft.plans.Stage(storedMatched(s, path, b, maxBroadcastKeys))
    gateAndFold(s, path, b, matched, tag,
      matchedIsSmall(matched, maxBroadcastKeys), maxBroadcastKeys)
  }

  /** The streaming batch body: sweep → ONE canonicalization + ONE
    * index scan shared by the probe and the fold (the staged frames
    * are threaded through both, instead of probe and append each
    * re-canonicalizing the batch and re-scanning the keeper table —
    * at production index scale that recomputation doubles per-batch
    * I/O), verdicts handed to the caller BEFORE the fold so a failed
    * consumer leaves the index unappended and the replay exact. */
  /** Returns the same verdict frame handed to `onVerdicts` (anchored
    * to the staged pre-fold state, so evaluating it after this call
    * cannot see the fold's own appends) — composed lifecycles build
    * their downstream plan from the return value; side-effecting
    * consumers keep the before-the-fold callback. */
  def ingestUrlBatch(s: org.apache.spark.sql.SparkSession, path: String,
                     batch: DataFrame, tag: String,
                     onVerdicts: DataFrame => Unit,
                     maxBroadcastKeys: Long = 5000000L): DataFrame = {
    graft.sources.IndexStore.requireStamp(s, path, FormatStamp, FormatValue,
      "url-index format")
    sweepUrlStreamBatch(s, path, tag)
    val b = canonBatch(batch)
    val matched = graft.plans.Stage(storedMatched(s, path, b, maxBroadcastKeys))
    // ONE count decides the broadcast hint for both consumers
    val mSmall = matchedIsSmall(matched, maxBroadcastKeys)
    val verdicts = verdictsOf(b, matched, mSmall, maxBroadcastKeys)
    onVerdicts(verdicts)
    gateAndFold(s, path, b, matched, tag, mSmall, maxBroadcastKeys)
    verdicts
  }

  /** Batch boundary 400: canonical collisions repeat every 350 ids
    * (lcm of the scaffold's host mod 7 and page mod 50), so ids < 400
    * exercise BOTH in-batch dups (x vs x+350, x < 50) and dups against
    * the stored ≥ 400 corpus — the d10b split convention, widened so
    * no status class is vacuous at sf0.01. */
  val dUrlDedupStored = QueryDef(
    "d14b_url_dedup_stored",
    (s, dir) => {
      val docs = Tables.documents(s, dir)
        .select(col("doc_id"), Scaffold.messyUrl.as("url"))
      val path = graft.sources.IndexStore.indexPath(dir, "urlcanon_ge_400")
      val meta = "v2|corpus=(doc_id >= 400)|src=" +
        graft.sources.IndexStore.sourceStamp(s, s"$dir/documents.parquet")
      graft.sources.IndexStore.ensure(s, path, meta) {
        initStoredUrlIndex(s, path, docs.filter(col("doc_id") >= 400))
      }
      probeUrlBatch(s, path, docs.filter(col("doc_id") < 400))
    },
    Some(s"""
      $urlOracleCtes,
      sk AS (SELECT canonical_url, MIN(doc_id) AS stored_keep
             FROM c WHERE doc_id >= 400 GROUP BY canonical_url),
      bm AS (SELECT canonical_url, MIN(doc_id) AS batch_keep
             FROM c WHERE doc_id < 400 GROUP BY canonical_url)
      SELECT c.doc_id,
             COALESCE(sk.stored_keep, bm.batch_keep) AS keeper_id,
             CASE WHEN sk.stored_keep IS NOT NULL THEN 'dup_of_stored'
                  WHEN c.doc_id = bm.batch_keep THEN 'unique'
                  ELSE 'dup_in_batch' END AS status
      FROM c LEFT JOIN sk USING (canonical_url) JOIN bm USING (canonical_url)
      WHERE c.doc_id < 400 ORDER BY c.doc_id"""))

  val dUrlDedup = QueryDef(
    "d14_url_dedup",
    (s, dir) => {
      // url synthesis is QueryDef-only scaffolding — Scaffold.messyUrl
      val docs = Tables.documents(s, dir)
        .select(col("doc_id"), col("source"), Scaffold.messyUrl.as("url"))
      urlDedup(docs)
        .groupBy(col("source"))
        .agg(
          count(lit(1)).as("n_docs"),
          countDistinct(col("url")).as("n_raw_urls"),
          countDistinct(col("canonical_url")).as("n_canon_urls"),
          sum(col("is_kept").cast("long")).as("n_kept"),
          sum((!col("is_kept")).cast("long")).as("n_dropped"),
          sum(conv(substring(md5(col("canonical_url")), 1, 10), 16, 10)
            .cast("long")).as("canon_digest"))
        .orderBy("source")
    },
    Some(s"""
      $urlOracleCtes,
      k AS (SELECT canonical_url, MIN(doc_id) AS keep_id FROM c GROUP BY canonical_url)
      SELECT source, COUNT(*) AS n_docs,
             COUNT(DISTINCT url) AS n_raw_urls,
             COUNT(DISTINCT c.canonical_url) AS n_canon_urls,
             CAST(SUM(CASE WHEN doc_id = keep_id THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
             CAST(SUM(CASE WHEN doc_id = keep_id THEN 0 ELSE 1 END) AS BIGINT) AS n_dropped,
             CAST(SUM(CAST(('0x' || substring(md5(c.canonical_url), 1, 10)) AS BIGINT)) AS BIGINT) AS canon_digest
      FROM c JOIN k USING (canonical_url)
      GROUP BY source ORDER BY source"""))

  val all: Seq[QueryDef] = Seq(dUrlDedup, dUrlDedupStored)
}
