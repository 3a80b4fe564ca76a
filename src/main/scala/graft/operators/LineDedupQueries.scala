package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.plans.Stage.StageOps
import graft.sources.Tables

/** Cross-document LINE deduplication — the CCNet/RefinedWeb line-level
  * boilerplate filter, generalized to corpus-frequency semantics: a line
  * whose NORMALIZED form (lowercase, trimmed, inner whitespace
  * collapsed) recurs in at least max(floor, frac·corpus) DISTINCT
  * documents is page chrome ("subscribe to our newsletter"), not
  * content, and is removed from every document while line order is
  * preserved.
  *
  * Distinct from the neighboring dedup operators: d9 scrubs fixed-width
  * TOKEN windows shared by ≥ 2 docs (near-dup span hygiene); t21 flags
  * pack-BOUNDARY windows; d10 is the line-atom, corpus-frequency-
  * thresholded filter production curation stacks run FIRST, before any
  * near-dup pass — the atom is a layout line, the threshold scales with
  * the corpus, and the output is the cleaned-document artifact (kept
  * digest + drop stats), not a pair list.
  *
  * Scale shape (the 100 TB plan):
  *  - ONE corpus-wide shuffle total: the normalized-line → distinct-doc
  *    count aggregate, keyed by the line string with map-side partial
  *    aggregation (shuffle volume is bounded by distinct (line, doc)
  *    pairs, never raw corpus bytes re-keyed more than once).
  *  - The adaptive threshold (frac of corpus) joins in lazily as a
  *    broadcast single-row total — no eager count at construction.
  *  - The boilerplate set above threshold is SMALL by nature (page
  *    chrome, not content). Under `literalCap` it is collected and the
  *    rewrite is a pure MAP-SIDE array filter over each doc's lines —
  *    zero additional shuffle, whole-stage codegen. Past the cap the
  *    rewrite degrades to the scale-safe anti-join + per-doc
  *    re-aggregation route; both routes are exact and LineDedupSpec
  *    pins them equal. The cap (default 256) also bounds the literal
  *    expression tree far below the JIT method budget
  *    (spark-jit-method-budget discipline).
  */
object LineDedupQueries {

  /** The comparison key: lowercase, trimmed, inner runs of spaces
    * collapsed — CCNet's normalization, under which "Subscribe  Now"
    * and "subscribe now" are the same boilerplate class. (Spark
    * regexp_replace is global; the oracle states the same with the 'g'
    * flag.) */
  private def normOf(line: Column): Column =
    lower(trim(regexp_replace(line, " +", " ")))

  /** The above-threshold normalized boilerplate-line set (staged) —
    * shared by the stats artifact ([[boilerplateLines]]) and the
    * text-rewriting form ([[cleanedDocs]]) so the two can never apply
    * different thresholds. */
  private def boilerSet(docs: DataFrame, fracThreshold: Double,
                        floorDocs: Int): DataFrame = {
    val lines = QueryDef.spread(docs)
      .select(col("doc_id"), explode(split(col("text"), "\n")).as("line"))
      .select(col("doc_id"), normOf(col("line")).as("nl"))
    // distinct-doc count per normalized line; corpus total joins in as
    // a broadcast single row so the threshold is plan-contained
    val totals = docs.agg(count(lit(1)).cast("long").as("__n_total"))
    lines.groupBy("nl")
      .agg(countDistinct(col("doc_id")).as("__n_docs"))
      .crossJoin(broadcast(totals))
      .filter(col("__n_docs") >=
        greatest(lit(floorDocs.toLong),
          floor(col("__n_total") * fracThreshold).cast("long")))
      .select("nl").staged
  }

  /** The corpus with boilerplate lines REMOVED — the cleaned-text form
    * a downstream pipeline consumes (the d10 artifact keeps only the
    * digest; a release stack needs the text). Same threshold/normalize
    * semantics via the shared [[boilerSet]]; the rewrite takes the
    * literal map-side route under `literalCap` (page chrome is small),
    * else the anti-join route — both exact, same discipline as
    * [[boilerplateLines]]. Returns (doc_id, text) with kept lines in
    * original order ('' when every line was boilerplate). */
  private[graft] def cleanedDocs(docs: DataFrame, fracThreshold: Double = 0.01,
                                 floorDocs: Int = 3, literalCap: Int = 256): DataFrame = {
    val boiler = boilerSet(docs, fracThreshold, floorDocs)
    val ls = split(col("text"), "\n")
    val capped = boiler.limit(math.max(literalCap, 0) + 1)
      .collect().map(_.getString(0))
    if (capped.length <= literalCap) {
      val set = typedlit(capped.sorted.toSeq)
      docs.select(col("doc_id"),
        array_join(filter(ls, l => !array_contains(set, normOf(l))), "\n").as("text"))
    } else {
      val pos = QueryDef.spread(docs)
        .select(col("doc_id"),
          posexplode(split(col("text"), "\n")).as(Seq("pos", "line")))
      val keptRows = pos.join(boiler.withColumnRenamed("nl", "__b"),
        normOf(col("line")) === col("__b"), "left_anti")
      val agg = keptRows.groupBy("doc_id")
        .agg(array_join(
          transform(
            array_sort(collect_list(struct(col("pos"), col("line")))),
            x => x.getField("line")), "\n").as("__kept_text"))
      docs.select(col("doc_id"))
        .join(agg, Seq("doc_id"), "left")
        .select(col("doc_id"), coalesce(col("__kept_text"), lit("")).as("text"))
    }
  }

  /** docs: any frame with (doc_id, text) where text is '\n'-separated
    * lines. Returns per-doc (n_lines, n_dropped, kept_digest,
    * dropped_frac) with kept lines in original order inside the digest.
    */
  def boilerplateLines(docs: DataFrame, fracThreshold: Double = 0.01,
                       floorDocs: Int = 3, literalCap: Int = 256): DataFrame =
    rewriteStats(docs, boilerSet(docs, fracThreshold, floorDocs), literalCap)

  /** The two-route stats rewrite against an ARBITRARY staged boilerplate
    * set — shared by the full-corpus form ([[boilerplateLines]]) and the
    * stored-index probe ([[probeCleanBatch]]) so both apply the one
    * rewrite semantics. */
  private def rewriteStats(docs: DataFrame, boiler: DataFrame,
                           literalCap: Int): DataFrame = {
    val ls = split(col("text"), "\n")
    val nLines = size(ls).cast("long")
    val capped = boiler.limit(math.max(literalCap, 0) + 1)
      .collect().map(_.getString(0))
    val kept: DataFrame =
      if (capped.length <= literalCap) {
        // literal route: the whole rewrite is one codegen'd map stage
        val set = typedlit(capped.sorted.toSeq)
        val keptArr = filter(ls, l => !array_contains(set, normOf(l)))
        docs.select(col("doc_id"), nLines.as("n_lines"),
          (nLines - size(keptArr)).as("n_dropped"),
          md5(array_join(keptArr, "\n")).as("kept_digest"))
      } else {
        // join route: anti-join on the normalized line, then per-doc
        // re-aggregation; collect_list order is restored by sorting on
        // the carried position (post-shuffle list order is undefined)
        val pos = QueryDef.spread(docs)
          .select(col("doc_id"),
            posexplode(split(col("text"), "\n")).as(Seq("pos", "line")))
        val keptRows = pos.join(boiler.withColumnRenamed("nl", "__b"),
          normOf(col("line")) === col("__b"), "left_anti")
        val agg = keptRows.groupBy("doc_id")
          .agg(count(lit(1)).as("__n_kept"),
            array_join(
              transform(
                array_sort(collect_list(struct(col("pos"), col("line")))),
                x => x.getField("line")), "\n").as("__kept_text"))
        docs.select(col("doc_id"), nLines.as("n_lines"))
          .join(agg, Seq("doc_id"), "left")
          .select(col("doc_id"), col("n_lines"),
            (col("n_lines") - coalesce(col("__n_kept"), lit(0L))).as("n_dropped"),
            md5(coalesce(col("__kept_text"), lit(""))).as("kept_digest"))
      }
    kept
      .withColumn("dropped_frac",
        round(col("n_dropped").cast("double") / col("n_lines").cast("double"), 6))
      .orderBy("doc_id")
  }

  // ---- Stored line-frequency index (incremental d10) ----------------
  //
  // The d8 stored-index discipline applied to line-boilerplate removal:
  // at 100 TB you do not recount every line per daily increment — the
  // corpus's normalized-line → distinct-doc counts and the doc total
  // are PERSISTED (IndexStore), a new batch counts only ITSELF, probes
  // the stored counts for exactly its own lines (broadcast of the
  // batch's distinct lines against one narrow stored-table scan), and
  // applies the corpus∪batch threshold — O(increment + pruned stored
  // scan) per day, zero corpus-side recount. Counts are stored as
  // APPEND-ONLY delta rows summed at read (log-structured), so folding
  // a matched batch in is an O(increment) parquet append, never a
  // rewrite. Thresholds (frac/floor) are PROBE-TIME parameters — the
  // stored tables are parameter-free raw counts, so one index serves
  // any threshold policy.

  private val FormatStamp = "_graft_lineindex"
  private val FormatValue = "v1|norm=lower-trim-collapse"

  private def lineCounts(docs: DataFrame): DataFrame =
    QueryDef.spread(docs)
      .select(col("doc_id"), explode(split(col("text"), "\n")).as("line"))
      .select(col("doc_id"), normOf(col("line")).as("nl"))
      .groupBy("nl").agg(countDistinct(col("doc_id")).as("n_docs"))

  private def checkDisjoint(ids: DataFrame, batch: DataFrame): Unit = {
    val overlap = ids.join(batch.select(col("doc_id")), "doc_id").limit(1).count()
    require(overlap == 0L, "stored corpus and batch doc_ids must be disjoint")
  }

  /** Build the stored line-frequency index from the corpus snapshot:
    * `ids` (raw doc_ids, the disjointness contract), `lines`
    * (nl, n_docs delta rows), `totals` (n_total delta rows). Format
    * stamp written LAST (crashed init leaves no stamp → later calls
    * fail loudly, the initStoredIndex discipline). */
  def initStoredLineIndex(s: org.apache.spark.sql.SparkSession, path: String,
                          docs: DataFrame): Unit = {
    graft.sources.IndexStore.clearStamp(s, path, FormatStamp)
    docs.select(col("doc_id")).write.mode("overwrite")
      .parquet(graft.sources.IndexStore.resetTablePath(s, path, "ids"))
    lineCounts(docs).write.mode("overwrite")
      .parquet(graft.sources.IndexStore.resetTablePath(s, path, "lines"))
    docs.agg(count(lit(1)).cast("long").as("n_total")).write.mode("overwrite")
      .parquet(graft.sources.IndexStore.resetTablePath(s, path, "totals"))
    graft.sources.IndexStore.writeStamp(s, path, FormatStamp, FormatValue)
  }

  /** Fold a (probed) batch into the stored index: O(increment) appends
    * of delta rows — ids, per-line distinct-doc deltas, one total-count
    * delta. From now on those docs are corpus side. */
  def appendStoredLineIndex(s: org.apache.spark.sql.SparkSession, path: String,
                            newDocs: DataFrame): Unit = {
    graft.sources.IndexStore.requireStamp(s, path, FormatStamp, FormatValue,
      "line-index format")
    checkDisjoint(graft.sources.IndexStore.readSwappable(s, path, "ids"), newDocs)
    newDocs.select(col("doc_id")).write.mode("append")
      .parquet(graft.sources.IndexStore.tableDataPath(s, path, "ids"))
    lineCounts(newDocs).write.mode("append")
      .parquet(graft.sources.IndexStore.tableDataPath(s, path, "lines"))
    newDocs.agg(count(lit(1)).cast("long").as("n_total")).write.mode("append")
      .parquet(graft.sources.IndexStore.tableDataPath(s, path, "totals"))
  }

  /** Compact the appendable line index (r17 — the
    * compactStoredSubstrIndex twin): `ids` gets a file-count rewrite;
    * `lines` and `totals` MERGE their accumulated delta rows (one row
    * per normalized line / ONE total row) under the versioned
    * rename-swap. Semantics-neutral by construction — every reader
    * sums delta rows per key — pinned by LineDedupSpec's probe-equality
    * across the compaction. Maintainer-owned, never racing an append. */
  def compactStoredLineIndex(s: org.apache.spark.sql.SparkSession,
                             path: String, filesPerTable: Int = 4): Unit = {
    graft.sources.IndexStore.compactTable(s, path, "ids", None, filesPerTable)
    graft.sources.IndexStore.replaceTable(s, path, "lines") { (df, tmp) =>
      df.groupBy("nl").agg(sum(col("n_docs")).as("n_docs"))
        .repartition(filesPerTable)
        .write.mode("overwrite").parquet(tmp)
    }
    graft.sources.IndexStore.replaceTable(s, path, "totals") { (df, tmp) =>
      df.agg(coalesce(sum(col("n_total")), lit(0L)).as("n_total"))
        .coalesce(1)
        .write.mode("overwrite").parquet(tmp)
    }
  }

  /** Clean a NEW batch against the stored corpus: batch line counts +
    * stored counts for exactly the batch's lines (the only lines whose
    * membership can affect the batch's rewrite), thresholded over the
    * corpus∪batch doc total — bit-equal to running [[boilerplateLines]]
    * over the union and keeping the batch's rows (LineDedupSpec pins
    * it). Same two-route rewrite via [[rewriteStats]]. */
  def probeCleanBatch(s: org.apache.spark.sql.SparkSession, path: String,
                      batch: DataFrame, fracThreshold: Double = 0.01,
                      floorDocs: Int = 3, literalCap: Int = 256,
                      maxBroadcastLines: Long = 5000000L): DataFrame = {
    graft.sources.IndexStore.requireStamp(s, path, FormatStamp, FormatValue,
      "line-index format")
    checkDisjoint(graft.sources.IndexStore.readSwappable(s, path, "ids"), batch)
    val bc = lineCounts(batch).staged                       // (nl, n_docs)
    val storedN = graft.sources.IndexStore.readSwappable(s, path, "totals")
      .agg(coalesce(sum(col("n_total")), lit(0L))).head().getLong(0)
    val batchN = batch.count()
    // stored counts for the batch's lines only: one narrow stored-table
    // scan semi-reduced by the (guarded-broadcast) batch line set, delta
    // rows summed at read
    val sn = graft.sources.IndexStore.readSwappable(s, path, "lines")
      .join(QueryDef.guardedBroadcast(bc.select("nl"), maxBroadcastLines), "nl")
      .groupBy("nl").agg(sum(col("n_docs")).as("__sn"))
    val threshold = math.max(floorDocs.toLong,
      math.floor((storedN + batchN) * fracThreshold).toLong)
    val boiler = bc.join(sn, Seq("nl"), "left")
      .filter(col("n_docs") + coalesce(col("__sn"), lit(0L)) >= threshold)
      .select("nl").staged
    rewriteStats(batch, boiler, literalCap)
  }

  /** d10's linify/normalize/threshold/rewrite closed form up to the
    * per-doc kept aggregate — shared by the full-run (d10) and
    * stored-index (d10b) oracles so the two state ONE semantics. */
  private val d10OracleCtes: String = """
      WITH d AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
      lin AS (
        SELECT doc_id,
               list_transform(range(0, CAST(ceil(len(tk) / 10.0) AS BIGINT)),
                              i -> array_to_string(tk[i*10+1 : i*10+10], ' ')) AS body
        FROM d),
      doc AS (
        SELECT doc_id,
               CASE WHEN doc_id % 3 = 0
                    THEN ['Promo sub ' || CAST(doc_id % 4 AS VARCHAR) || ' subscribe to our newsletter today']
                    ELSE CAST([] AS VARCHAR[]) END
               || body ||
               CASE WHEN doc_id % 5 = 0
                    THEN ['Promo ftr  ' || CAST(doc_id % 4 AS VARCHAR) || '  follow us for more updates']
                    ELSE CAST([] AS VARCHAR[]) END AS lines
        FROM lin),
      ln AS (
        SELECT doc_id, i AS pos, lines[i] AS line,
               lower(trim(regexp_replace(lines[i], ' +', ' ', 'g'))) AS nl
        FROM doc, UNNEST(range(1, len(lines) + 1)) AS u(i)),
      tot AS (SELECT COUNT(*) AS n_total FROM documents),
      freq AS (
        SELECT nl FROM ln, tot GROUP BY nl, tot.n_total
        HAVING COUNT(DISTINCT doc_id) >=
               GREATEST(3, CAST(FLOOR(n_total * 0.01) AS BIGINT))),
      kept AS (SELECT * FROM ln WHERE nl NOT IN (SELECT nl FROM freq)),
      agg AS (
        SELECT doc_id, COUNT(*) AS n_kept,
               string_agg(line, chr(10) ORDER BY pos) AS kept_text
        FROM kept GROUP BY doc_id)"""

  /** d10b: the incremental form as a driver query — docs ≥ 250 are
    * "yesterday's snapshot" (persisted once, meta-stamped on the source
    * fingerprint), docs < 250 arrive as the new batch and are cleaned
    * against the stored counts. Oracle: the full-run d10 closed form
    * over corpus∪batch, batch rows only — the equality the stored path
    * must preserve. */
  val dLineBoilerStored = QueryDef(
    "d10b_line_boiler_stored",
    (s, dir) => {
      val docs = Tables.documents(s, dir)
        .select(col("doc_id"), Scaffold.linifiedText.as("text"))
      val path = graft.sources.IndexStore.indexPath(dir, "linefreq_ge_250")
      val meta = "v1|corpus=(doc_id >= 250)|src=" +
        graft.sources.IndexStore.sourceStamp(s, s"$dir/documents.parquet")
      graft.sources.IndexStore.ensure(s, path, meta) {
        initStoredLineIndex(s, path, docs.filter(col("doc_id") >= 250))
      }
      probeCleanBatch(s, path, docs.filter(col("doc_id") < 250))
    },
    Some(s"""
      $d10OracleCtes
      SELECT doc.doc_id,
             CAST(len(doc.lines) AS BIGINT) AS n_lines,
             CAST(len(doc.lines) - COALESCE(a.n_kept, 0) AS BIGINT) AS n_dropped,
             md5(COALESCE(a.kept_text, '')) AS kept_digest,
             ROUND((len(doc.lines) - COALESCE(a.n_kept, 0))
                   / CAST(len(doc.lines) AS DOUBLE), 6) AS dropped_frac
      FROM doc LEFT JOIN agg a USING (doc_id)
      WHERE doc.doc_id < 250 ORDER BY doc.doc_id"""))

  val dLineBoilerplate = QueryDef(
    "d10_line_boilerplate",
    (s, dir) => boilerplateLines(
      Tables.documents(s, dir)
        .select(col("doc_id"), Scaffold.linifiedText.as("text"))),
    Some(s"""
      $d10OracleCtes
      SELECT doc.doc_id,
             CAST(len(doc.lines) AS BIGINT) AS n_lines,
             CAST(len(doc.lines) - COALESCE(a.n_kept, 0) AS BIGINT) AS n_dropped,
             md5(COALESCE(a.kept_text, '')) AS kept_digest,
             ROUND((len(doc.lines) - COALESCE(a.n_kept, 0))
                   / CAST(len(doc.lines) AS DOUBLE), 6) AS dropped_frac
      FROM doc LEFT JOIN agg a USING (doc_id) ORDER BY doc.doc_id"""))



  // ---- d13: INTRA-document repeated-line removal (r18) ----------------

  /** Within-document repeated-line removal — the hygiene pass that runs
    * BEFORE any corpus-frequency filter (d10) can see a document:
    * template chrome repeated INSIDE one page (nav bars rendered top
    * and bottom, pagination blocks, share widgets) never crosses d10's
    * distinct-DOCUMENT threshold precisely because every occurrence is
    * in the same document, so an intra-doc pass owns it. Semantics:
    * keep the FIRST occurrence of each exact line, preserve order —
    * Spark's `array_distinct` contract, restated in the oracle as the
    * first-position `list_filter`.
    *
    * Scale shape: pure per-row array work (split → array_distinct →
    * array_join, all codegen'd builtins — no corpus state, no joins)
    * followed by ONE source-keyed aggregate with map-side partials
    * whose output is |sources| rows. The corpus is never shuffled: this
    * is the cheapest possible full-corpus map pass, same class as t23.
    * Per-row rewrite correctness rides the oracle hash via the
    * order-invariant md5-prefix digest of every cleaned text (the p4
    * digest discipline). */
  private[graft] def intraDocCleaned(docs: DataFrame): DataFrame = {
    val lines = split(col("text"), "\n")
    val kept = array_distinct(lines)
    docs.select(col("doc_id"), col("source"),
      size(lines).cast("long").as("n_lines"),
      size(kept).cast("long").as("n_kept"),
      array_join(kept, "\n").as("cleaned"))
  }

  val dIntraDocDedup = QueryDef(
    "d13_intradoc_line_dedup",
    (s, dir) => intraDocCleaned(
      Tables.documents(s, dir)
        .select(col("doc_id"), col("source"),
          Scaffold.intradocText.as("text")))
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum((col("n_lines") > col("n_kept")).cast("long")).as("docs_changed"),
        sum(col("n_lines")).as("lines_total"),
        sum(col("n_lines") - col("n_kept")).as("lines_dropped"),
        sum(length(col("cleaned")).cast("long")).as("cleaned_chars"),
        sum(conv(substring(md5(col("cleaned")), 1, 10), 16, 10)
          .cast("long")).as("cleaned_digest"))
      .orderBy("source"),
    Some("""
      WITH d AS (SELECT doc_id, source, string_split(text, ' ') AS tk FROM documents),
      lin AS (
        SELECT doc_id, source,
               list_transform(range(0, CAST(ceil(len(tk) / 10.0) AS BIGINT)),
                              i -> array_to_string(tk[i*10+1 : i*10+10], ' ')) AS body
        FROM d),
      doc AS (
        SELECT doc_id, source,
               CASE WHEN doc_id % 2 = 0
                    THEN ['Nav menu ' || CAST(doc_id % 4 AS VARCHAR) || ' home about contact']
                    ELSE CAST([] AS VARCHAR[]) END
               || body ||
               CASE WHEN doc_id % 2 = 0
                    THEN ['Nav menu ' || CAST(doc_id % 4 AS VARCHAR) || ' home about contact']
                    ELSE CAST([] AS VARCHAR[]) END
               || CASE WHEN doc_id % 8 = 0
                    THEN ['Nav menu ' || CAST(doc_id % 4 AS VARCHAR) || ' home about contact',
                          'Nav menu ' || CAST(doc_id % 4 AS VARCHAR) || ' home about contact']
                    ELSE CAST([] AS VARCHAR[]) END AS lines
        FROM lin),
      c AS (
        SELECT doc_id, source,
               len(lines) AS n_lines,
               len(list_filter(lines, (x, i) -> list_position(lines, x) = i)) AS n_kept,
               array_to_string(
                 list_filter(lines, (x, i) -> list_position(lines, x) = i),
                 chr(10)) AS cleaned
        FROM doc)
      SELECT source, COUNT(*) AS n_docs,
             CAST(SUM(CASE WHEN n_lines > n_kept THEN 1 ELSE 0 END) AS BIGINT) AS docs_changed,
             CAST(SUM(n_lines) AS BIGINT) AS lines_total,
             CAST(SUM(n_lines - n_kept) AS BIGINT) AS lines_dropped,
             CAST(SUM(len(cleaned)) AS BIGINT) AS cleaned_chars,
             CAST(SUM(CAST(('0x' || substring(md5(cleaned), 1, 10)) AS BIGINT)) AS BIGINT) AS cleaned_digest
      FROM c GROUP BY source ORDER BY source"""))

  def all: Seq[QueryDef] = Seq(dLineBoilerplate, dLineBoilerStored,
    dIntraDocDedup)
}
