package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.plans.Stage.StageOps
import graft.sources.Tables

/** Cross-document LINE deduplication — the CCNet/RefinedWeb line-level
  * boilerplate filter (cf. reference's per-record cleaning pass, e.g.
  * `R/clean_data.R`, generalized to corpus-frequency semantics): a line
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

  /** docs: any frame with (doc_id, text) where text is '\n'-separated
    * lines. Returns per-doc (n_lines, n_dropped, kept_digest,
    * dropped_frac) with kept lines in original order inside the digest.
    */
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

  def boilerplateLines(docs: DataFrame, fracThreshold: Double = 0.01,
                       floorDocs: Int = 3, literalCap: Int = 256): DataFrame = {
    val boiler = boilerSet(docs, fracThreshold, floorDocs)
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

  val dLineBoilerplate = QueryDef(
    "d10_line_boilerplate",
    (s, dir) => boilerplateLines(
      Tables.documents(s, dir)
        .select(col("doc_id"), Scaffold.linifiedText.as("text"))),
    Some("""
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
        FROM kept GROUP BY doc_id)
      SELECT doc.doc_id,
             CAST(len(doc.lines) AS BIGINT) AS n_lines,
             CAST(len(doc.lines) - COALESCE(a.n_kept, 0) AS BIGINT) AS n_dropped,
             md5(COALESCE(a.kept_text, '')) AS kept_digest,
             ROUND((len(doc.lines) - COALESCE(a.n_kept, 0))
                   / CAST(len(doc.lines) AS DOUBLE), 6) AS dropped_frac
      FROM doc LEFT JOIN agg a USING (doc_id) ORDER BY doc.doc_id"""))

  def all: Seq[QueryDef] = Seq(dLineBoilerplate)
}
