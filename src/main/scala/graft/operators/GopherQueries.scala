package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.RepetitionExpressions.gopherStats
import graft.sources.Tables

/** The Gopher quality gate — the published per-document rule battery
  * (Rae et al. 2021, "Scaling Language Models: Methods, Analysis &
  * Insights from Training Gopher", §A1.1; the filter set the
  * MassiveWeb pipeline and its descendants — RefinedWeb, Dolma, FineWeb
  * — apply before any model-based scoring). Distinct from t2/t9 (this
  * engine's own quality score / filter): t23 is the INDUSTRY-STANDARD
  * battery with the published thresholds, emitted per rule so a
  * curation run can audit which rule killed a document.
  *
  * Rules (document drops if ANY fails):
  *   - word count in [50, 100000]; mean word length in [3, 10]
  *   - symbol-to-word ratio ('#' chars + '...' occurrences) ≤ 0.1
  *   - ≤ 90% of lines start with a bullet; ≤ 30% end with an ellipsis
  *   - ≥ 80% of words contain an alphabetic character
  *   - ≥ 2 distinct stop words present (t2's lexicon)
  *   - repetition: top-{2,3,4}-gram char fraction ≤ {0.20, 0.18, 0.16};
  *     duplicate-{5,10}-gram char fraction ≤ {0.15, 0.10} (the 5 and 10
  *     endpoints of Gopher's 5..10 ladder; intermediate n are the same
  *     kernel call with the published per-n threshold); duplicate-line
  *     fraction ≤ 0.30 and duplicate-line CHAR fraction ≤ 0.20
  *
  * Semantics notes, pinned in both engines:
  *   - Word rules run over the RAW whitespace tokens; line rules over
  *     the same deterministic linified view d10 uses (the corpus has
  *     no newlines — `Scaffold.linifiedText` is the shared closed
  *     form), so line-rule firing is exercised on real line structure.
  *   - Char fractions divide by length(text) (document characters, the
  *     published denominator). Overlapping occurrences of a repeated
  *     gram are counted per occurrence (the standard overlap-counting
  *     form), so a fraction can exceed 1 on degenerate docs — the
  *     threshold comparison is unaffected.
  *   - Duplicate-LINE stats are the n = 1 instance of the same
  *     repetition kernel over the line array — one kernel for the
  *     whole family.
  *
  * Scale shape: ZERO shuffles — every rule is a map-side expression.
  * The whole statistic battery is ONE composed kernel call per row
  * (`GopherStats`: linear passes with per-row hash maps; the composed
  * form exists because eight separate expression calls pushed the
  * fused projection past HotSpot's 8000-byte JIT limit — PlanAuditSpec
  * pins the stage under the budget and fallback-free).
  * At 100 TB this is a pure scan→project pipeline: no exchange, no
  * aggregation, output row-per-doc — the cheapest possible full-corpus
  * pass, which is exactly why production stacks run this battery
  * FIRST, before any shuffle-bearing dedup.
  */
object GopherQueries {
  import GopherSql.gopherRuleCtes

  private val tk = split(col("text"), " ")

  /** docs: any frame with (doc_id, text, + a lines array column
    * `__lines`). Returns the full per-doc rule battery — one kernel
    * call per row; every output column (fractions rounded to 6 with
    * Spark `round` semantics, the gate boolean) is computed inside
    * [[graft.functions.GopherKernel]]. */
  private[graft] def gopherBattery(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
        gopherStats(tk, col("__lines"), TextQueries.stopwords).as("gs"))
      .select(col("doc_id"), col("gs.*"))
      .orderBy("doc_id")

  val tGopherGate = QueryDef(
    "t23_gopher_gate",
    (s, dir) => gopherBattery(
      Tables.documents(s, dir)
        .select(col("doc_id"), col("text"),
          split(Scaffold.linifiedText, "\n").as("__lines"))),
    Some(s"""
      WITH d AS (SELECT doc_id, text, string_split(text, ' ') AS tk FROM documents),
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
      gsrc AS (
        SELECT d.doc_id, d.tk, doc.lines
        FROM d JOIN doc USING (doc_id)),
      $gopherRuleCtes
      SELECT * FROM gate ORDER BY doc_id"""))

  def all: Seq[QueryDef] = Seq(tGopherGate)
}

/** Holds the DuckDB closed form of the t23 rule battery as a CTE chain
  * over a `gsrc(doc_id, tk, lines)` relation — spliced into BOTH the
  * t23 oracle and the p7 gated-release oracle so the two can never
  * state different gate semantics (the mergeEncodeCtes discipline).
  * Every quantity derives from tk/lines alone: doc_chars and
  * sum_word_len use the exact identity Σ|tokenᵢ| (+ n−1 joining
  * spaces) = |text|, and symbol counts are per-token ('#' chars and
  * non-overlapping '...' runs never span the space separator) —
  * matching GopherKernel bit for bit. */
private[graft] object GopherSql {
  val gopherRuleCtes: String = """g AS (
        SELECT doc_id, tk, lines,
               CAST(len(tk) AS BIGINT) AS n_words,
               CAST(COALESCE(list_sum(list_transform(tk, t -> length(t))), 0) AS BIGINT) AS sum_word_len,
               CAST(len(list_filter(['the','a','and','of','to','in'],
                                    w -> list_contains(tk, w))) AS BIGINT) AS stop_hits,
               CAST(len(list_filter(tk, t -> regexp_matches(t, '[A-Za-z]'))) AS BIGINT) AS alpha_words,
               CAST(COALESCE(list_sum(list_transform(tk,
                 t -> length(t) - length(replace(t, '#', ''))
                      + (length(t) - length(replace(t, '...', ''))) // 3)), 0) AS BIGINT) AS symbol_count,
               list_transform(range(1, len(tk)), i -> tk[i] || ' ' || tk[i+1]) AS g2,
               list_transform(range(1, len(tk) - 1), i -> array_to_string(tk[i:i+2], ' ')) AS g3,
               list_transform(range(1, len(tk) - 2), i -> array_to_string(tk[i:i+3], ' ')) AS g4,
               list_transform(range(1, len(tk) - 3), i -> array_to_string(tk[i:i+4], ' ')) AS g5,
               list_transform(range(1, len(tk) - 8), i -> array_to_string(tk[i:i+9], ' ')) AS g10,
               CAST(len(list_filter(lines, l -> substring(l, 1, 1) IN ('-', '*', chr(8226)))) AS BIGINT) AS bullet_lines,
               CAST(len(list_filter(lines, l -> ends_with(l, '...') OR ends_with(l, chr(8230)))) AS BIGINT) AS ellipsis_lines,
               CAST(len(lines) AS BIGINT) AS n_lines
        FROM gsrc),
      gp AS (
        SELECT *,
               CASE WHEN n_words = 0 THEN CAST(0 AS BIGINT)
                    ELSE sum_word_len + n_words - 1 END AS doc_chars
        FROM g),
      m AS (
        SELECT doc_id, n_words, doc_chars, sum_word_len, stop_hits, alpha_words,
               symbol_count, bullet_lines, ellipsis_lines, n_lines,
               COALESCE(list_max(list_transform(list_distinct(g2),
                 x -> len(list_filter(g2, y -> y = x)) * length(x))), 0) AS top2_chars,
               COALESCE(list_max(list_transform(list_distinct(g3),
                 x -> len(list_filter(g3, y -> y = x)) * length(x))), 0) AS top3_chars,
               COALESCE(list_max(list_transform(list_distinct(g4),
                 x -> len(list_filter(g4, y -> y = x)) * length(x))), 0) AS top4_chars,
               COALESCE(list_sum(list_transform(list_distinct(g5),
                 x -> CASE WHEN len(list_filter(g5, y -> y = x)) >= 2
                           THEN len(list_filter(g5, y -> y = x)) * length(x) ELSE 0 END)), 0) AS dup5_chars,
               COALESCE(list_sum(list_transform(list_distinct(g10),
                 x -> CASE WHEN len(list_filter(g10, y -> y = x)) >= 2
                           THEN len(list_filter(g10, y -> y = x)) * length(x) ELSE 0 END)), 0) AS dup10_chars,
               CAST(len(lines) AS BIGINT) AS line_total,
               CAST(len(list_distinct(lines)) AS BIGINT) AS line_distinct,
               COALESCE(list_sum(list_transform(list_distinct(lines),
                 x -> CASE WHEN len(list_filter(lines, y -> y = x)) >= 2
                           THEN len(list_filter(lines, y -> y = x)) * length(x) ELSE 0 END)), 0) AS dup_line_chars,
               COALESCE(list_sum(list_transform(lines, x -> length(x))), 0) AS line_chars
        FROM gp),
      o AS (
        SELECT doc_id, n_words,
               ROUND(CASE WHEN n_words > 0 THEN sum_word_len / CAST(n_words AS DOUBLE) ELSE 0 END, 6) AS mean_word_len,
               stop_hits,
               ROUND(CASE WHEN n_words > 0 THEN alpha_words / CAST(n_words AS DOUBLE) ELSE 0 END, 6) AS alpha_word_frac,
               ROUND(CASE WHEN n_words > 0 THEN symbol_count / CAST(n_words AS DOUBLE) ELSE 0 END, 6) AS symbol_ratio,
               ROUND(CASE WHEN doc_chars > 0 THEN top2_chars / CAST(doc_chars AS DOUBLE) ELSE 0 END, 6) AS top2_char_frac,
               ROUND(CASE WHEN doc_chars > 0 THEN top3_chars / CAST(doc_chars AS DOUBLE) ELSE 0 END, 6) AS top3_char_frac,
               ROUND(CASE WHEN doc_chars > 0 THEN top4_chars / CAST(doc_chars AS DOUBLE) ELSE 0 END, 6) AS top4_char_frac,
               ROUND(CASE WHEN doc_chars > 0 THEN dup5_chars / CAST(doc_chars AS DOUBLE) ELSE 0 END, 6) AS dup5_char_frac,
               ROUND(CASE WHEN doc_chars > 0 THEN dup10_chars / CAST(doc_chars AS DOUBLE) ELSE 0 END, 6) AS dup10_char_frac,
               ROUND(CASE WHEN line_total > 0 THEN (line_total - line_distinct) / CAST(line_total AS DOUBLE) ELSE 0 END, 6) AS dup_line_frac,
               ROUND(CASE WHEN line_chars > 0 THEN dup_line_chars / CAST(line_chars AS DOUBLE) ELSE 0 END, 6) AS dup_line_char_frac,
               ROUND(CASE WHEN n_lines > 0 THEN bullet_lines / CAST(n_lines AS DOUBLE) ELSE 0 END, 6) AS bullet_line_frac,
               ROUND(CASE WHEN n_lines > 0 THEN ellipsis_lines / CAST(n_lines AS DOUBLE) ELSE 0 END, 6) AS ellipsis_line_frac
        FROM m),
      gate AS (
        SELECT *,
               (n_words BETWEEN 50 AND 100000
                AND mean_word_len BETWEEN 3.0 AND 10.0
                AND symbol_ratio <= 0.1
                AND bullet_line_frac <= 0.9
                AND ellipsis_line_frac <= 0.3
                AND alpha_word_frac >= 0.8
                AND stop_hits >= 2
                AND top2_char_frac <= 0.20
                AND top3_char_frac <= 0.18
                AND top4_char_frac <= 0.16
                AND dup5_char_frac <= 0.15
                AND dup10_char_frac <= 0.10
                AND dup_line_frac <= 0.30
                AND dup_line_char_frac <= 0.20) AS passes_gopher
        FROM o)"""
}
