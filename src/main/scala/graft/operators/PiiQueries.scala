package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** PII detection + redaction (t18) — the privacy-scrub stage every
  * public training-data release runs before shipping (emails, phone
  * numbers, IPv4 addresses → typed placeholder tokens), plus the
  * per-source audit a release publishes alongside the scrub.
  *
  * Semantics contract (cross-engine well-defined): entity classes are
  * detected and redacted IN A FIXED ORDER — email, then phone, then
  * IPv4 — and each class is COUNTED ON THE TEXT ALREADY REDACTED BY
  * THE EARLIER CLASSES. A dotted quad inside an email's domain is
  * therefore one email, not an email plus an IP; counts and redaction
  * always agree (`n_x` = number of `[X]` tokens inserted). The regexes
  * use only character classes and counted/greedy quantifiers, which
  * match identically under java.util.regex (Spark) and RE2 (DuckDB).
  *
  * Scale shape: detection and redaction are pure per-row codegen'd
  * regexp expressions (literal patterns, so the compiled Pattern is
  * cached per task) — a linear map-side scan at any corpus size; the
  * audit is ONE source-keyed aggregate with map-side partials whose
  * output is |sources| rows. The corpus is never shuffled. Per-row
  * redaction correctness is inside the oracle hash via the
  * order-invariant 40-bit md5-prefix digest of every redacted text
  * (the p4 digest discipline): an aggregate-cancelling wrong redaction
  * still moves the digest sum.
  *
  * The driver's synthetic corpus contains no PII (letters-only word
  * soup), which would make the oracle vacuous — so the QueryDef
  * deterministically APPENDS entities derived from `doc_id` (the same
  * closed-form expression stated in both engines) before scrubbing:
  * ~3/4 of docs get an email / phone / dotted quad by `doc_id` residue,
  * one residue class gets two entities, one stays clean. The injection
  * is test scaffolding for cross-engine regex parity; the operator
  * itself (`piiScrub`) takes any frame — PiiScrubSpec drives it over
  * constructed corpora (overlaps, idempotence, clean passthrough).
  */
object PiiQueries {

  private[graft] val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+[.][A-Za-z]{2,}"
  private[graft] val phoneRe = "[0-9]{3}-[0-9]{3}-[0-9]{4}"
  private[graft] val ipv4Re  = "([0-9]{1,3}[.]){3}[0-9]{1,3}"

  /** Adds `n_emails`, `n_phones`, `n_ipv4` (long) and `redacted`
    * (string) to `df`. Counting follows the progressive-redaction
    * contract documented above. */
  private[graft] def piiScrub(df: DataFrame, textCol: String = "text"): DataFrame = {
    val t0 = col(textCol)
    val t1 = regexp_replace(t0, emailRe, "[EMAIL]")
    val t2 = regexp_replace(t1, phoneRe, "[PHONE]")
    val t3 = regexp_replace(t2, ipv4Re, "[IP]")
    df.withColumn("n_emails", regexp_count(t0, lit(emailRe)).cast("long"))
      .withColumn("n_phones", regexp_count(t1, lit(phoneRe)).cast("long"))
      .withColumn("n_ipv4", regexp_count(t2, lit(ipv4Re)).cast("long"))
      .withColumn("redacted", t3)
  }

  val tPiiScrub = QueryDef(
    "t18_pii_scrub",
    (s, dir) => {
      // entity injection is QueryDef-only scaffolding — Scaffold.injectedText
      val scrubbed = piiScrub(
        Tables.documents(s, dir).withColumn("text", Scaffold.injectedText))
      scrubbed.groupBy(col("source"))
        .agg(
          count(lit(1)).as("n_docs"),
          sum((col("n_emails") + col("n_phones") + col("n_ipv4") > 0)
            .cast("long")).as("docs_with_pii"),
          sum(col("n_emails")).as("n_emails"),
          sum(col("n_phones")).as("n_phones"),
          sum(col("n_ipv4")).as("n_ipv4"),
          sum(length(col("redacted")).cast("long")).as("redacted_chars"),
          sum(conv(substring(md5(col("redacted")), 1, 10), 16, 10)
            .cast("long")).as("redacted_digest"))
        .orderBy("source")
    },
    Some("""
      WITH inj AS (
        SELECT source,
               CASE WHEN ((doc_id % 4) + 4) % 4 = 0 THEN
                      text || ' contact user' || CAST(doc_id AS VARCHAR) ||
                      '@mail-' || CAST(((doc_id % 7) + 7) % 7 AS VARCHAR) || '.example.com'
                    WHEN ((doc_id % 4) + 4) % 4 = 1 THEN
                      text || ' call 415-' ||
                      lpad(CAST(((((doc_id % 1000) + 1000) % 1000) * 7) % 1000 AS VARCHAR), 3, '0') || '-' ||
                      lpad(CAST(((((doc_id % 10000) + 10000) % 10000) * 13) % 10000 AS VARCHAR), 4, '0')
                    WHEN ((doc_id % 4) + 4) % 4 = 2 THEN
                      text || ' from host ' || CAST(((doc_id % 256) + 256) % 256 AS VARCHAR) ||
                      '.' || CAST(((((doc_id % 256) + 256) % 256) * 3) % 256 AS VARCHAR) ||
                      '.' || CAST(((((doc_id % 256) + 256) % 256) * 5) % 256 AS VARCHAR) ||
                      '.' || CAST(((((doc_id % 256) + 256) % 256) * 7) % 256 AS VARCHAR)
                    WHEN ((doc_id % 8) + 8) % 8 = 3 THEN
                      text || ' reach admin' || CAST(doc_id AS VARCHAR) ||
                      '@ops.example.org or 800-555-' ||
                      lpad(CAST(((doc_id % 10000) + 10000) % 10000 AS VARCHAR), 4, '0')
                    ELSE text END AS text
        FROM documents),
      sc AS (
        SELECT source,
               len(regexp_extract_all(text,
                 '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+[.][A-Za-z]{2,}')) AS n_emails,
               len(regexp_extract_all(regexp_replace(text,
                 '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+[.][A-Za-z]{2,}', '[EMAIL]', 'g'),
                 '[0-9]{3}-[0-9]{3}-[0-9]{4}')) AS n_phones,
               len(regexp_extract_all(regexp_replace(regexp_replace(text,
                 '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+[.][A-Za-z]{2,}', '[EMAIL]', 'g'),
                 '[0-9]{3}-[0-9]{3}-[0-9]{4}', '[PHONE]', 'g'),
                 '([0-9]{1,3}[.]){3}[0-9]{1,3}')) AS n_ipv4,
               regexp_replace(regexp_replace(regexp_replace(text,
                 '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+[.][A-Za-z]{2,}', '[EMAIL]', 'g'),
                 '[0-9]{3}-[0-9]{3}-[0-9]{4}', '[PHONE]', 'g'),
                 '([0-9]{1,3}[.]){3}[0-9]{1,3}', '[IP]', 'g') AS redacted
        FROM inj)
      SELECT source, COUNT(*) AS n_docs,
             CAST(SUM(CASE WHEN n_emails + n_phones + n_ipv4 > 0 THEN 1 ELSE 0 END)
               AS BIGINT) AS docs_with_pii,
             CAST(SUM(n_emails) AS BIGINT) AS n_emails,
             CAST(SUM(n_phones) AS BIGINT) AS n_phones,
             CAST(SUM(n_ipv4) AS BIGINT) AS n_ipv4,
             CAST(SUM(len(redacted)) AS BIGINT) AS redacted_chars,
             CAST(SUM(CAST(('0x' || substring(md5(redacted), 1, 10)) AS BIGINT))
               AS BIGINT) AS redacted_digest
      FROM sc GROUP BY source ORDER BY source"""))

  val all: Seq[QueryDef] = Seq(tPiiScrub)
}
