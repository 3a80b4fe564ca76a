package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** QueryDef-ONLY oracle scaffolding — deterministic closed forms that
  * exist so BOTH engines (Spark and the DuckDB oracle) can state the
  * same synthetic input when the driver tables alone would make an
  * oracle vacuous (no PII in the corpus, no second snapshot on disk).
  *
  * Contract: nothing here is production operator surface. Each member
  * is referenced only from a QueryDef body (and its spec) and has a
  * verbatim SQL restatement inside that QueryDef's oracle; the
  * production operators (`PiiQueries.piiScrub`,
  * `SampleQueries.snapshotDiffOf`) take ANY caller frame. Keeping the
  * closed forms in one file keeps the operator files pure (VERDICT r13
  * #7) and gives future oracle-only inputs a single documented home.
  */
object Scaffold {

  /** Deterministic doc_id-derived PII entity injection for t18 (see
    * PiiQueries object doc). Residues mod 4: 0 → email, 1 → phone,
    * 2 → dotted quad, 3 → (mod 8 == 3 ? email+phone : clean). */
  private[graft] def injectedText: Column = {
    val id = col("doc_id")
    // portable non-negative residue, stated identically in both
    // engines as ((x % k) + k) % k: Spark pmod would diverge from
    // DuckDB's sign-preserving % on negative ids (the mm2/mm4
    // cross-engine drift class), while a bare % would leave every
    // non-zero branch below unreachable for negative ids — silently
    // emptying the phone/IPv4 injection coverage instead of failing
    def r(x: Column, k: Int): Column = ((x % k) + k) % k
    def m(k: Int) = r(id, k).cast("string")
    // reduce BEFORE multiplying: (id·f) mod k ≡ ((id mod k)·f) mod k,
    // and r(id,k)·f ≤ (k−1)·13 can never overflow Long — while a raw
    // id*f wraps silently in Spark (non-ANSI) but RAISES in DuckDB on
    // extreme ids, splitting the "same closed form" across engines.
    // r(id,k) is already non-negative, so a plain % suffices outside.
    def mm(f: Int, k: Int) = ((r(id, k) * f) % k).cast("string")
    when(r(id, 4) === 0,
      concat(col("text"), lit(" contact user"), id.cast("string"),
        lit("@mail-"), m(7), lit(".example.com")))
      .when(r(id, 4) === 1,
        concat(col("text"), lit(" call 415-"), lpad(mm(7, 1000), 3, "0"),
          lit("-"), lpad(mm(13, 10000), 4, "0")))
      .when(r(id, 4) === 2,
        concat(col("text"), lit(" from host "), m(256), lit("."),
          mm(3, 256), lit("."), mm(5, 256), lit("."), mm(7, 256)))
      .when(r(id, 8) === 3,
        concat(col("text"), lit(" reach admin"), id.cast("string"),
          lit("@ops.example.org or 800-555-"), lpad(m(10000), 4, "0")))
      .otherwise(col("text"))
  }

  /** t31's injection scaffold (r18) — the [[injectedText]] discipline
    * extended to the v2 entity classes: one class per doc_id residue
    * mod 8 so every class has non-vacuous coverage and one residue
    * stays clean. Residue 0 carries a KNOWN-Luhn-valid card from a
    * fixed four-card list (the industry test numbers) PLUS a fixed SSN
    * — the multi-class doc; residue 1 carries a card-SHAPED but
    * Luhn-INVALID number, proving the Luhn gate actually rejects
    * (without it the gate is indistinguishable from "redact every
    * 16-digit run"). IPv6 groups are the lower-hex of reduced residues
    * (lower(hex(x)) ↔ lower(to_hex(x)) — both engines print uppercase
    * by default). Same overflow-safe reduced-residue arithmetic as
    * injectedText. */
  private[graft] def injectedTextV2: Column = {
    val id = col("doc_id")
    def r(x: Column, k: Int): Column = ((x % k) + k) % k
    def m(k: Int) = r(id, k).cast("string")
    def mm(f: Int, k: Int) = ((r(id, k) * f) % k).cast("string")
    def hx(f: Int) = lower(hex(((r(id, 65536) * f) % 65536).cast("int")))
    val validCards = array(
      lit("4111-1111-1111-1111"), lit("5500-0055-5555-5559"),
      lit("4012-8888-8888-1881"), lit("6011-0009-9013-9424"))
    val invalidCards = array(
      lit("4111-1111-1111-1112"), lit("1234-5678-1234-5678"),
      lit("5500-0055-5555-5551"), lit("6011-0009-9013-9421"))
    when(r(id, 8) === 0,
      concat(col("text"), lit(" pay card "),
        element_at(validCards, (r(id, 4) + 1).cast("int")),
        lit(" taxid 078-05-1120")))
      .when(r(id, 8) === 1,
        // one Luhn-invalid exact card (the gate must pass it through)
        // plus three ABSORBING shapes with an embedded valid card —
        // a bare 19-digit run, a digit-flanked separator form (aligned
        // window), and a separator form whose card is bare-embedded in
        // the HEAD run (the r19 self-review case) — so the window
        // extraction is oracle-exercised, not spec-only
        concat(col("text"), lit(" ref code "),
          element_at(invalidCards, (r(id, 4) + 1).cast("int")),
          lit(" order 4111111111111111999 conf 994111-1111-1111-11117" +
            " id 4111111111111111999-1234-5678-9012")))
      .when(r(id, 8) === 2,
        concat(col("text"), lit(" ssn "), lpad(mm(37, 1000), 3, "0"),
          lit("-"), lpad(mm(11, 100), 2, "0"), lit("-"),
          lpad(mm(13, 10000), 4, "0")))
      .when(r(id, 8) === 3,
        concat(col("text"), lit(" node "), hx(1), lit(":"), hx(3),
          lit(":"), hx(5), lit(":"), hx(7), lit(":"), hx(11), lit(":"),
          hx(13), lit(":"), hx(17), lit(":"), hx(19)))
      .when(r(id, 8) === 4,
        concat(col("text"), lit(" contact user"), id.cast("string"),
          lit("@mail-"), m(7), lit(".example.com")))
      .when(r(id, 8) === 5,
        concat(col("text"), lit(" call 415-"), lpad(mm(7, 1000), 3, "0"),
          lit("-"), lpad(mm(13, 10000), 4, "0")))
      .when(r(id, 8) === 6,
        concat(col("text"), lit(" from host "), m(256), lit("."),
          mm(3, 256), lit("."), mm(5, 256), lit("."), mm(7, 256)))
      .otherwise(col("text"))
  }

  /** Deterministic boundary-boilerplate injection for t21 (QueryDef-only
    * scaffolding; both engines state the same closed form): the driver
    * corpus is random word soup, so no two pack-boundary windows ever
    * repeat and the t21 oracle would be vacuous. Every doc_id % 5 == 0
    * doc gains a FIXED 8-token header, every doc_id % 7 == 0 doc a
    * FIXED 8-token footer — the shape real corpora have (templated
    * page chrome): any packed adjacency (footer-doc, header-doc)
    * produces the same straddling window, so the duplicated-boundary
    * population is non-empty and exactly derivable. Sign-preserving %
    * (repo modulo convention). */
  private[graft] def boundaryInjectedText: Column = {
    val header = (1 to 8).map(i => s"hdrboiler$i").mkString(" ")
    val footer = (1 to 8).map(i => s"ftrboiler$i").mkString(" ")
    val withHdr = when(col("doc_id") % 5 === 0,
      concat(lit(header + " "), col("text"))).otherwise(col("text"))
    when(col("doc_id") % 7 === 0, concat(withHdr, lit(" " + footer)))
      .otherwise(withHdr)
  }

  /** Deterministic multi-line view of the corpus for d10 (QueryDef-only
    * scaffolding; both engines state the same closed form): the driver
    * corpus is single-line token soup, so a LINE-granular operator would
    * be vacuous without line structure. Body = the token stream sliced
    * into 10-token lines; every doc_id % 3 == 0 doc gets one of 4
    * recurring promo HEADER lines prepended and every doc_id % 5 == 0
    * doc one of 4 FOOTER lines appended (variant = doc_id % 4) — the
    * cross-document boilerplate population a CCNet-style line filter
    * exists to remove, recurring in ~n/12 (resp. ~n/20) docs, far above
    * d10's 1%-of-corpus threshold at every sf. The footer carries
    * doubled spaces and both lines a capital letter so d10's
    * normalization (lower + collapse) is exercised, not vacuous. Plain
    * % (repo convention for the non-negative testdata ids — matches
    * DuckDB's sign-preserving % wherever both are defined). */
  private[graft] def linifiedText: Column = {
    // "newline after every 10th token" as ONE codegen'd regex pass:
    // each non-overlapping match is 10 space-separated tokens plus the
    // following space, which becomes a newline; the sub-10-token tail
    // never matches and stays on the last line. Equivalent to slicing
    // the split-on-space token array into 10-token lines PROVIDED the
    // corpus text is single-spaced (the generator's contract — a
    // doubled space would make \S+ skip the empty token the array form
    // keeps). The regex form exists because Spark's higher-order
    // functions (transform/filter) are CodegenFallback — interpreted
    // per row — and this view sits in the hot path of both d10 and the
    // t23 gate (PlanAuditSpec pins t23 fallback-free).
    val body = regexp_replace(col("text"), "((?:\\S+ ){9}\\S+) ", "$1\n")
    val v = (col("doc_id") % 4).cast("string")
    val hdr = concat(lit("Promo sub "), v, lit(" subscribe to our newsletter today"))
    val ftr = concat(lit("Promo ftr  "), v, lit("  follow us for more updates"))
    val withHdr = when(col("doc_id") % 3 === 0,
      concat(hdr, lit("\n"), body)).otherwise(body)
    when(col("doc_id") % 5 === 0, concat(withHdr, lit("\n"), ftr))
      .otherwise(withHdr)
  }

  /** Deterministic INTRA-document repetition view for d13 (QueryDef-only
    * scaffolding; both engines state the same closed form): the driver
    * corpus is single-line word soup, so within-document repeated-line
    * removal would be vacuous without repeats. Body = the linified
    * 10-token lines (the [[linifiedText]] regex slice — equivalent to
    * token-array slicing under the generator's single-spaced contract);
    * every doc_id % 2 == 0 doc gets the SAME doc-derived nav line
    * (variant = doc_id % 4) at top AND bottom — the template-chrome
    * repetition an intra-doc pass removes — and every doc_id % 8 == 0
    * doc two further ADJACENT copies appended (exercises run collapse
    * and multi-occurrence accounting, not just the pair case). Odd docs
    * stay repeat-free passthroughs. Plain % (repo convention for the
    * non-negative testdata ids). */
  private[graft] def intradocText: Column = {
    val body = regexp_replace(col("text"), "((?:\\S+ ){9}\\S+) ", "$1\n")
    val nav = concat(lit("Nav menu "), (col("doc_id") % 4).cast("string"),
      lit(" home about contact"))
    val wrapped = when(col("doc_id") % 2 === 0,
      concat(nav, lit("\n"), body, lit("\n"), nav)).otherwise(body)
    when(col("doc_id") % 8 === 0,
      concat(wrapped, lit("\n"), nav, lit("\n"), nav)).otherwise(wrapped)
  }

  /** Deterministic doc_id-derived URL synthesis for c13 (QueryDef-only
    * scaffolding; both engines state the same closed form): the driver
    * corpus carries no URL column, so the c13 registered-domain cap
    * would be vacuous without one. Every doc draws a host from the
    * SALTED hash md5('url:'‖doc_id) (the c10 cap-draw discipline — a
    * fresh 128-bit draw independent of every claimed plain-hash octet):
    * octet 1 picks one of 4 subdomain prefixes (including the 2-deep
    * 'cdn.news.'), octets 2–3 one of 40 registered-domain bases, octet
    * 4 one of 8 TLDs — including the multi-label public suffixes
    * 'co.uk'/'ac.uk' (exercising the longest-match rule path) and
    * 'xyz', deliberately ABSENT from the stored rule snapshot so the
    * PSL implicit-'*' default path is exercised too. */
  private[graft] def syntheticUrl: Column = {
    val h = md5(concat(lit("url:"), col("doc_id").cast("string")))
    val subs = array(lit(""), lit("www."), lit("blog."), lit("cdn.news."))
    val tlds = array(lit("com"), lit("org"), lit("net"), lit("io"),
      lit("de"), lit("co.uk"), lit("ac.uk"), lit("xyz"))
    val sub = element_at(subs,
      (conv(substring(h, 1, 2), 16, 10).cast("long") % 4 + 1).cast("int"))
    val base = concat(lit("d"),
      (conv(substring(h, 3, 4), 16, 10).cast("long") % 40).cast("string"))
    val tld = element_at(tlds,
      (conv(substring(h, 7, 2), 16, 10).cast("long") % 8 + 1).cast("int"))
    concat(lit("https://"), sub, base, lit("."), tld,
      lit("/p/"), col("doc_id").cast("string"))
  }

  /** Deterministic script-bearing view for t33 (QueryDef-only
    * scaffolding; both engines state the same closed form): the corpus
    * is ASCII word soup, so the zh rows are ALREADY genuine lang↔script
    * mismatches (the real-world "lang tag says zh, content is Latin"
    * case — no injection needed); what injection adds is the other two
    * verdict populations: every zh doc with doc_id % 3 == 0 gets a
    * dominating Han block (repeat count = n_chars, so 4·n_chars Han
    * codepoints provably outnumber the ≤ n_chars Latin letters — the
    * consistent zh case), and every doc_id % 7 == 0 doc a dominating
    * Cyrillic block (the mojibake/mislabeled case for Latin langs);
    * doc_id % 11 == 0 docs carry a small Greek tail that moves the
    * count columns without flipping dominance. */
  private[graft] def scriptedText: Column = {
    val han = expr("repeat('\u6C49\u5B57\u6587\u672C', CAST(n_chars AS INT))")
    val cyr = expr("repeat('\u0442\u0435\u043A\u0441\u0442', CAST(n_chars AS INT))")
    val withHan = when(col("lang") === "zh" && col("doc_id") % 3 === 0,
      concat(col("text"), lit(" "), han)).otherwise(col("text"))
    val withCyr = when(col("doc_id") % 7 === 0,
      concat(withHan, lit(" "), cyr)).otherwise(withHan)
    when(col("doc_id") % 11 === 0,
      concat(withCyr, lit(" \u03B1\u03B2\u03B3\u03B4\u03B5"))).otherwise(withCyr)
  }

  /** Deterministic MESSY-URL synthesis for d14 (QueryDef-only
    * scaffolding; both engines state the same closed form): URL-keyed
    * dedup is vacuous without colliding canonical URLs, so six
    * doc_id-derived variants dress the SAME logical page address
    * (host = doc_id % 7 of 7 hosts, page = doc_id % 50) in the
    * standard crawl noise — scheme/host case, a default :443 port, a
    * www prefix, tracker query params, a fragment, a trailing slash —
    * while variant 5 keeps a genuinely different address (http scheme
    * AND /b/ path). Docs whose ids agree mod lcm(7,50) — and in the
    * https variants mod 6 ≠ 5 — canonicalize to the same URL. */
  private[graft] def messyUrl: Column = {
    val host = concat(lit("d"), (col("doc_id") % 7).cast("string"), lit(".com"))
    val page = (col("doc_id") % 50).cast("string")
    val v = col("doc_id") % 6
    when(v === 0, concat(lit("https://www."), host, lit("/a/"), page))
      .when(v === 1, concat(lit("HTTPS://"), upper(host), lit("/a/"), page, lit("/")))
      .when(v === 2, concat(lit("https://www."), host, lit(":443/a/"), page))
      .when(v === 3, concat(lit("https://"), host, lit("/a/"), page,
        lit("?utm_source=x&utm_campaign=y")))
      .when(v === 4, concat(lit("https://www."), host, lit("/a/"), page, lit("#frag")))
      .otherwise(concat(lit("http://"), host, lit("/b/"), page))
  }

  /** Funnel-shaped messy URL injection for the p9/p12 crawl funnels
    * (QueryDef-only scaffolding, restated verbatim in those oracles).
    * [[messyUrl]]'s d14 key is collision-HEAVY by design (≤ 700
    * canonical addresses per corpus — every probe status class must be
    * populated), which would gut a funnel: the post-URL stages would
    * see ≤ 700 docs. Here pages are per-doc UNIQUE except ids ≡ 9
    * (mod 10), which share the preceding id's page — a realistic ~10 %
    * crawl re-fetch rate — and the host is keyed off the PAGE (not the
    * doc_id), so a shared page means a shared host and the pair really
    * collides. The six surface variants are d14's (case, :443, www,
    * trackers, fragment, trailing slash), so canonicalization is
    * exercised, and a pair whose two variants straddle the http-b /
    * https-a class split (ids 10k+8/10k+9 with (10k+9) % 6 ∈ {0, 5})
    * correctly does NOT dedup — schemes are never folded. One FAR
    * collision class on top: every id ≡ 50 (mod 100) shares page 50 —
    * the "page refetched in every crawl" shape — which is what gives
    * p12's stored-keeper probe a `dup_of_stored` slice at every SF
    * (adjacent-pair collisions never straddle p12's 400 boundary);
    * ids ≡ 50 (mod 100) are ≡ 50/150/250 (mod 300), never ≡ 5 (mod
    * 6), so the class always matches and the collapse is real. */
  private[graft] def messyUrlFunnel: Column = {
    val id = col("doc_id")
    val pg = when(id % 100 === 50, lit(50L))
      .otherwise(id - when(id % 10 === 9, 1L).otherwise(0L))
    val page = pg.cast("string")
    val host = concat(lit("d"), (pg % 7).cast("string"), lit(".com"))
    val v = id % 6
    when(v === 0, concat(lit("https://www."), host, lit("/a/"), page))
      .when(v === 1, concat(lit("HTTPS://"), upper(host), lit("/a/"), page, lit("/")))
      .when(v === 2, concat(lit("https://www."), host, lit(":443/a/"), page))
      .when(v === 3, concat(lit("https://"), host, lit("/a/"), page,
        lit("?utm_source=x&utm_campaign=y")))
      .when(v === 4, concat(lit("https://www."), host, lit("/a/"), page, lit("#frag")))
      .otherwise(concat(lit("http://"), host, lit("/b/"), page))
  }

  /** The deterministic "previous snapshot" for c9 (QueryDef-only
    * scaffolding; both engines state the same closed form): yesterday's
    * corpus is today's minus every 17th doc (today's "added"), plus
    * every 19th doc carrying an older revision of its text ("changed"),
    * plus a retired doc per 23rd id at an id range today provably does
    * not have — alias = doc_id − min + max + 1, with min/max MEASURED
    * from the corpus (a fixed constant would collide with live ids once
    * the corpus outgrows it, and a bare max+1 offset still collides
    * when ids are negative: −23 + max+1 can land inside [min, max]; the
    * min-shift maps every alias injectively into (max, ∞)), broadcast
    * as a single-row frame ("removed"). */
  private[graft] def previousSnapshot(docs: DataFrame): DataFrame = {
    // carries the FULL document schema (r18: p10's day-1 release runs
    // the whole curation stack over it; c9 keeps selecting only
    // doc_id/text/source). n_chars is NOT recomputed for the mutated
    // "legacy revision" texts — those rows exist to BE the changed set,
    // so they are rewritten from today's snapshot by any consumer of
    // the diff; unchanged-text rows keep their original metadata, the
    // invariant delta publication actually relies on.
    val cols = docs.columns.map(col)
    // sign-preserving % (repo modulo convention — matches DuckDB on any id)
    val retained = docs.filter(col("doc_id") % 17 =!= 0)
      .withColumn("text",
        when(col("doc_id") % 19 === 0,
          concat(col("text"), lit(" legacy revision"))).otherwise(col("text")))
    val mx = docs.agg(max(col("doc_id")).as("__mx"), min(col("doc_id")).as("__mn"))
    val retired = docs.filter(col("doc_id") % 23 === 0)
      .crossJoin(broadcast(mx))
      .withColumn("doc_id", col("doc_id") - col("__mn") + col("__mx") + 1L)
      .select(cols: _*)
    retained.select(cols: _*).unionByName(retired)
  }
}
