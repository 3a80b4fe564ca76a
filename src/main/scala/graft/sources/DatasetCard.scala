package graft.sources

import java.util.Locale

import org.apache.spark.sql.SparkSession

/** The dataset card — the governance artifact every public data release
  * ships (the HuggingFace dataset README shape): split statistics, a
  * "changes since previous version" section (r20 — p11's release
  * changelog, so a card reader sees what a push moved, not only the
  * current state), domain mix, benchmark clearance, split-leakage
  * audit and the content-manifest summary, rendered as ONE
  * deterministic markdown document for humans AND (r19) a typed JSON
  * artifact for governance consumers that parse instead of scrape.
  *
  * Every table is computed FROM THE PUBLISHED RELEASE through the r17
  * audit-from-published-release family (p5f/p5cf/x4f/p6f + the p4
  * manifest of the read-back), so the card can never describe a corpus
  * other than the artifact it ships with — the same reason p4's
  * manifest is computed from the written files. Both renderings draw
  * from ONE collected [[CardData]] (each section's query runs once and
  * feeds both), so the JSON can never disagree with the markdown — the
  * no-drift discipline applied to the card's own two faces. Rendering
  * is byte-deterministic (Locale.ROOT %.6f, sorted rows, fixed section
  * order, hand-ordered JSON fields): DatasetCardSpec pins the committed
  * sf0.01 samples byte-exact and cross-checks the embedded numbers
  * against the underlying queries' own output.
  *
  * Scale shape: nothing new — the card collects the audit queries'
  * RESULTS, all of which are dashboard-sized (|splits|, |benchmarks|×3,
  * |split pairs|, top-N domains); the corpus-touching work is the audit
  * family's, already sized in SCALE.md.
  */
object DatasetCard {

  private def f6(v: Double): String = String.format(Locale.ROOT, "%.6f", Double.box(v))

  /** The card's collected section data — one query pass, two faces. */
  private[graft] final case class CardData(
      topDomains: Int,
      splitStats: Seq[(String, Long, Long, Double, Long, String, Double)],
      changelog: Seq[(String, String, String, Long, Long)],
      domainMix: Seq[(String, String, Long, Long, Double)],
      clearance: Seq[(String, String, Long, Long, Boolean)],
      leaks: Seq[(String, String, Long, Long, Long)],
      fertility: Seq[(String, Long, Long, Long, Double, Double, Double)],
      deconProfile: Seq[(Long, Long, Long, Long, Option[Double])],
      manifestRows: Int, nDocs: Long, nChars: Long)

  /** Run the audit family once and collect every section's rows. */
  private[graft] def compute(s: SparkSession, dir: String,
                             topDomains: Int = 10): CardData = {
    import graft.operators.{ContaminationQueries, PipelineQueries}
    val splitStats = PipelineQueries
      .releaseReportOf(PipelineQueries.releaseFrame(s, dir))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getLong(4), r.getString(5), r.getDouble(6))).toSeq
    // "what changed since the last push" (r20, the r19 verdict's #5) —
    // p11's own changelog body verbatim, so the card's section can
    // never disagree with the audit operator (DatasetCardSpec
    // cross-checks the rows against p11's output)
    val changelog = PipelineQueries.pReleaseChangelog.fn(s, dir)
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2),
        r.getLong(3), r.getLong(4))).toSeq
    val mix = PipelineQueries.domainMixOf(PipelineQueries.releaseFrame(s, dir),
        new graft.functions.SuffixRules(
          graft.operators.SampleQueries.storedSuffixRules(s, dir)))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getDouble(5)))
      .sortBy { case (split, dom, _, _, share) => (-share, split, dom) }
      .take(topDomains).toSeq
    val clearance = ContaminationQueries.clearanceFromRelease(s, dir)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getBoolean(4))).toSeq
    val leaks = PipelineQueries
      .splitLeakage(PipelineQueries.releaseFrame(s, dir))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSeq
    val fertility = graft.operators.SubwordQueries.tTokenizerFertilityFromRelease
      .fn(s, dir).collect().map(r => (r.getString(0), r.getLong(1),
        r.getLong(2), r.getLong(3), r.getDouble(5), r.getDouble(6),
        r.getDouble(7))).toSeq
    val decon = ContaminationQueries.decontaminationProfileFromRelease(s, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), if (r.isNullAt(4)) None else Some(r.getDouble(4)))).toSeq
    val man = ReleaseWriter.manifestOf(ReleaseWriter.readRelease(
        s, PipelineQueries.publishedReleaseDir(s, dir))).collect()
    CardData(topDomains, splitStats, changelog, mix, clearance, leaks,
      fertility, decon,
      man.length, man.map(_.getLong(2)).sum, man.map(_.getLong(3)).sum)
  }

  /** Render the markdown card for `dir`'s published release (publishing
    * it first if this session has not yet — the publishedReleaseDir
    * contract). */
  def render(s: SparkSession, dir: String, topDomains: Int = 10): String =
    renderMarkdown(compute(s, dir, topDomains))

  private[graft] def renderMarkdown(d: CardData): String = {
    val sb = new StringBuilder
    sb ++= "# Dataset card\n\n"
    sb ++= "All tables below are computed from the PUBLISHED release artifact\n"
    sb ++= "(audit-from-published-release mode), not from the raw corpus — the\n"
    sb ++= "card cannot describe a corpus other than the one it ships with.\n\n"

    sb ++= "## Split statistics\n\n"
    sb ++= "| split | documents | tokens | mean quality | languages | top language | top share |\n"
    sb ++= "|---|---|---|---|---|---|---|\n"
    d.splitStats.foreach { case (split, docs, toks, q, nl, topL, topS) =>
      sb ++= s"| $split | $docs | $toks | ${f6(q)} | $nl | $topL | ${f6(topS)} |\n"
    }

    sb ++= "\n## Changes since previous version\n\n"
    sb ++= "| source | split | status | documents | min doc id |\n"
    sb ++= "|---|---|---|---|---|\n"
    d.changelog.foreach { case (src, split, status, docs, minId) =>
      sb ++= s"| $src | $split | $status | $docs | $minId |\n"
    }

    sb ++= s"\n## Domain mix (top ${d.topDomains} by token share)\n\n"
    sb ++= "| split | domain | documents | tokens | token share |\n"
    sb ++= "|---|---|---|---|---|\n"
    d.domainMix.foreach { case (split, dom, docs, toks, share) =>
      sb ++= s"| $split | $dom | $docs | $toks | ${f6(share)} |\n"
    }

    sb ++= "\n## Benchmark clearance\n\n"
    sb ++= "| benchmark | split | benchmark grams | residual grams | clean |\n"
    sb ++= "|---|---|---|---|---|\n"
    d.clearance.foreach { case (bench, split, bg, rg, clean) =>
      sb ++= s"| $bench | $split | $bg | $rg | $clean |\n"
    }

    sb ++= "\n## Split-leakage audit\n\n"
    if (d.leaks.isEmpty)
      sb ++= "No cross-split near-duplicate pairs at the df-capped 5-gram rule.\n"
    else {
      sb ++= "| split pair | near-dup pairs | max shared grams | total shared |\n"
      sb ++= "|---|---|---|---|\n"
      d.leaks.foreach { case (sa, sbl, pairs, mx, tot) =>
        sb ++= s"| $sa/$sbl | $pairs | $mx | $tot |\n"
      }
    }

    sb ++= "\n## Tokenizer fertility\n\n"
    sb ++= "| language | documents | ws tokens | merge tokens | fertility | chars/token | premium vs en |\n"
    sb ++= "|---|---|---|---|---|---|---|\n"
    d.fertility.foreach { case (lang, docs, ws, mt, fert, cpt, prem) =>
      sb ++= s"| $lang | $docs | $ws | $mt | ${f6(fert)} | ${f6(cpt)} | ${f6(prem)} |\n"
    }

    sb ++= "\n## Decontamination gram profile\n\n"
    sb ++= "| n | eval grams | shared grams | release docs hit | hit rate |\n"
    sb ++= "|---|---|---|---|---|\n"
    d.deconProfile.foreach { case (n, eg, sg, hit, rate) =>
      sb ++= s"| $n | $eg | $sg | $hit | ${rate.map(f6).getOrElse("n/a")} |\n"
    }

    sb ++= "\n## Content manifest\n\n"
    sb ++= s"${d.manifestRows} (split, bucket) manifest rows; ${d.nDocs} documents, " +
      s"${d.nChars} chars total. Per-bucket order-invariant content digests are\n"
    sb ++= "published alongside the release files; re-run `manifestOf` over the\n"
    sb ++= "artifact to verify integrity.\n"
    sb.result()
  }

  // ---- machine-readable face (r19) ------------------------------------

  private def jstr(v: String): String =
    "\"" + v.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""

  private def jobj(fields: Seq[(String, String)]): String =
    fields.map { case (k, v) => s"${jstr(k)}: $v" }.mkString("{", ", ", "}")

  private def jarr(rows: Seq[String], indent: String): String =
    if (rows.isEmpty) "[]"
    else rows.mkString(s"[\n$indent", s",\n$indent", "\n" + indent.drop(2) + "]")

  /** Render the typed JSON card — the same [[CardData]] the markdown
    * renders, as a parseable artifact (stable field order, %.6f
    * numbers, no scraping). Doubles are emitted at the markdown's own
    * printed precision so the two faces state identical values. */
  def renderJson(s: SparkSession, dir: String, topDomains: Int = 10): String =
    renderJsonData(compute(s, dir, topDomains))

  private[graft] def renderJsonData(d: CardData): String = {
    val splitStats = d.splitStats.map { case (split, docs, toks, q, nl, topL, topS) =>
      jobj(Seq("split" -> jstr(split), "documents" -> docs.toString,
        "tokens" -> toks.toString, "mean_quality" -> f6(q),
        "languages" -> nl.toString, "top_language" -> jstr(topL),
        "top_share" -> f6(topS)))
    }
    val changelog = d.changelog.map { case (src, split, status, docs, minId) =>
      jobj(Seq("source" -> jstr(src), "split" -> jstr(split),
        "status" -> jstr(status), "documents" -> docs.toString,
        "min_doc_id" -> minId.toString))
    }
    val mix = d.domainMix.map { case (split, dom, docs, toks, share) =>
      jobj(Seq("split" -> jstr(split), "domain" -> jstr(dom),
        "documents" -> docs.toString, "tokens" -> toks.toString,
        "token_share" -> f6(share)))
    }
    val clearance = d.clearance.map { case (bench, split, bg, rg, clean) =>
      jobj(Seq("benchmark" -> jstr(bench), "split" -> jstr(split),
        "benchmark_grams" -> bg.toString, "residual_grams" -> rg.toString,
        "clean" -> clean.toString))
    }
    val leaks = d.leaks.map { case (sa, sbl, pairs, mx, tot) =>
      jobj(Seq("split_a" -> jstr(sa), "split_b" -> jstr(sbl),
        "near_dup_pairs" -> pairs.toString, "max_shared_grams" -> mx.toString,
        "total_shared_grams" -> tot.toString))
    }
    val fertility = d.fertility.map { case (lang, docs, ws, mt, fert, cpt, prem) =>
      jobj(Seq("language" -> jstr(lang), "documents" -> docs.toString,
        "ws_tokens" -> ws.toString, "merge_tokens" -> mt.toString,
        "fertility" -> f6(fert), "chars_per_token" -> f6(cpt),
        "premium_vs_en" -> f6(prem)))
    }
    val decon = d.deconProfile.map { case (n, eg, sg, hit, rate) =>
      jobj(Seq("n" -> n.toString, "eval_grams" -> eg.toString,
        "shared_grams" -> sg.toString, "release_docs_hit" -> hit.toString,
        "hit_rate" -> rate.map(f6).getOrElse("null")))
    }
    val manifest = jobj(Seq("manifest_rows" -> d.manifestRows.toString,
      "documents" -> d.nDocs.toString, "total_chars" -> d.nChars.toString))
    // schema tag bumped v1 → v2 with the changes_since_previous field
    // (r20 review: a governance artifact that adds a top-level field
    // without a version signal breaks closed-schema validators
    // silently — the ensure-meta discipline applies to the card too)
    s"""{
       |  "schema": "graft-dataset-card-v2",
       |  "source_mode": "audit-from-published-release",
       |  "split_statistics": ${jarr(splitStats, "    ")},
       |  "changes_since_previous": ${jarr(changelog, "    ")},
       |  "domain_mix": {"top": ${d.topDomains}, "rows": ${jarr(mix, "    ")}},
       |  "benchmark_clearance": ${jarr(clearance, "    ")},
       |  "split_leakage": ${jarr(leaks, "    ")},
       |  "tokenizer_fertility": ${jarr(fertility, "    ")},
       |  "decontamination_gram_profile": ${jarr(decon, "    ")},
       |  "content_manifest": $manifest
       |}
       |""".stripMargin
  }

  def write(s: SparkSession, dir: String, path: String): Unit =
    java.nio.file.Files.writeString(java.nio.file.Paths.get(path), render(s, dir))

  def writeJson(s: SparkSession, dir: String, path: String): Unit =
    java.nio.file.Files.writeString(java.nio.file.Paths.get(path), renderJson(s, dir))

  /** Write both faces from ONE collected CardData — the audit query
    * family runs once, and the shared-data no-drift guarantee holds by
    * construction rather than by determinism across two passes. */
  def writeBoth(s: SparkSession, dir: String, mdPath: String,
                jsonPath: String, topDomains: Int = 10): Unit = {
    val d = compute(s, dir, topDomains)
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(mdPath), renderMarkdown(d))
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(jsonPath), renderJsonData(d))
  }
}
