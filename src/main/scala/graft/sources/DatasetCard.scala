package graft.sources

import java.util.Locale

import org.apache.spark.sql.SparkSession

/** The dataset card — the human-facing governance artifact every public
  * data release ships (the HuggingFace dataset README shape): split
  * statistics, domain mix, benchmark clearance, split-leakage audit and
  * the content-manifest summary, rendered as ONE deterministic markdown
  * document.
  *
  * Every table is computed FROM THE PUBLISHED RELEASE through the r17
  * audit-from-published-release family (p5f/p5cf/x4f/p6f + the p4
  * manifest of the read-back), so the card can never describe a corpus
  * other than the artifact it ships with — the same reason p4's
  * manifest is computed from the written files. Rendering is
  * byte-deterministic (Locale.ROOT %.6f, sorted rows, fixed section
  * order): DatasetCardSpec pins the committed sf0.01 sample byte-exact
  * and cross-checks the embedded numbers against the underlying
  * queries' own output.
  *
  * Scale shape: nothing new — the card collects the audit queries'
  * RESULTS, all of which are dashboard-sized (|splits|, |benchmarks|×3,
  * |split pairs|, top-N domains); the corpus-touching work is the audit
  * family's, already sized in SCALE.md.
  */
object DatasetCard {

  private def f6(v: Double): String = String.format(Locale.ROOT, "%.6f", Double.box(v))

  /** Render the card for `dir`'s published release (publishing it first
    * if this session has not yet — the publishedReleaseDir contract). */
  def render(s: SparkSession, dir: String, topDomains: Int = 10): String = {
    import graft.operators.{ContaminationQueries, PipelineQueries}
    val sb = new StringBuilder
    sb ++= "# Dataset card\n\n"
    sb ++= "All tables below are computed from the PUBLISHED release artifact\n"
    sb ++= "(audit-from-published-release mode), not from the raw corpus — the\n"
    sb ++= "card cannot describe a corpus other than the one it ships with.\n\n"

    sb ++= "## Split statistics\n\n"
    sb ++= "| split | documents | tokens | mean quality | languages | top language | top share |\n"
    sb ++= "|---|---|---|---|---|---|---|\n"
    PipelineQueries.releaseReportOf(PipelineQueries.releaseFrame(s, dir))
      .collect().foreach { r =>
        sb ++= s"| ${r.getString(0)} | ${r.getLong(1)} | ${r.getLong(2)} | " +
          s"${f6(r.getDouble(3))} | ${r.getLong(4)} | ${r.getString(5)} | " +
          s"${f6(r.getDouble(6))} |\n"
      }

    sb ++= s"\n## Domain mix (top $topDomains by token share)\n\n"
    sb ++= "| split | domain | documents | tokens | token share |\n"
    sb ++= "|---|---|---|---|---|\n"
    val mix = PipelineQueries.domainMixOf(PipelineQueries.releaseFrame(s, dir),
        new graft.functions.SuffixRules(
          graft.operators.SampleQueries.storedSuffixRules(s, dir)))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getDouble(5)))
      .sortBy { case (split, dom, _, _, share) => (-share, split, dom) }
      .take(topDomains)
    mix.foreach { case (split, dom, docs, toks, share) =>
      sb ++= s"| $split | $dom | $docs | $toks | ${f6(share)} |\n"
    }

    sb ++= "\n## Benchmark clearance\n\n"
    sb ++= "| benchmark | split | benchmark grams | residual grams | clean |\n"
    sb ++= "|---|---|---|---|---|\n"
    ContaminationQueries.clearanceFromRelease(s, dir).collect().foreach { r =>
      sb ++= s"| ${r.getString(0)} | ${r.getString(1)} | ${r.getLong(2)} | " +
        s"${r.getLong(3)} | ${r.getBoolean(4)} |\n"
    }

    sb ++= "\n## Split-leakage audit\n\n"
    val leaks = PipelineQueries.splitLeakage(PipelineQueries.releaseFrame(s, dir))
      .collect()
    if (leaks.isEmpty)
      sb ++= "No cross-split near-duplicate pairs at the df-capped 5-gram rule.\n"
    else {
      sb ++= "| split pair | near-dup pairs | max shared grams | total shared |\n"
      sb ++= "|---|---|---|---|\n"
      leaks.foreach { r =>
        sb ++= s"| ${r.getString(0)}/${r.getString(1)} | ${r.getLong(2)} | " +
          s"${r.getLong(3)} | ${r.getLong(4)} |\n"
      }
    }

    sb ++= "\n## Tokenizer fertility\n\n"
    sb ++= "| language | documents | ws tokens | merge tokens | fertility | chars/token | premium vs en |\n"
    sb ++= "|---|---|---|---|---|---|---|\n"
    graft.operators.SubwordQueries.tTokenizerFertilityFromRelease
      .fn(s, dir).collect().foreach { r =>
        sb ++= s"| ${r.getString(0)} | ${r.getLong(1)} | ${r.getLong(2)} | " +
          s"${r.getLong(3)} | ${f6(r.getDouble(5))} | ${f6(r.getDouble(6))} | " +
          s"${f6(r.getDouble(7))} |\n"
      }

    sb ++= "\n## Decontamination gram profile\n\n"
    sb ++= "| n | eval grams | shared grams | release docs hit | hit rate |\n"
    sb ++= "|---|---|---|---|---|\n"
    ContaminationQueries.decontaminationProfileFromRelease(s, dir)
      .collect().foreach { r =>
        val rate = if (r.isNullAt(4)) "n/a" else f6(r.getDouble(4))
        sb ++= s"| ${r.getLong(0)} | ${r.getLong(1)} | ${r.getLong(2)} | " +
          s"${r.getLong(3)} | $rate |\n"
      }

    sb ++= "\n## Content manifest\n\n"
    val man = ReleaseWriter.manifestOf(ReleaseWriter.readRelease(
        s, PipelineQueries.publishedReleaseDir(s, dir))).collect()
    val nDocs = man.map(_.getLong(2)).sum
    val nChars = man.map(_.getLong(3)).sum
    sb ++= s"${man.length} (split, bucket) manifest rows; $nDocs documents, " +
      s"$nChars chars total. Per-bucket order-invariant content digests are\n"
    sb ++= "published alongside the release files; re-run `manifestOf` over the\n"
    sb ++= "artifact to verify integrity.\n"
    sb.result()
  }

  def write(s: SparkSession, dir: String, path: String): Unit =
    java.nio.file.Files.writeString(java.nio.file.Paths.get(path), render(s, dir))
}
