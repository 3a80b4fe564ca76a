package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.PipelineQueries
import graft.sources.DatasetCard

/** The dataset card must be (a) byte-deterministic — the committed
  * sf0.01 sample pins the exact rendering, the LatexReportSpec
  * discipline — and (b) UNABLE to disagree with the audits it renders:
  * the split table's numbers are cross-checked against p5f's own
  * output rows.
  */
class DatasetCardSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val dir = "/root/testdata/sf0.01"
  private lazy val card = DatasetCard.render(spark, dir)

  private def f6(v: Double): String =
    String.format(java.util.Locale.ROOT, "%.6f", Double.box(v))

  test("committed sample matches a fresh render byte-exactly") {
    val committed = java.nio.file.Files.readString(
      java.nio.file.Paths.get("results/dataset_card_sf001.md"))
    assert(committed == card,
      "results/dataset_card_sf001.md is stale — regenerate via DatasetCard.write")
  }

  test("sections present in fixed order") {
    val idx = Seq("# Dataset card", "## Split statistics", "## Domain mix",
      "## Benchmark clearance", "## Split-leakage audit",
      "## Tokenizer fertility", "## Decontamination gram profile",
      "## Content manifest")
      .map(card.indexOf)
    assert(idx.forall(_ >= 0) && idx == idx.sorted, s"section order broke: $idx")
  }

  test("fertility rows equal t26f's own output") {
    val want = SparkEntry.queries("t26f_fertility_from_release")(spark, dir)
      .collect().map { r =>
        s"| ${r.getString(0)} | ${r.getLong(1)} | ${r.getLong(2)} | " +
          s"${r.getLong(3)} | ${f6(r.getDouble(5))} | ${f6(r.getDouble(6))} | " +
          s"${f6(r.getDouble(7))} |"
      }
    assert(want.nonEmpty)
    want.foreach(line => assert(card.contains(line), s"missing row: $line"))
  }

  test("gram-profile rows equal x5f's own output") {
    val want = SparkEntry.queries("x5f_decon_profile_from_release")(spark, dir)
      .collect().map { r =>
        val rate = if (r.isNullAt(4)) "n/a" else f6(r.getDouble(4))
        s"| ${r.getLong(0)} | ${r.getLong(1)} | ${r.getLong(2)} | " +
          s"${r.getLong(3)} | $rate |"
      }
    assert(want.length == 3)
    want.foreach(line => assert(card.contains(line), s"missing row: $line"))
  }

  test("split table rows equal p5f's own output") {
    val want = SparkEntry.queries("p5f_report_from_release")(spark, dir)
      .collect().map { r =>
        s"| ${r.getString(0)} | ${r.getLong(1)} | ${r.getLong(2)} | " +
          // Locale.ROOT like the card itself — the f-interpolator uses
          // the JVM default locale and fails spuriously under comma-
          // decimal locales (r17 advice fix)
          s"${f6(r.getDouble(3))} | ${r.getLong(4)} | ${r.getString(5)} | " +
          s"${f6(r.getDouble(6))} |"
      }
    want.foreach(line => assert(card.contains(line), s"missing row: $line"))
  }

  test("clearance rows render every benchmark x split cell") {
    val n = SparkEntry.queries("x4f_clearance_from_release")(spark, dir).count()
    val section = card.substring(card.indexOf("## Benchmark clearance"),
      card.indexOf("## Split-leakage audit"))
    assert(section.linesIterator.count(_.startsWith("| bench_")) == n)
  }
}
