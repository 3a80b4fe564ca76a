package graft

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{DedupQueries, PipelineQueries, Scaffold, UrlQueries}
import graft.sources.Tables

/** p12 (r19): the incremental fuzzy release's stored-fed day-2 stage
  * assembly. The DuckDB oracle proves the END of the composition
  * (delta-published manifest ≡ from-scratch p9 publish of corpus ∪
  * increment); what it cannot state is that each STORED-FED STAGE
  * frame equals its re-mined twin — the algebra the whole operator
  * rests on: URL keepers probed not re-elected, text hashes anti-
  * joined not re-shuffled, gram postings probed not re-shingled, and
  * the stored day-1 pair table unioned not re-mined. Pinned here on a
  * fixture that PLANTS every cross-boundary shape (the real testdata
  * has no cross-boundary exact dup below sf0.1), and once more on the
  * real sf0.001 scaffold.
  */
class FuzzyIncrementalSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val dir = "/root/testdata/sf0.001"

  private def mkDocs(rows: Seq[(Long, String, String)]): DataFrame = {
    import spark.implicits._
    rows.toDF("doc_id", "text", "url")
      .withColumn("lang", lit("en"))
      .withColumn("source", lit("web"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .select("doc_id", "text", "lang", "source", "n_chars", "url")
  }

  // day-1 corpus: two of its docs form a near-dup pair (10, 11); the
  // rest are distinct. All ids < the 250 probe bound, so every day-1
  // canonical doc is probe-side — the p12 monotone-id geometry.
  private val base10 =
    "the shared corpus passage about spark engines and their shuffle behavior at scale"
  private val base12 =
    "another shared passage describing minhash banding and jaccard thresholds in detail"
  private def day1Rows: Seq[(Long, String, String)] =
    (0L to 9L).map(i =>
      (i, s"day one document $i carries its own distinct payload phrase $i$i$i",
        s"https://ex$i.com/p/$i")) ++
      Seq(
        (10L, base10, "https://ex10.com/p/10"),
        (11L, base10 + " v2", "https://ex11.com/p/11"),
        (12L, base12, "https://ex12.com/p/12")) ++
      (13L to 19L).map(i =>
        (i, s"closing day one document $i with marker $i$i$i and padding words",
          s"https://ex$i.com/p/$i"))

  // increment: ids ≥ 400 (≥ the probe bound, > all day-1 ids — the
  // monotone-crawl-id contract), planting every cross-boundary shape
  private def incRows: Seq[(Long, String, String)] = Seq(
    // cross-boundary EXACT text dup of day-1 doc 5 → the stored
    // text-hash anti-join must drop it
    (400L, s"day one document 5 carries its own distinct payload phrase 555",
      "https://ex400.com/p/400"),
    // cross-boundary NEAR-dup of day-1 doc 12 → must be found by the
    // stored-postings probe, never by re-shingling day-1
    (401L, base12 + " appended tail", "https://ex401.com/p/401"),
    // increment-internal exact text dup → local canon keeps min id
    (402L, "increment internal duplicate payload text appears twice today",
      "https://ex402.com/p/402"),
    (403L, "increment internal duplicate payload text appears twice today",
      "https://ex403.com/p/403"),
    // cross-boundary URL dup (canonicalizes to day-1 doc 3's address)
    // → the stored keeper probe must drop it (dup_of_stored)
    (404L, "text unique to doc 404 but its address already shipped yesterday",
      "HTTPS://WWW.EX3.COM:443/p/3/"),
    // increment-internal URL dup → min batch id keeps (dup_in_batch)
    (405L, "first fetch of a brand new address in today's crawl batch",
      "https://ex405.com/p/405?utm_source=feed"),
    (406L, "second fetch of that same new address under a surface variant",
      "https://www.ex405.com/p/405"),
    (407L, "a plainly unique increment document with nothing shared at all",
      "https://ex407.com/p/407"))

  private def freshPaths(): (String, String) = {
    val tmp = Files.createTempDirectory("graft_fuzzyincr").toString
    (s"$tmp/url", s"$tmp/fz")
  }

  private def assembleAndTwin(day1: DataFrame, inc: DataFrame)
      : (Seq[Long], Seq[Long], Seq[(Long, Long, Double)], Seq[(Long, Long, Double)]) = {
    val (urlPath, fzPath) = freshPaths()
    UrlQueries.initStoredUrlIndex(spark, urlPath,
      day1.select(col("doc_id"), col("url")))
    PipelineQueries.initFuzzyMineIndex(spark, fzPath, day1)
    val (canon2, pairs2) =
      PipelineQueries.fuzzyStoredAssembly(spark, urlPath, fzPath, day1, inc)
    val all = day1.unionByName(inc)
    val canonFS =
      PipelineQueries.exactCanonOf(UrlQueries.urlCanonOf(all).drop("url"))
    val pairsFS = DedupQueries.ngramPairsOf(canonFS, threshold = 0.4,
      probeBound = 250L, corpusBound = 500L)
    def ids(df: DataFrame) =
      df.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    def ps(df: DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getAs[Double]("jaccard")))
      .sortBy(p => (p._1, p._2)).toSeq
    (ids(canon2), ids(canonFS), ps(pairs2), ps(pairsFS))
  }

  test("stored-fed day-2 assembly equals the from-scratch re-mine on the planted fixture") {
    val (c2, cFS, p2, pFS) = assembleAndTwin(mkDocs(day1Rows), mkDocs(incRows))
    assert(c2 == cFS, "stored-fed canonical set must equal the from-scratch canon")
    assert(p2 == pFS, "stored ∪ probed pair set must equal the full re-mine")
    // each planted cross-boundary shape actually fired:
    assert(!c2.contains(400L),
      "cross-boundary exact dup must be dropped by the stored text-hash stage")
    assert(c2.contains(402L) && !c2.contains(403L),
      "increment-internal exact dup must resolve to the min id locally")
    assert(!c2.contains(404L),
      "cross-boundary URL dup must be dropped by the stored keeper probe")
    assert(c2.contains(405L) && !c2.contains(406L),
      "increment-internal URL dup must resolve to the min batch id")
    assert(p2.exists(p => p._1 == 12L && p._2 == 401L),
      "cross-boundary near-dup pair must surface from the stored-postings probe")
    assert(p2.exists(p => p._1 == 10L && p._2 == 11L),
      "the day-1 pair must carry over from the stored pair table")
  }

  test("increment probe alone never returns day-1-internal pairs") {
    val day1 = mkDocs(day1Rows)
    val (_, fzPath) = freshPaths()
    PipelineQueries.initFuzzyMineIndex(spark, fzPath, day1)
    val incCanon = PipelineQueries.exactCanonOf(
      UrlQueries.urlCanonOf(mkDocs(incRows)).drop("url"))
    val probed = DedupQueries.ngramPairsIncrementalStored(
        graft.sources.IndexStore.readSwappable(spark, fzPath, "postings"),
        incCanon, threshold = 0.4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(probed.nonEmpty && probed.forall(_._2 >= 400L),
      s"probe must only emit increment-touching pairs, got $probed")
  }

  test("day-2 plans serve day-1 from parquet — no re-shingle, no re-hash (plan audit)") {
    val day1 = mkDocs(day1Rows)
    val (urlPath, fzPath) = freshPaths()
    UrlQueries.initStoredUrlIndex(spark, urlPath,
      day1.select(col("doc_id"), col("url")))
    PipelineQueries.initFuzzyMineIndex(spark, fzPath, day1)
    val (canon2, pairs2) =
      PipelineQueries.fuzzyStoredAssembly(spark, urlPath, fzPath, day1,
        mkDocs(incRows))
    val pc = pairs2.queryExecution.executedPlan.toString
    // the day-1 pairs are a parquet scan of the stored table (the
    // probe postings also come from parquet, but ride the measured
    // broadcast guard, whose stage hides the path from the final
    // plan); the ONLY gram expansion left in the plan is the
    // increment's own — a full re-mine would carry two explode sides
    assert(pc.contains("pairs"),
      "expected a scan over the stored pairs table\n" + pc.take(2000))
    val explodes = "\\bGenerate ".r.findAllIn(pc).size
    assert(explodes == 1,
      s"expected exactly one gram expansion (the increment's), got $explodes\n" +
        pc.take(2000))
    // day-1 canon re-enters by STORED ID: an id-keyed join against the
    // canonids parquet, with md5 appearing only on the increment branch
    val cc = canon2.queryExecution.executedPlan.toString
    assert(cc.contains("canonids"),
      "expected the day-1 side to join the stored canonical ids\n" + cc.take(2000))
  }

  test("testdata sf0.001: stored-fed assembly equals from-scratch, with a live dup_of_stored slice") {
    val docs = Tables.documents(spark, dir)
      .withColumn("url", Scaffold.messyUrlFunnel)
    val day1 = docs.filter(col("doc_id") < 400L)
    val inc = docs.filter(col("doc_id") >= 400L)
    val (c2, cFS, p2, pFS) = assembleAndTwin(day1, inc)
    assert(c2 == cFS)
    assert(p2 == pFS)
    assert(p2.nonEmpty, "no pairs at all on sf0.001 — vacuous")
    // the far-collision scaffold class: id 450 shares page 50 with
    // day-1 keeper 50, so the stored keeper probe must drop it
    assert(c2.contains(50L) && !c2.contains(450L),
      "scaffold far collision (450 → keeper 50) must be a dup_of_stored drop")
  }
}
