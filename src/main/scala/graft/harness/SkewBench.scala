package graft.harness

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.DedupQueries

/** Skewed-corpus validation of the dedup salting/AQE story at sf1 scale
  * (VERDICT r7 #7): DedupSkewSpec proves the salted pair set is
  * UNCHANGED; this harness measures what salting actually buys — the
  * per-task shuffle spread — on a corpus 10× the sf0.1 fixture with a
  * deliberately hot boilerplate bucket.
  *
  * Corpus: 50,000 documents (sf1-scale vs sf0.1's 5,000), generated
  * deterministically from `spark.range` + hash expressions (counter-
  * based like PanelGenerator — partition-invariant, no driver loop):
  * 4% boilerplate docs spread over 7 near-identical template variants
  * (each variant's ~285 docs share every shingle; variants share the
  * 30-token template, so band slices drawn entirely from template
  * shingles MERGE variants into one bucket — measured max band bucket
  * 1,714 docs at 50k, 6,857 at 200k), 96% pseudo-random
  * 40-token prose. Written once to GRAFT_SKEW_DIR (default
  * /tmp/graft_skew) as documents.parquet so the d8 stored-index path
  * runs against it exactly as in production.
  *
  * Measured queries: d2-shape full near-dup mine (salted 8× vs
  * UNSALTED — the comparison that shows the spread), d7 duplicate
  * spans, d8 stored-index incremental (increment = first 1,000 docs).
  * Per query: wall seconds, result rows, and per-task shuffle-read
  * max/median + task-duration max/median from a SparkListener — the
  * max/median ratio IS the skew number; salting should pull it toward
  * 1 on the pair-generation stages.
  *
  * Usage: `runMain graft.harness.SkewBench` (SPARK_GRAFT_CPUS to size
  * the session). Prints one JSON line per query; committed snapshot in
  * results/skewbench.json, numbers quoted in SCALE.md.
  */
object SkewBench {

  /** Per-task metric collector (shuffle-read bytes + duration). */
  private final class TaskStats extends SparkListener {
    val reads = scala.collection.mutable.ArrayBuffer.empty[Long]
    val durations = scala.collection.mutable.ArrayBuffer.empty[Long]
    val peakMem = scala.collection.mutable.ArrayBuffer.empty[Long]
    override def onTaskEnd(te: SparkListenerTaskEnd): Unit = synchronized {
      val m = te.taskMetrics
      if (m != null) {
        reads += m.shuffleReadMetrics.totalBytesRead
        durations += te.taskInfo.duration
        peakMem += m.peakExecutionMemory
      }
    }
  }

  private def medMax(xs: Seq[Long]): (Double, Long) = {
    val pos = xs.filter(_ > 0).sorted
    if (pos.isEmpty) (0.0, 0L)
    else (pos(pos.size / 2).toDouble, pos.last)
  }

  /** 50k-doc deterministic skewed corpus (see object scaladoc). */
  def skewedDocs(s: SparkSession, nDocs: Long = 50000L): DataFrame = {
    val i = col("id")
    // 7 boilerplate variants: identical 30-token template + 2 trailing
    // variant tokens — docs of one variant are exact shingle-duplicates
    val template = (1 to 30).map(w => s"boilerplate$w").mkString(" ")
    val boiler = concat(lit(template), lit(" variantword"), pmod(i, lit(7)),
      lit(" trailer"), pmod(i, lit(7)))
    // pseudo-random 40-token prose, counter-keyed (doc id × position);
    // every 5th token is a stopword so prose PASSES the t9 quality
    // rules (without them the p1/p4 release pipeline keeps zero docs
    // and measures nothing) — mean word length ~5.5, 8 stopwords,
    // no dominant token, unique bigrams
    val stop = array(Seq("the", "a", "and", "of", "to", "in").map(lit): _*)
    val prose = concat_ws(" ", transform(sequence(lit(1), lit(40)),
      j => when(pmod(j, lit(5)) === 0,
          element_at(stop, (pmod(xxhash64(i, j, lit(3)), lit(6)) + 1).cast("int")))
        .otherwise(concat(lit("w"), pmod(xxhash64(i, j), lit(200000))))))
    s.range(nDocs).select(
      i.as("doc_id"),
      when(pmod(i, lit(25)) === 0, boiler).otherwise(prose).as("text"),
      concat(lit("src"), pmod(i, lit(4))).as("source"),
      // hot-language mix for the p1/p4 release pipeline (r12 #7): 85%
      // of docs in one language, the rest spread over 5 tails — the
      // shape a real crawl has and the per-(lang) aggregates must absorb
      when(pmod(xxhash64(i, lit(99)), lit(100)) < 85, lit("en"))
        .otherwise(concat(lit("l"), pmod(xxhash64(i, lit(98)), lit(5))))
        .as("lang"))
      .withColumn("n_chars", length(col("text")).cast("long"))
  }

  /** 50k skewed embeddings (sf1-scale vs sf0.1's 5,000): 30% form one
    * tight cluster — a dominant direction with ±5% per-coordinate
    * jitter, so sign-hyperplane LSH puts them in ONE bucket and the
    * coarse quantizer dedicates ~one list to them (the hot-list shape
    * a real embedding corpus develops around boilerplate/template
    * content) — and 70% pseudo-random. Counter-keyed hash expressions:
    * deterministic, partition-invariant, no driver loop. */
  def skewedEmbeddings(s: SparkSession, nVecs: Long = 50000L): DataFrame = {
    val i = col("id")
    def u(j: org.apache.spark.sql.Column, salt: Int): org.apache.spark.sql.Column = // uniform [0,1) from (id, j)
      pmod(xxhash64(i, j, lit(salt)), lit(100000)).cast("double") / 100000.0
    val hot = transform(sequence(lit(1), lit(64)),
      j => (when(j === 1, 1.0).otherwise(0.05) * (lit(1.0) + (u(j, 1) - 0.5) * 0.1))
        .cast("float"))
    val rand = transform(sequence(lit(1), lit(64)),
      j => ((u(j, 2) - 0.5) * 2.0).cast("float"))
    s.range(nVecs).select(
      i.as("vec_id"),
      when(pmod(i, lit(10)) < 3, hot).otherwise(rand).as("embedding"),
      pmod(i, lit(5)).cast("int").as("label"))
  }

  /** Long-document corpus for the d12 production-window evidence (r17
    * queue #5): the committed 50k/200k skew runs used k=8 because that
    * corpus's docs are 34–40 tokens, so production k=50 was untested
    * under load. Docs here are ~0.7–4.6k tokens (counter-keyed prose,
    * partition-invariant, no driver loop); 10% embed one of 5 shared
    * 80-token template runs (cross-doc duplicates — each variant recurs
    * in nDocs/50 docs, the hot duplicated-window class), and 5% carry a
    * doc-keyed 60-token run TWICE (intra-doc repeats — d12's
    * any-position occurrence rule must catch them with zero cross-doc
    * signal). Token mass: ~2.6k tokens/doc mean, so 5k docs ≈ 13M
    * tokens ≈ 7× the 50k short-doc corpus; 20k ≈ 52M ≈ 28×. */
  def longDocs(s: SparkSession, nDocs: Long): DataFrame = {
    val i = col("id")
    def prose(len: org.apache.spark.sql.Column, salt: Int) =
      concat_ws(" ", transform(sequence(lit(1), len),
        j => concat(lit("w"), pmod(xxhash64(i, j, lit(salt)), lit(2000000)))))
    val pre = (pmod(xxhash64(i, lit(11)), lit(800)) + lit(200)).cast("int")
    val post = (pmod(xxhash64(i, lit(12)), lit(3000)) + lit(500)).cast("int")
    // variant key = (i/10) % 5, NOT i % 5: the branch below selects
    // i % 10 == 0, under which i % 5 is constantly 0 — one template
    // instead of the designed five (r17 review finding; the corpus
    // version stamp bumped with the fix)
    val crossRun = concat_ws(" ", transform(sequence(lit(1), lit(80)),
      j => concat(lit("dup"), pmod(i / 10, lit(5)), lit("_"), j)))
    val intraRun = concat_ws(" ", transform(sequence(lit(1), lit(60)),
      j => concat(lit("r"), i, lit("_"), j)))
    val body =
      when(pmod(i, lit(10)) === 0,
        concat_ws(" ", prose(pre, 1), crossRun, prose(post, 2)))
      .when(pmod(i, lit(20)) === 5,
        concat_ws(" ", prose(pre, 1), intraRun, prose(post, 2), intraRun,
          prose(pre, 3)))
      .otherwise(concat_ws(" ", prose(pre, 1), prose(post, 2)))
    s.range(nDocs).select(i.as("doc_id"), body.as("text"))
  }

  def main(args: Array[String]): Unit = {
    val nDocs = sys.env.getOrElse("GRAFT_SKEW_DOCS", "50000").toLong
    val dir = sys.env.getOrElse("GRAFT_SKEW_DIR", "/tmp/graft_skew") +
      (if (nDocs == 50000L) "" else s"_$nDocs")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // materialize the corpus once (deterministic, so reuse is safe)
    val docsPath = s"$dir/documents.parquet"
    val fs = new org.apache.hadoop.fs.Path(docsPath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // rewrite when absent OR generated by an older skewedDocs (the
    // version stamp keeps a code change from silently measuring a
    // stale corpus; bump it whenever the generator changes)
    val corpusVersion = "r13-stopword-prose-lang"
    if (!fs.exists(new org.apache.hadoop.fs.Path(s"$docsPath/_SUCCESS")) ||
        !graft.sources.IndexStore.readStamp(spark, dir, "_corpus_version")
          .contains(corpusVersion)) {
      skewedDocs(spark, nDocs).write.mode("overwrite").parquet(docsPath)
      graft.sources.IndexStore.writeStamp(spark, dir, "_corpus_version", corpusVersion)
    }
    val docs = spark.read.parquet(docsPath)

    // Optional focused run (comma-separated measure names): re-measure
    // operators added after a committed record without re-running the
    // whole harness — the Bench.scala SPARK_GRAFT_BENCH_ONLY discipline.
    val only = sys.env.get("GRAFT_SKEW_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    // measure names are declared at call sites, so selector validation
    // happens at the END of the run: any selected name never seen is a
    // typo / stale name and the focused run must FAIL rather than
    // silently measure nothing (r15 ADVICE #3)
    val seen = scala.collection.mutable.Set.empty[String]
    def measure(name: String)(run: => Long): Unit = {
      seen += name
      if (only.exists(sel => !sel(name))) return
      // Bench.scala's r15 measurement-isolation nudge, which the skew
      // harness also needs once corpora carry long docs: the previous
      // measure's dead staged blocks (eager localCheckpoints) pin
      // storage memory until a GC lets the ContextCleaner reclaim them
      // — at 52M windows that pressure turned the NEXT measure's
      // partial aggregation into AGGREGATE_OUT_OF_MEMORY (r17 long-doc
      // suite). Runs before the warm pass; timing discipline unchanged.
      System.gc()
      // untimed warm pass: pays Janino codegen/JIT and any one-time
      // index build, so the timed pass measures steady-state query cost
      // (same discipline as Bench.scala) and cold/warm runs agree
      run
      val st = new TaskStats
      spark.sparkContext.addSparkListener(st)
      val t0 = System.nanoTime()
      val rows = run
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(500) // let the listener bus drain
      spark.sparkContext.removeSparkListener(st)
      val (readMed, readMax) = medMax(st.reads.toSeq)
      val (durMed, durMax) = medMax(st.durations.toSeq)
      val (_, memMax) = medMax(st.peakMem.toSeq)
      println(f"""{"query":"$name","wall_sec":$wall%.2f,"rows":$rows,""" +
        f""""tasks":${st.reads.size},""" +
        f""""shuffle_read_med_kb":${readMed / 1024}%.1f,"shuffle_read_max_kb":${readMax / 1024.0}%.1f,""" +
        f""""task_dur_med_ms":$durMed%.0f,"task_dur_max_ms":$durMax%.0f,""" +
        f""""peak_exec_mem_max_kb":${memMax / 1024.0}%.1f}""")
    }

    // Long-doc d12 suite (r17 queue #5): GRAFT_SKEW_LONG=1 runs ONLY
    // the production-k=50 substring measures over the long-doc corpus
    // (own dir, own version stamp) and exits — the short-doc catalog
    // below is a separate record.
    if (sys.env.contains("GRAFT_SKEW_LONG")) {
      val nLong = sys.env.getOrElse("GRAFT_SKEW_LONGDOCS", "5000").toLong
      val ldir = sys.env.getOrElse("GRAFT_SKEW_DIR", "/tmp/graft_skew") +
        s"_long_$nLong"
      val lpath = s"$ldir/documents.parquet"
      val lVersion = "r17-longdoc-v2-five-variants"
      if (!fs.exists(new org.apache.hadoop.fs.Path(s"$lpath/_SUCCESS")) ||
          !graft.sources.IndexStore.readStamp(spark, ldir, "_corpus_version")
            .contains(lVersion)) {
        longDocs(spark, nLong).write.mode("overwrite").parquet(lpath)
        graft.sources.IndexStore.writeStamp(spark, ldir, "_corpus_version", lVersion)
      }
      val ldocs = spark.read.parquet(lpath)
      measure(s"d12_longdoc_k50_$nLong")(
        graft.operators.DedupQueries.dupSubstringsOf(ldocs, 50).count())
      // d12b probe at k=50: corpus = the last 90% persisted once, the
      // first 10% arrives as the batch (the daily-increment shape)
      measure(s"d12b_longdoc_k50_probe_$nLong")({
        val path = s"$ldir/substr_idx_k50"
        val cut = nLong / 10
        val meta = s"v1|k=50|corpus=(doc_id >= $cut)|src=" +
          graft.sources.IndexStore.sourceStamp(spark, lpath)
        graft.sources.IndexStore.ensure(spark, path, meta) {
          graft.operators.DedupQueries.initStoredSubstrIndex(
            spark, path, ldocs.filter(col("doc_id") >= cut), k = 50)
        }
        graft.operators.DedupQueries.probeStoredSubstrIndex(
          spark, path, ldocs.filter(col("doc_id") < cut), k = 50).count()
      })
      spark.stop()
      return
    }

    // d2 shape: full corpus near-dup mine, FORCED-salted vs unsalted vs
    // adaptive — the pair SET is identical on every path (DedupSkewSpec);
    // the task spread and the replication tax are not. The adaptive row
    // shows the measured-probe routing: at 50k (max band bucket 1,714 < 2048)
    // it should track d2_unsalted; at 200k (6,857-doc buckets) d2_salted8.
    measure("d2_grid_forced")(
      DedupQueries.minHashPairs(docs, saltAbove = 0L).count())
    measure("d2_unsalted")(DedupQueries.minHashPairs(docs, gridMax = 1).count())
    measure("d2_adaptive")(DedupQueries.minHashPairs(docs).count())
    // d7: duplicate spans (span-frequency skew from the boilerplate)
    measure("d7_dup_spans")(
      graft.operators.DedupQueries.dDupSpans.fn(spark, dir).count())
    // d9: passage REMOVAL on the same corpus — the boilerplate docs are
    // ~fully covered (every window duplicated 285× within a variant), so
    // this measures the rebuild under maximal coverage pressure
    measure("d9_span_scrub")(
      graft.operators.DedupQueries.dSpanScrub.fn(spark, dir).count())
    // d12: variable-length substring dedup at k=8 — this corpus's docs
    // are 34-40 tokens (below the production k=50, where d12 is a
    // provable no-op here), so the skew measure runs the SAME machinery
    // at the corpus-relevant k: the boilerplate variants share every
    // 8-window, so ~8k docs/variant each coalesce into one maximal
    // span — the md5-keyed df pass and the per-doc islands window
    // under maximal duplication pressure
    measure("d12_dup_substrings_k8")(
      graft.operators.DedupQueries.dupSubstringsOf(docs, 8).count())
    // d12b: the stored-index probe at the same k — corpus = docs ≥ 1000
    // persisted once, the first 1,000 docs arrive as the batch; probes
    // sum stored partials for the BATCH's hashes only
    measure("d12b_substr_stored_probe")({
      val path = s"$dir/substr_idx_k8"
      // IndexStore.ensure with a source stamp (the d8 discipline): a
      // regenerated skew corpus rebuilds instead of silently probing a
      // stale index, and a crashed init (no meta) self-heals
      val meta = "v1|k=8|corpus=(doc_id >= 1000)|src=" +
        graft.sources.IndexStore.sourceStamp(spark, docsPath)
      graft.sources.IndexStore.ensure(spark, path, meta) {
        graft.operators.DedupQueries.initStoredSubstrIndex(
          spark, path, docs.filter(col("doc_id") >= 1000), k = 8)
      }
      graft.operators.DedupQueries.probeStoredSubstrIndex(
        spark, path, docs.filter(col("doc_id") < 1000), k = 8).count()
    })
    // d8: stored-index incremental, increment = first 1,000 docs
    measure("d8_incremental_stored")(
      DedupQueries.minHashPairsIncrementalStored(
        spark, dir, col("doc_id") >= 1000, "id_ge_1000",
        docs.filter(col("doc_id") < 1000)).count())

    // t15 shape: heavy hitters over the skewed vocabulary (the 30
    // boilerplate template tokens each cover ~0.1% of the 2M-token
    // stream; the 200k prose tokens ~10 occurrences each). MG two-pass
    // (m=4096 entries of per-task state, candidates-only confirm
    // shuffle) vs the naive full-vocabulary groupBy it replaces —
    // shuffle_read max/med shows what the sketch saves; the output
    // row set is identical
    measure("t15_mg_heavy_hitters")(
      graft.operators.TextQueries.heavyHitters(docs, 0.0005, 4096).count())
    measure("t15_naive_groupby") {
      val tk = docs.select(split(col("text"), " ").as("tk"))
      val tokens = tk.select(explode(col("tk")).as("w"))
      val total = tk.agg(sum(size(col("tk"))).cast("double").as("n"))
      tokens.groupBy("w").agg(count(lit(1)).as("n_tok"))
        .crossJoin(broadcast(total))
        .filter(col("n_tok") > col("n") * 0.0005).count()
    }

    // x2 shape: bloom-pruned decontamination on the boilerplate corpus.
    // Eval docs (id % 37 = 0) that are ALSO boilerplate (id % 25 = 0
    // too → ~54 docs) share every 4-gram with all ~2,000 train
    // boilerplate docs — the confirm join's gram-key fanout is the
    // hot-gram skew a real benchmark-vs-crawl scrub hits on template
    // text. The bloom pass must keep the non-boilerplate 96% from ever
    // reaching the confirm shuffle.
    measure("x2_bloom_scrub")(
      graft.operators.ContaminationQueries.xBloomScrub.fn(spark, dir).count())

    // v2/v7 shapes: ANN over the skewed embedding corpus (one hot LSH
    // bucket / hot coarse list holding 30% of the vectors). v2's salt
    // on the bucket self-join and v7's routed-list pruning are what
    // keep the hot bucket from concentrating into one task.
    val embPath = s"$dir/embeddings.parquet"
    if (!fs.exists(new org.apache.hadoop.fs.Path(s"$embPath/_SUCCESS")))
      skewedEmbeddings(spark, nDocs).write.mode("overwrite").parquet(embPath)
    measure("v2_lsh_ann")(
      graft.operators.VectorQueries.vLshAnn.fn(spark, dir).count())
    measure("v7_ivfadc_ann")(
      graft.operators.VectorQueries.vIvfAdcAnn.fn(spark, dir).count())

    // v9: filtered ANN — the selective label=3 predicate routes brute
    // (exact) at both corpus sizes under the default cap; the widened
    // ADC route's recall/shape is FilteredAnnSpec's job. The skew
    // question here is the broadcast-probes × filtered-corpus join.
    measure("v9_filtered_ann")(
      graft.operators.VectorQueries.vFilteredAnn.fn(spark, dir).count())

    // p1/p4 shapes (r12 #7): the END-TO-END release pipeline on the
    // duplicate-heavy hot-language corpus — canonical dedup (2,000
    // boilerplate docs collapsing to 7 canonicals through the
    // content-hash stats pass), quality filter, decontamination
    // (boilerplate eval docs share every 5-gram with all train
    // boilerplate — the guarded-broadcast gram join under maximal
    // overlap), split + audit; p4 adds the range-shuffled sorted write
    // and the manifest read-back over the written files.
    measure("p1_curation_audit")(
      graft.operators.PipelineQueries.pCuration.fn(spark, dir).count())
    measure("p4_release_write")(
      graft.operators.PipelineQueries.pReleaseWrite.fn(spark, dir).count())
    // p3/p5 complete the pipeline family: the per-doc manifest takes
    // the corpus through TWO doc_id-keyed left joins (evenness under
    // the duplicate pile-up), the card re-aggregates the released docs
    // by (split, lang) under the 85%-hot-language mix
    measure("p3_curation_manifest")(
      graft.operators.PipelineQueries.pManifest.fn(spark, dir).count())
    measure("p5_release_report")(
      graft.operators.PipelineQueries.pReleaseReport.fn(spark, dir).count())
    // r14 operators over the skew corpus: t19's one-time vocab fit is
    // paid in the warm pass (the d8/v6 index-build discipline), so the
    // timed pass is the steady-state encode — one codegen'd map pass;
    // c11 composes that encode with c5's bounded-state budget selector;
    // t20/t21 are the packing-stage audits (source-keyed window +
    // keyed aggregate — t21's window carries 8-token slices only);
    // c10 is the capped resample through the c4 two-phase rank.
    measure("t19_bpe_tokens")(
      graft.operators.SubwordQueries.tBpeTokens.fn(spark, dir).count())
    measure("c11_token_budget_bpe")(
      graft.operators.SubwordQueries.cTokenBudgetBpe.fn(spark, dir).count())
    measure("t20_pack_audit")(
      graft.operators.TextQueries.tPackAudit.fn(spark, dir).count())
    measure("t21_boundary_spans")(
      graft.operators.TextQueries.tBoundarySpans.fn(spark, dir).count())
    measure("c10_source_cap")(
      graft.operators.SampleQueries.cSourceCap.fn(spark, dir).count())

    // r15 operators over the skew corpus: t22's merge-table fit (two
    // passes incl. a kernel re-encode) is paid in the warm pass like
    // t19's vocab; the timed pass is the steady-state merge encode —
    // one codegen'd map pass with the per-word O(L²) merge loop. t13b
    // re-denominates the t13 packing window in subword counts (one
    // extra kernel call on the packing scan); c13 is the c10 cap with
    // the finer registered-domain key (more groups, smaller windows);
    // p5b/p5c extend the release-card family (the full release stack
    // plus one extra aggregate each).
    measure("t22_bpe_merge_tokens")(
      graft.operators.SubwordQueries.tBpeMergeTokens.fn(spark, dir).count())
    measure("t13b_sequence_pack_bpe")(
      graft.operators.SubwordQueries.tSequencePackBpe.fn(spark, dir).count())
    measure("c13_domain_cap")(
      graft.operators.SampleQueries.cDomainCap.fn(spark, dir).count())
    measure("p5b_release_report_bpe")(
      graft.operators.SubwordQueries.pReleaseReportBpe.fn(spark, dir).count())
    measure("p5c_domain_mix")(
      graft.operators.PipelineQueries.pDomainMix.fn(spark, dir).count())

    // d10: line-boilerplate removal over the linified skew corpus —
    // the 2,000 template docs share every 10-token body line, so the
    // hot line classes recur far above the 1% threshold; the measured
    // shape must stay ONE line-keyed aggregate + a map-side rewrite
    // (the boilerplate set collapses to a handful of normalized
    // lines, so the literal route runs at every scale). d11: keep-best
    // election — the pair probe is corpus-bounded, so what scales is
    // the full-corpus quality pass and the two broadcast joins back.
    measure("d10_line_boilerplate")(
      graft.operators.LineDedupQueries.dLineBoilerplate.fn(spark, dir).count())
    measure("d11_keep_best")(
      graft.operators.DedupClusters.dKeepBest.fn(spark, dir).count())

    // t23: the Gopher gate is a pure scan→kernel→project pass, so the
    // skew question is only whether the template docs' heavy internal
    // repetition (every 10-token body line recurring ~hundreds of
    // times within a variant) makes their per-row hash maps a task-
    // time outlier — the kernel is linear in tokens regardless of
    // repetition, so the profile must stay flat.
    measure("t23_gopher_gate")(
      graft.operators.GopherQueries.tGopherGate.fn(spark, dir).count())

    // p7: the composed funnel under the boilerplate pile-up — the
    // interesting scale behavior is that the 2,000-doc template class
    // collapses at the CLEANED-text dedup (chrome removed first), so
    // the gate and decontamination stages see the post-dedup corpus.
    measure("p7_gated_funnel")(
      graft.operators.PipelineQueries.pGatedFunnel.fn(spark, dir).count())

    // t13c: merge-rule-denominated packing — the two fit tiers and the
    // window are shared machinery; the skew question is the native
    // BpeMergeStats kernel over the template docs' repetitive bodies
    // (linear per token, like t19/t22 — profile must stay flat).
    measure("t13c_sequence_pack_merge")(
      graft.operators.SubwordQueries.tSequencePackMerge.fn(spark, dir).count())

    // d10b: stored-line-index incremental cleaning — init (corpus =
    // doc_id >= 250) is paid once in the untimed warm pass via
    // IndexStore.ensure; the timed pass measures the steady-state
    // batch probe: one narrow stored scan + the guarded broadcast of
    // the 250-doc batch's line set, O(increment) by design.
    measure("d10b_line_boiler_stored")(
      graft.operators.LineDedupQueries.dLineBoilerStored.fn(spark, dir).count())

    // t24: the reference-LM gate under the hot-language mix — the ref
    // slice is the 85% en majority, so BOTH count tables are large
    // here (worst case for the scoring joins: AQE must pick shuffle,
    // not broadcast, once the ref vocab outgrows the threshold); the
    // template docs' repeated bigrams concentrate count mass but the
    // (w1,w2)-keyed aggregate absorbs that map-side.
    measure("t24_perplexity_gate")(
      graft.operators.TextQueries.tPerplexityGate.fn(spark, dir).count())

    // t25: pack loss accounting — the explode is corpus-tokens/128
    // rows of five integers; the skew question is whether the
    // source-keyed offset window (4 sources → 4 window partitions at
    // any corpus size) becomes the straggler before the key widens to
    // (source, ingest-shard) as t13's scale note prescribes.
    measure("t25_sft_mask_pack")(
      graft.operators.TextQueries.tSftMaskPack.fn(spark, dir).count())

    // t26: fertility audit — scan-bound kernel pass into a 2-language
    // aggregate; the skew question is only whether the template docs'
    // repetitive bodies distort the kernel's per-task time (they
    // shouldn't: linear per token, like t22).
    measure("t26_tokenizer_fertility")(
      graft.operators.SubwordQueries.tTokenizerFertility.fn(spark, dir).count())

    // t27: the drift audit's |sources|×V grid under the template
    // corpus's concentrated token mass — 4 sources × the skew vocab;
    // the left join keys on (source, w) where the hot template tokens
    // carry most of the count mass.
    measure("t27_kl_drift")(
      graft.operators.TextQueries.tKlDrift.fn(spark, dir).count())

    // t28: the vocab-growth audit's single token-keyed min-bucket
    // aggregate — the hot template tokens collapse to one row each, so
    // the aggregate is bounded by the skew corpus's true vocab.
    measure("t28_vocab_growth")(
      graft.operators.TextQueries.tVocabGrowth.fn(spark, dir).count())

    // p8: the SFT pipeline = gate scan + t13 window + t25 explode +
    // two keyed rollups — the gate drops the template docs (they fail
    // the stopword rule), so the packed volume is the prose majority.
    measure("p8_sft_release")(
      graft.operators.PipelineQueries.pSftRelease.fn(spark, dir).count())

    // mm5: the fingerprint is per-partition map work; the skew corpus's
    // 2,000-doc template classes share byte mixes, so the fp-keyed
    // election sees genuinely hot fingerprints — the aggregate must
    // absorb them map-side.
    measure("mm5_phash_dedup")(
      graft.operators.MultimodalQueries.mPhashDedup.fn(spark, dir).count())

    // c17: one token-count aggregate + driver math — the measurement
    // pins that the plan stays aggregate-bound as the corpus grows.
    measure("c17_water_fill")(
      graft.operators.SampleQueries.cWaterFill.fn(spark, dir).count())

    // c16: kernel domain extraction + the guarded-broadcast blocklist
    // join — the probe side is the full corpus, the list is tiny.
    measure("c16_blocklist_gate")(
      graft.operators.SampleQueries.cBlocklistGate.fn(spark, dir).count())

    // c14: DSIR scoring under the hot-language mix — the target slice
    // is the 85% en majority, so the ref LM table is near-raw-sized
    // (worst case for the scoring join: AQE shuffle, not broadcast);
    // the template docs concentrate token mass onto ~30 hot tokens but
    // the (doc, token) count aggregate absorbs that map-side.
    measure("c14_dsir_select")(
      graft.operators.SampleQueries.cDsirSelect.fn(spark, dir).count())

    // c15: the two-phase schedule runs c5's bin machinery twice (the
    // template pile-up puts ~2,000 docs on one quality value — the
    // crossing-bin refinement's worst case) plus the anneal anti-join.
    measure("c15_anneal_plan")(
      graft.operators.SampleQueries.cAnnealPlan.fn(spark, dir).count())

    // p6: the leakage audit's gram-keyed self-join under the same
    // boilerplate pile-up — pre-dedup, one variant's ~2,000 docs share
    // every 5-gram, but the audit runs on the RELEASED corpus where
    // they already collapsed to canonicals and the df cap (2..32)
    // bounds what survives to the pair join; this measures that the
    // postings/df pass, not the pair stage, carries the cost
    measure("p6_split_leakage")(
      graft.operators.PipelineQueries.pSplitLeakage.fn(spark, dir).count())

    only.foreach { sel =>
      val unknown = sel -- seen
      require(unknown.isEmpty,
        s"GRAFT_SKEW_ONLY names not in the skew harness: " +
          s"${unknown.toSeq.sorted.mkString(", ")}")
    }
    spark.stop()
  }
}
