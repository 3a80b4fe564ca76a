package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.plans.Stage.StageOps
import graft.sources.Tables

/** Train/test DECONTAMINATION — the benchmark-leakage check every
  * large-scale training pipeline runs before a data release: for each
  * held-out (eval) document, what fraction of its word n-grams also
  * appears in the training corpus, and which training document overlaps
  * it most.
  *
  * Scale design (the standard decontamination shape):
  *  - the eval set is tiny relative to training data, so its exploded
  *    n-gram postings are BROADCAST — the 100 TB training side streams
  *    through a map-side hash join and never shuffles its postings,
  *  - per-pair overlap counts and per-doc containment both come from the
  *    same joined frame via partial (map-side) aggregation keyed by
  *    (eval_doc, train_doc) / eval_doc — shuffle bounded by the number
  *    of OVERLAPPING pairs, never by corpus size,
  *  - eval membership is a deterministic id predicate here; in
  *    production it would be the benchmark table itself.
  */
object ContaminationQueries {

  /** Distinct word n-grams over an already-projected token-array column.
    * Taking the ATTRIBUTE (not `split(text)` inline) matters: expressions
    * referenced inside HOF lambdas are re-evaluated per element, and
    * optimizer rules (InferFiltersFromGenerate + pushdown) substitute
    * inline expressions into extra Filter copies — observed as a 15×
    * single-threaded blowup below the spread Exchange. */
  private[graft] def wordNgrams(tk: Column, n: Int) =
    array_distinct(
      transform(sequence(lit(0), size(tk) - n),
        i => concat_ws(" ", (1 to n).map(j => element_at(tk, i + j)): _*)))

  /** Eval-set predicate: deterministic ~2.7% of documents — ONE
    * definition, reused by x1/x2/x3 and the p1/p2 pipelines (a drifted
    * copy would silently ship eval docs in a release). */
  private[operators] val isEval = col("doc_id") % 37 === 0

  /** ONE n-gram pass over the corpus, materialized (eager local
    * checkpoint): it feeds the eval postings, the train postings AND
    * the per-doc gram counts — previously each re-derived the pass.
    * Materializing BEFORE the explodes also stops the optimizer from
    * substituting the n-gram expression into inferred pre-shuffle
    * Filters (see wordNgrams scaladoc). Single-node trade-off: on a
    * real cluster use reliable checkpoint() for fault tolerance.
    */
  private def ngramFrame(docs: org.apache.spark.sql.DataFrame,
                         n: Int): org.apache.spark.sql.DataFrame =
    QueryDef.spread(docs)
      .select(col("doc_id"), split(col("text"), " ").as("tk"))
      .filter(size(col("tk")) >= n)
      .select(col("doc_id"), wordNgrams(col("tk"), n).as("g"))
      .staged

  private def ngramDocs(s: org.apache.spark.sql.SparkSession, dir: String,
                        n: Int, pred: Column = lit(true)): org.apache.spark.sql.DataFrame =
    ngramFrame(Tables.documents(s, dir).filter(pred), n)

  /** Per-eval-doc 5-gram containment against the training split:
    * n_contaminated = how many of the doc's distinct 5-grams occur
    * anywhere in training data; top_train_doc = the training document
    * sharing the most 5-grams (ties: lowest doc_id). Eval docs with no
    * overlap are kept with containment 0 / top_train_doc -1.
    *
    * @param maxBroadcastEvalPostings the eval side is only BROADCAST
    *   when it is verifiably small (a fixed benchmark table is, a
    *   fractional id-predicate over a 100 TB corpus is NOT — its
    *   postings grow with the corpus and would blow Spark's 8 GB
    *   broadcast cap). The guard bounds the exploded POSTING count —
    *   the actual broadcast payload, not a doc-count proxy (a few
    *   thousand long documents can carry millions of distinct 5-grams).
    *   Above the bound the join falls back to a plain shuffle hash
    *   join, which is scale-safe for both sides. Default ~10M postings
    *   ≈ low hundreds of MB broadcast.
    */
  def decontaminate(s: org.apache.spark.sql.SparkSession, dir: String,
                    maxBroadcastEvalPostings: Long = 10000000L): org.apache.spark.sql.DataFrame = {
      val n = 5
      val docs = ngramDocs(s, dir, n)
      val evalDocs = docs.filter(isEval)
        .select(col("doc_id").as("a"), size(col("g")).cast("long").as("na"), col("g"))
      val evalPost = evalDocs.select(col("a"), col("na"), explode(col("g")).as("gram"))
      val trainPost = docs.filter(!isEval)
        .select(col("doc_id").as("b"), explode(col("g")).as("gram"))
      // eval-side size guard over the materialized frame (cheap sum of
      // array sizes): only broadcast when the POSTING count is bounded
      val nEvalPostings = docs.filter(isEval)
        .agg(coalesce(sum(size(col("g")).cast("long")), lit(0L))).head().getLong(0)
      val evalSide = if (nEvalPostings <= maxBroadcastEvalPostings) broadcast(evalPost) else evalPost
      // training postings stream through a hash join against the eval
      // postings; hits are unique per (a, b, gram). The joined frame
      // feeds TWO aggregations (perDoc, perPair) — materialize it ONCE
      // (eager localCheckpoint) so the dominant explode+join is not
      // executed twice (VERDICT r3 #1). On a multi-executor cluster a
      // reliable checkpoint would be the fault-tolerant seat.
      val hits = trainPost.join(evalSide, "gram").staged
      val perDoc = hits.groupBy("a").agg(countDistinct(col("gram")).as("n_contaminated"))
      val perPair = hits.groupBy("a", "b").agg(count(lit(1)).as("shared"))
      val top = perPair
        .withColumn("rn", row_number().over(
          Window.partitionBy("a").orderBy(col("shared").desc, col("b").asc)))
        .filter(col("rn") === 1)
        .select(col("a"), col("b").as("top_train_doc"), col("shared").as("top_shared"))
      evalDocs.select(col("a"), col("na"))
        .join(perDoc, Seq("a"), "left")
        .join(top, Seq("a"), "left")
        .select(
          col("a").as("doc_id"),
          col("na").as("n_grams"),
          coalesce(col("n_contaminated"), lit(0L)).as("n_contaminated"),
          round(coalesce(col("n_contaminated"), lit(0L)).cast("double") / col("na"), 6)
            .as("containment"),
          coalesce(col("top_train_doc"), lit(-1L)).as("top_train_doc"),
          coalesce(col("top_shared"), lit(0L)).as("top_shared"))
        .orderBy("doc_id")
  }

  val xDecontamination = QueryDef(
    "x1_decontamination",
    (s, dir) => decontaminate(s, dir),
    Some("""
      WITH d AS (
        SELECT doc_id,
               list_distinct(list_transform(range(1, len(tk) - 3),
                 i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2] || ' ' ||
                      tk[i+3] || ' ' || tk[i+4])) AS g
        FROM (SELECT doc_id, string_split(text, ' ') AS tk FROM documents)
        WHERE len(tk) >= 5),
      e AS (SELECT doc_id AS a, CAST(len(g) AS BIGINT) AS na, u.t AS gram
            FROM d, UNNEST(d.g) AS u(t) WHERE doc_id % 37 = 0),
      tr AS (SELECT doc_id AS b, u.t AS gram
             FROM d, UNNEST(d.g) AS u(t) WHERE doc_id % 37 <> 0),
      h AS (SELECT e.a, tr.b, e.gram FROM e JOIN tr USING (gram)),
      pd AS (SELECT a, COUNT(DISTINCT gram) AS n_contaminated FROM h GROUP BY a),
      pp AS (SELECT a, b, COUNT(*) AS shared FROM h GROUP BY a, b),
      tp AS (SELECT a, b, shared,
                    ROW_NUMBER() OVER (PARTITION BY a ORDER BY shared DESC, b ASC) AS rn
             FROM pp),
      ev AS (SELECT doc_id AS a, CAST(len(g) AS BIGINT) AS na FROM d WHERE doc_id % 37 = 0)
      SELECT ev.a AS doc_id, ev.na AS n_grams,
             CAST(COALESCE(pd.n_contaminated, 0) AS BIGINT) AS n_contaminated,
             ROUND(CAST(COALESCE(pd.n_contaminated, 0) AS DOUBLE) / ev.na, 6) AS containment,
             CAST(COALESCE(tp.b, -1) AS BIGINT) AS top_train_doc,
             CAST(COALESCE(tp.shared, 0) AS BIGINT) AS top_shared
      FROM ev LEFT JOIN pd USING (a) LEFT JOIN (SELECT * FROM tp WHERE rn = 1) tp USING (a)
      ORDER BY doc_id"""))

  /** Bloom-pruned corpus scrub (x2): the REVERSE direction of x1 —
    * flag every TRAINING document sharing a 4-gram with the eval set
    * (the docs a release pipeline would drop), with the eval gram set
    * carried to the training scan as a Bloom filter instead of the
    * gram strings themselves.
    *
    * Why this shape at 100 TB: x1 broadcasts exact eval postings,
    * which caps out once the benchmark suite grows (gram strings are
    * ~40-50 bytes each; Spark's broadcast ceiling arrives at tens of
    * millions of grams). The Bloom filter carries ~10 BITS per gram at
    * fpp=1% — 40× smaller for the same membership question — so the
    * full 100 TB training posting stream is pruned MAP-SIDE by a
    * compact sketch (codegen'd [[graft.functions.BloomMightContainExpr]],
    * never false on a true member), and only the survivors (true
    * overlaps + ~fpp of the stream) pay the exact-confirm shuffle join
    * that removes false positives. Output is therefore EXACT — the
    * DuckDB oracle is the plain join with no bloom anywhere.
    */
  /** The scrub tail shared by x2 (inline eval index) and x3 (stored
    * eval index) — bloom prune map-side, exact-confirm join, per-doc
    * overlap stats. ONE definition so the two variants cannot drift. */
  private def scrubAgainst(trainDocs: org.apache.spark.sql.DataFrame,
                           evalGrams: org.apache.spark.sql.DataFrame,
                           bc: org.apache.spark.broadcast.Broadcast[org.apache.spark.util.sketch.BloomFilter])
      : org.apache.spark.sql.DataFrame = {
    val trainPost = trainDocs
      .select(col("doc_id").as("b"), size(col("g")).cast("long").as("nb"),
        explode(col("g")).as("gram"))
    trainPost.filter(graft.functions.BloomMightContainExpr(col("gram"), bc))
      .join(evalGrams, "gram") // exact confirm kills false positives
      .groupBy("b", "nb").agg(countDistinct(col("gram")).as("n_shared"))
      .select(col("b").as("doc_id"), col("nb").as("n_grams"), col("n_shared"),
        round(col("n_shared").cast("double") / col("nb"), 6).as("share_frac"))
      .orderBy("doc_id")
  }

  def bloomScrub(s: org.apache.spark.sql.SparkSession, dir: String,
                 fpp: Double = 0.01): org.apache.spark.sql.DataFrame = {
    val n = 4
    val docs = ngramDocs(s, dir, n)
    // consumed 3× (count, bloom aggregate, confirm join) — materialize once
    val evalGrams = docs.filter(isEval)
      .select(explode(col("g")).as("gram")).distinct().staged
    // size the filter from the true distinct count (cheap over the
    // staged frame): an under-sized bloom silently degrades fpp, an
    // over-sized one wastes broadcast bytes
    val nEval = evalGrams.count()
    val bf = evalGrams.stat.bloomFilter("gram", math.max(nEval, 1L), fpp)
    val bc = s.sparkContext.broadcast(bf)
    scrubAgainst(docs.filter(!isEval), evalGrams, bc)
  }

  /** STORED eval-gram index (x3's seat): a benchmark set is fixed for
    * months while corpus batches arrive daily, so its distinct-gram
    * table AND the serialized Bloom filter are built ONCE per
    * (n, fpp, eval predicate, source snapshot) under IndexStore.ensure
    * — the same build-once / meta-stamp / heartbeat-lock lifecycle as
    * the d8 MinHash and v6 PQ indexes — and every scrub run PROBES
    * them: the eval side of the confirm join is a parquet scan, zero
    * eval-side gram recompute per batch (BloomScrubSpec asserts the
    * plan). Layout: `path/grams` (one string column), `path/bloom`
    * (one binary row, BloomFilter.writeTo bytes). */
  // geometry stamp (same discipline as the d8 index): n and fpp are
  // persisted at init; n is REQUIRED to match on every probe (a probe
  // gramming at the wrong n would silently find nothing), fpp is
  // informational (the confirm join removes false positives at any rate)
  private val EvalGeometryStamp = "_graft_evalgram_geometry"
  private def evalGeometryString(n: Int, fpp: Double): String = s"n=$n|fpp=$fpp"

  /** Deserialize the stored bloom and hand back a broadcast handle —
    * shared by every probe path. */
  private def readStoredBloom(s: org.apache.spark.sql.SparkSession, path: String)
      : org.apache.spark.broadcast.Broadcast[org.apache.spark.util.sketch.BloomFilter] = {
    val bytes = s.read.parquet(s"$path/bloom").head.getAs[Array[Byte]](0)
    s.sparkContext.broadcast(org.apache.spark.util.sketch.BloomFilter
      .readFrom(new java.io.ByteArrayInputStream(bytes)))
  }

  /** Initialize a stored eval-gram index at `path` from an arbitrary
    * eval/benchmark document frame (`doc_id`, `text`): the distinct
    * n-gram parquet table + the serialized Bloom filter over it +
    * the geometry stamp (written LAST — a crashed init leaves no stamp
    * and is never trusted). The explicit-init twin of the dir-keyed
    * auto variant, for maintainer-owned lifecycles (streaming ingest,
    * benchmark refresh jobs). */
  def initStoredEvalIndex(s: org.apache.spark.sql.SparkSession, path: String,
                          evalDocs: org.apache.spark.sql.DataFrame,
                          n: Int = 4, fpp: Double = 0.01): Unit = {
    graft.sources.IndexStore.clearStamp(s, path, EvalGeometryStamp)
    val evalGrams = ngramFrame(evalDocs, n)
      .select(explode(col("g")).as("gram")).distinct().staged
    evalGrams.write.mode("overwrite").parquet(s"$path/grams")
    val nEval = evalGrams.count()
    val bf = evalGrams.stat.bloomFilter("gram", math.max(nEval, 1L), fpp)
    val bos = new java.io.ByteArrayOutputStream()
    bf.writeTo(bos)
    import s.implicits._
    Seq(bos.toByteArray).toDF("bloom").coalesce(1)
      .write.mode("overwrite").parquet(s"$path/bloom")
    graft.sources.IndexStore.writeStamp(s, path, EvalGeometryStamp,
      evalGeometryString(n, fpp))
  }

  /** Probe an arbitrary (`doc_id`, `text`) batch against the stored
    * eval index: gram ONLY the batch, bloom-prune map-side, exact
    * confirm against the stored gram table — x2 semantics restricted
    * to the batch. Requires the init-time geometry. */
  /** Probe-ready handles for a stored eval index: the gram table, the
    * broadcast bloom, and the INDEX's n — carrying n inside the handle
    * makes a resolve/probe n mismatch unrepresentable (a probe gramming
    * at a different n than the stored table would silently find
    * nothing). */
  final case class ResolvedEvalIndex(
      grams: org.apache.spark.sql.DataFrame,
      bloom: org.apache.spark.broadcast.Broadcast[org.apache.spark.util.sketch.BloomFilter],
      n: Int)

  /** Check the stamp and return the probe-ready index handle. Only `n`
    * is REQUIRED to match — a wrong-n probe would gram differently and
    * silently find nothing; fpp affects nothing but the false-positive
    * rate the confirm join removes anyway, so a retuned bloom never
    * strands probes. Exposed so a long-running caller (ScrubIngest)
    * resolves ONCE and reuses the same broadcast across micro-batches
    * instead of re-reading and re-broadcasting the bloom per batch. */
  def resolveStoredEvalIndex(s: org.apache.spark.sql.SparkSession, path: String,
                             n: Int = 4): ResolvedEvalIndex = {
    val stored = graft.sources.IndexStore.readStamp(s, path, EvalGeometryStamp)
    require(stored.isDefined,
      s"no eval-gram geometry stamp at $path — the index was never initialized " +
        "(or a crashed init left partial tables); run initStoredEvalIndex first")
    val storedN = stored.get.split('|').head
    require(storedN == s"n=$n",
      s"stored eval index at $path has geometry ${stored.get}, probe requested " +
        s"n=$n — a mismatched probe would gram at the wrong n and silently " +
        "find no overlaps")
    ResolvedEvalIndex(s.read.parquet(s"$path/grams"), readStoredBloom(s, path), n)
  }

  def probeStoredEvalIndex(s: org.apache.spark.sql.SparkSession, path: String,
                           batch: org.apache.spark.sql.DataFrame,
                           n: Int = 4): org.apache.spark.sql.DataFrame =
    probeResolved(batch, resolveStoredEvalIndex(s, path, n))

  /** Probe with a pre-resolved handle: grams at the handle's own n. */
  def probeResolved(batch: org.apache.spark.sql.DataFrame,
                    idx: ResolvedEvalIndex): org.apache.spark.sql.DataFrame =
    scrubAgainst(ngramFrame(batch, idx.n), idx.grams, idx.bloom)

  private def storedEvalIndex(s: org.apache.spark.sql.SparkSession, dir: String,
                              n: Int, fpp: Double)
      : (org.apache.spark.sql.DataFrame,
         org.apache.spark.broadcast.Broadcast[org.apache.spark.util.sketch.BloomFilter]) = {
    val path = graft.sources.IndexStore.indexPath(dir, s"evalgrams_n$n")
    val meta = s"v2|n=$n|fpp=$fpp|eval=${isEval.toString}|" +
      s"src=${graft.sources.IndexStore.sourceStamp(s, s"$dir/documents.parquet")}"
    graft.sources.IndexStore.ensure(s, path, meta) {
      initStoredEvalIndex(s, path, Tables.documents(s, dir).filter(isEval), n, fpp)
    }
    (s.read.parquet(s"$path/grams"), readStoredBloom(s, path))
  }

  /** x3: identical semantics (and oracle) to x2, but probing the
    * STORED eval index — only the incoming corpus batch is grammed. */
  def bloomScrubStored(s: org.apache.spark.sql.SparkSession, dir: String,
                       fpp: Double = 0.01): org.apache.spark.sql.DataFrame = {
    val n = 4
    val (evalGrams, bc) = storedEvalIndex(s, dir, n, fpp)
    scrubAgainst(ngramDocs(s, dir, n, pred = !isEval), evalGrams, bc)
  }

  /** x2/x3 share ONE oracle: the stored variant must reproduce the
    * inline variant's exact result. */
  private val bloomScrubOracle = """
      WITH d AS (
        SELECT doc_id,
               list_distinct(list_transform(range(1, len(tk) - 2),
                 i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2] || ' ' ||
                      tk[i+3])) AS g
        FROM (SELECT doc_id, string_split(text, ' ') AS tk FROM documents)
        WHERE len(tk) >= 4),
      e AS (SELECT DISTINCT u.t AS gram
            FROM d, UNNEST(d.g) AS u(t) WHERE doc_id % 37 = 0),
      tr AS (SELECT doc_id AS b, CAST(len(g) AS BIGINT) AS nb, u.t AS gram
             FROM d, UNNEST(d.g) AS u(t) WHERE doc_id % 37 <> 0)
      SELECT tr.b AS doc_id, tr.nb AS n_grams,
             CAST(COUNT(DISTINCT tr.gram) AS BIGINT) AS n_shared,
             ROUND(CAST(COUNT(DISTINCT tr.gram) AS DOUBLE) / tr.nb, 6) AS share_frac
      FROM tr JOIN e USING (gram)
      GROUP BY tr.b, tr.nb
      ORDER BY doc_id"""

  val xBloomScrub = QueryDef(
    "x2_bloom_scrub",
    (s, dir) => bloomScrub(s, dir),
    Some(bloomScrubOracle))

  val xBloomScrubStored = QueryDef(
    "x3_bloom_scrub_stored",
    (s, dir) => bloomScrubStored(s, dir),
    Some(bloomScrubOracle))

  // ---- Per-benchmark decontamination clearance (x4, r16) -------------

  /** The release-governance artifact production decontamination ships:
    * x1/x2 treat the eval set as ONE corpus; a real release publishes a
    * PER-BENCHMARK clearance table (which benchmark leaked, how many
    * grams, into which release split) so each benchmark owner can sign
    * off. Benchmarks here are the eval docs keyed by a deterministic id
    * rule (doc_id % 3 → bench_0/1/2 — in production, the benchmark
    * table's own key; the same stand-in discipline as `isEval`).
    *
    * Per (benchmark × release split) row: the benchmark's distinct
    * 5-gram count, how many of those grams the PRE-decontamination
    * candidates carried (`n_caught_grams` — what the decon step
    * caught), how many candidate docs were hit (a doc overlapping two
    * benchmarks appears in both rows — each benchmark's own audit
    * trail), and `n_residual_grams` over the REAL released id set —
    * the decontamination election runs independently inside
    * `PipelineQueries.releasedDocsOf` (the shared canon+quality
    * candidate pass and the gram pass each run ONCE; released ⊆
    * candidates with unchanged texts, so restricting the posting pass
    * to the released ids is gram-identical to re-gramming the release)
    * — zero by construction today, which is exactly what a clearance
    * table certifies, and a regression gate: any future change that
    * weakens the decon election flips `clean` to false in both
    * engines. All benchmark×split cells are emitted (zeros included)
    * so the report shape is stable.
    *
    * Scale shape: bench grams ride the measured broadcast guard (a
    * benchmark suite is small; past the bound the join degrades to
    * shuffle, and the x2/x3 bloom machinery is the 100 TB seat);
    * candidate/release postings stream map-side through the hash join;
    * both aggregates are (benchmark, split)-keyed with map-side
    * partials — shuffle bounded by hit count, never corpus size. */
  private[graft] def benchmarkClearanceOf(
      docs: org.apache.spark.sql.DataFrame,
      maxBroadcastBenchGrams: Long = 10000000L)
      : org.apache.spark.sql.DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    val n = 5
    val bench = QueryDef.spread(docs).filter(isEval)
      .select(concat(lit("bench_"), (col("doc_id") % 3).cast("string"))
          .as("benchmark"),
        split(col("text"), " ").as("tk"))
      .filter(size(col("tk")) >= n)
      .select(col("benchmark"), wordNgrams(col("tk"), n).as("g"))
      .staged
    val benchGrams = bench
      .select(col("benchmark"), explode(col("g")).as("gram"))
      .distinct().staged
    val benchTotals = benchGrams.groupBy("benchmark")
      .agg(count(lit(1)).as("n_bench_grams"))
    def postings(d: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
      QueryDef.spread(d.withColumn("split", SampleQueries.splitCol))
        .select(col("doc_id"), col("split"), split(col("text"), " ").as("tk"))
        .filter(size(col("tk")) >= n)
        .select(col("doc_id"), col("split"), wordNgrams(col("tk"), n).as("g"))
        .staged
        .select(col("doc_id"), col("split"), explode(col("g")).as("gram"))
    val benchSide = QueryDef.guardedBroadcast(benchGrams, maxBroadcastBenchGrams)
    // ONE canon+quality pass feeds both the caught audit and the
    // release recompute (it is staged inside preCandidatesOf); the
    // DECON step still runs independently inside releasedDocsOf — the
    // stage whose weakening the residual column is a gate for
    val pre = PipelineQueries.preCandidatesOf(docs)
    val candPost = postings(pre)
    val caught = candPost
      .join(benchSide, "gram")
      .groupBy("benchmark", "split")
      .agg(countDistinct(col("gram")).as("n_caught_grams"),
        countDistinct(col("doc_id")).as("n_candidate_docs_hit"))
    // residual = the same posting pass restricted to the RELEASED ids
    // (released ⊆ candidates, texts unchanged ⇒ identical grams); the
    // decon step electing those ids still runs independently inside
    // releasedDocsOf — the stage the residual column gates
    val releasedIds = PipelineQueries
      .releasedDocsOf(docs, preShared = Some(pre)).select("doc_id")
    val residual = candPost.join(releasedIds, "doc_id")
      .join(benchSide, "gram")
      .groupBy("benchmark", "split")
      .agg(countDistinct(col("gram")).as("n_residual_grams"))
    val splits = Seq("train", "val", "test").toDF("split")
    benchTotals.crossJoin(broadcast(splits))
      .join(caught, Seq("benchmark", "split"), "left")
      .join(residual, Seq("benchmark", "split"), "left")
      .select(col("benchmark"), col("split"), col("n_bench_grams"),
        coalesce(col("n_caught_grams"), lit(0L)).as("n_caught_grams"),
        coalesce(col("n_candidate_docs_hit"), lit(0L)).as("n_candidate_docs_hit"),
        coalesce(col("n_residual_grams"), lit(0L)).as("n_residual_grams"),
        (coalesce(col("n_residual_grams"), lit(0L)) === 0L).as("clean"))
      .orderBy("benchmark", "split")
  }

  val xBenchmarkClearance = QueryDef(
    "x4_benchmark_clearance",
    (s, dir) => benchmarkClearanceOf(Tables.documents(s, dir)),
    Some("""
      WITH canon AS (
        SELECT doc_id, text, source, n_chars
        FROM (SELECT doc_id, text, source, n_chars,
                     MIN(doc_id) OVER (PARTITION BY text) AS m FROM documents)
        WHERE doc_id = m),
      b AS (
        SELECT doc_id, n_chars, string_split(text, ' ') AS tk
        FROM canon WHERE len(string_split(text, ' ')) >= 2),
      tc AS (
        SELECT doc_id, t AS tok, COUNT(*) AS c
        FROM b, UNNEST(b.tk) AS u(t) GROUP BY doc_id, t),
      tp AS (SELECT doc_id, MAX(c) AS max_c FROM tc GROUP BY doc_id),
      q AS (
        SELECT b.doc_id FROM b JOIN tp USING (doc_id)
        WHERE len(tk) BETWEEN 30 AND 1000
          AND ((n_chars - CAST(len(tk) - 1 AS DOUBLE)) / len(tk)) BETWEEN 3.0 AND 10.0
          AND len(list_filter(tk, t -> t IN ('the','a','and','of','to','in'))) >= 2
          AND CAST(tp.max_c AS DOUBLE) / len(tk) <= 0.2
          AND 1.0 - CAST(len(list_distinct(list_transform(range(1, len(tk)),
                   i -> tk[i] || ' ' || tk[i+1]))) AS DOUBLE) / (len(tk) - 1) <= 0.3),
      pre AS (
        SELECT canon.* FROM canon JOIN q USING (doc_id) WHERE doc_id % 37 <> 0),
      bench AS (
        SELECT DISTINCT 'bench_' || (doc_id % 3) AS benchmark, u.t AS gram
        FROM (SELECT doc_id, list_distinct(list_transform(range(1, len(tk) - 3),
                i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2] || ' ' ||
                     tk[i+3] || ' ' || tk[i+4])) AS g
              FROM (SELECT doc_id, string_split(text, ' ') AS tk FROM documents
                    WHERE doc_id % 37 = 0)
              WHERE len(tk) >= 5) d, UNNEST(d.g) AS u(t)),
      bt AS (SELECT benchmark, COUNT(*) AS n_bench_grams FROM bench GROUP BY benchmark),
      candg AS (
        SELECT doc_id,
               CASE WHEN substring(md5(CAST(doc_id AS VARCHAR)), 3, 2) < 'cc' THEN 'train'
                    WHEN substring(md5(CAST(doc_id AS VARCHAR)), 3, 2) < 'e6' THEN 'val'
                    ELSE 'test' END AS split,
               u.t AS gram
        FROM (SELECT doc_id, list_distinct(list_transform(range(1, len(tk) - 3),
                i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2] || ' ' ||
                     tk[i+3] || ' ' || tk[i+4])) AS g
              FROM (SELECT doc_id, string_split(text, ' ') AS tk FROM pre)
              WHERE len(tk) >= 5) d, UNNEST(d.g) AS u(t)),
      caught AS (
        SELECT be.benchmark, c.split,
               COUNT(DISTINCT c.gram) AS n_caught_grams,
               COUNT(DISTINCT c.doc_id) AS n_candidate_docs_hit
        FROM bench be JOIN candg c USING (gram) GROUP BY 1, 2),
      contaminated AS (
        SELECT DISTINCT c.doc_id FROM candg c
        JOIN (SELECT DISTINCT gram FROM bench) be USING (gram)),
      relg AS (
        SELECT * FROM candg
        WHERE doc_id NOT IN (SELECT doc_id FROM contaminated)),
      resid AS (
        SELECT be.benchmark, r.split,
               COUNT(DISTINCT r.gram) AS n_residual_grams
        FROM bench be JOIN relg r USING (gram) GROUP BY 1, 2),
      grid AS (
        SELECT bt.benchmark, s.split
        FROM bt CROSS JOIN (VALUES ('train'), ('val'), ('test')) s(split))
      SELECT g.benchmark, g.split, bt.n_bench_grams,
             CAST(COALESCE(c.n_caught_grams, 0) AS BIGINT) AS n_caught_grams,
             CAST(COALESCE(c.n_candidate_docs_hit, 0) AS BIGINT) AS n_candidate_docs_hit,
             CAST(COALESCE(r.n_residual_grams, 0) AS BIGINT) AS n_residual_grams,
             COALESCE(r.n_residual_grams, 0) = 0 AS clean
      FROM grid g JOIN bt USING (benchmark)
      LEFT JOIN caught c ON c.benchmark = g.benchmark AND c.split = g.split
      LEFT JOIN resid r ON r.benchmark = g.benchmark AND r.split = g.split
      ORDER BY g.benchmark, g.split"""))

  // ---- Gram-size sensitivity profile (x5, r16) ------------------------

  /** The decontamination-threshold study a release runs before fixing
    * its gram size: published pipelines disagree on n (GPT-3's
    * 13-gram exact-match discipline, the 8-gram middle ground, the
    * 5-gram strictest end x1/p1 use) and the right choice is corpus-
    * dependent — short grams catch paraphrase-adjacent overlap but
    * drop more data, long grams only verbatim leaks. One row per n:
    * the eval set's distinct-gram count, how many of those grams the
    * training split carries, how many training docs would be dropped,
    * and the drop rate. The drop-rate denominator is the TOTAL train
    * doc count — constant across the three rows — so rates compare on
    * a fixed base (a doc too short to carry a 13-gram is still a train
    * doc that would not be dropped; dividing by the ≥n-token
    * population would shrink the base as n grows and make the rows
    * incomparable, defeating the profile's purpose). DOCS-HIT is
    * monotone by construction (an
    * n-gram shared implies all its sub-grams shared, so a doc hit at
    * n is hit at every smaller n) — the spec pins it. The shared-GRAM
    * count is NOT monotone in general: distinct-subword counts of a
    * repetitive string can grow with n (e.g. "a a a a a a a b a…"
    * has more distinct 8-grams than 5-grams), so no law is claimed or
    * pinned for it.
    *
    * Scale shape: one gram scan per n (3 scans total — each the x1
    * shape: explode → guarded-broadcast hash join → count aggregates
    * with map-side partials); per-n stats are single-row aggregates
    * crossed together, never a corpus shuffle. */
  private[graft] val ProfileNs: Seq[Int] = Seq(5, 8, 13)

  private[graft] def decontaminationProfileOf(
      docs: org.apache.spark.sql.DataFrame,
      ns: Seq[Int] = ProfileNs,
      maxBroadcastEvalGrams: Long = 10000000L)
      : org.apache.spark.sql.DataFrame = {
    val spread = QueryDef.spread(docs)
    // ONE constant denominator for every n row: the full train split,
    // not the ≥n-token subset (see scaladoc — rates must share a base).
    // Staged so the three per-n plans share the one-row result instead
    // of each re-running the corpus count scan (r17 advice fix).
    val nTrainDocs = spread.filter(!isEval)
      .select(count(lit(1)).as("n_train_docs")).staged
    ns.map { n =>
      val grams = spread
        .select(col("doc_id"), split(col("text"), " ").as("tk"))
        .filter(size(col("tk")) >= n)
        .select(col("doc_id"), wordNgrams(col("tk"), n).as("g"))
        .staged
      val evalG = grams.filter(isEval)
        .select(explode(col("g")).as("gram")).distinct().staged
      val trainPost = grams.filter(!isEval)
        .select(col("doc_id").as("b"), explode(col("g")).as("gram"))
      val hits = trainPost
        .join(QueryDef.guardedBroadcast(evalG, maxBroadcastEvalGrams), "gram")
      evalG.agg(count(lit(1)).as("n_eval_grams"))
        .crossJoin(broadcast(hits.agg(
          countDistinct(col("gram")).as("n_shared_grams"),
          countDistinct(col("b")).as("n_train_docs_hit"))))
        .crossJoin(broadcast(nTrainDocs))
        .select(lit(n.toLong).as("n"), col("n_eval_grams"),
          col("n_shared_grams"), col("n_train_docs_hit"),
          // an empty train split has no defined rate —
          // NULL, not NaN (0/0 in Spark is NaN; DuckDB's is NULL)
          when(col("n_train_docs") === 0L, lit(null).cast("double"))
            .otherwise(round(col("n_train_docs_hit").cast("double") /
              col("n_train_docs"), 6)).as("drop_rate"))
    }.reduce(_ unionByName _).orderBy("n")
  }

  val xDecontaminationProfile = QueryDef(
    "x5_decontamination_profile",
    (s, dir) => decontaminationProfileOf(Tables.documents(s, dir)),
    Some("""
      WITH tk AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
      prof AS (SELECT n FROM (VALUES (5), (8), (13)) v(n)),
      g AS (
        SELECT prof.n, tk.doc_id,
               list_distinct(list_transform(range(1, len(tk) - prof.n + 2),
                 i -> array_to_string(tk[i:i+prof.n-1], ' '))) AS g
        FROM tk CROSS JOIN prof WHERE len(tk) >= prof.n),
      eg AS (SELECT DISTINCT n, u.t AS gram
             FROM g, UNNEST(g.g) AS u(t) WHERE doc_id % 37 = 0),
      tr AS (SELECT n, doc_id AS b, u.t AS gram
             FROM g, UNNEST(g.g) AS u(t) WHERE doc_id % 37 <> 0),
      h AS (SELECT tr.n, tr.b, tr.gram
            FROM tr JOIN eg ON eg.n = tr.n AND eg.gram = tr.gram),
      egc AS (SELECT n, COUNT(*) AS n_eval_grams FROM eg GROUP BY n),
      hc AS (SELECT n, COUNT(DISTINCT gram) AS n_shared_grams,
                    COUNT(DISTINCT b) AS n_train_docs_hit
             FROM h GROUP BY n),
      -- ONE constant denominator: the full train split, not the
      -- >= n-token subset (rates must compare on a fixed base)
      td AS (SELECT COUNT(*) AS n_train_docs
             FROM tk WHERE doc_id % 37 <> 0)
      -- drive from the n grid: a degenerate population (no eval or no
      -- train doc of >= n tokens) still emits its row with zeros,
      -- matching the Spark side's always-one-row aggregates
      SELECT CAST(prof.n AS BIGINT) AS n,
             CAST(COALESCE(egc.n_eval_grams, 0) AS BIGINT) AS n_eval_grams,
             CAST(COALESCE(hc.n_shared_grams, 0) AS BIGINT) AS n_shared_grams,
             CAST(COALESCE(hc.n_train_docs_hit, 0) AS BIGINT) AS n_train_docs_hit,
             CASE WHEN td.n_train_docs = 0 THEN NULL
                  ELSE ROUND(CAST(COALESCE(hc.n_train_docs_hit, 0) AS DOUBLE)
                         / td.n_train_docs, 6) END AS drop_rate
      FROM prof CROSS JOIN td
           LEFT JOIN egc ON egc.n = prof.n
           LEFT JOIN hc ON hc.n = prof.n
      ORDER BY prof.n"""))

  // ---- x4f: clearance audit over the PUBLISHED release (r17) ---------

  /** STORED per-benchmark gram index: a benchmark suite is fixed for
    * months while a release is audited many times, so the (benchmark,
    * gram) table is built ONCE per (n, source snapshot) under the
    * IndexStore lifecycle — the x3 discipline with the benchmark id
    * attached — and every clearance audit PROBES it. The build is the
    * x4 bench-side pass verbatim (same id rule, same n), so the stored
    * grams can never drift from the in-plan clearance's. */
  private def storedBenchIndex(s: org.apache.spark.sql.SparkSession,
                               dir: String, n: Int)
      : org.apache.spark.sql.DataFrame = {
    val path = graft.sources.IndexStore.indexPath(dir, s"benchgrams_n$n")
    val meta = s"v1|n=$n|bench=docid%3|eval=${isEval.toString}|" +
      s"src=${graft.sources.IndexStore.sourceStamp(s, s"$dir/documents.parquet")}"
    graft.sources.IndexStore.ensure(s, path, meta) {
      QueryDef.spread(Tables.documents(s, dir)).filter(isEval)
        .select(concat(lit("bench_"), (col("doc_id") % 3).cast("string"))
            .as("benchmark"),
          split(col("text"), " ").as("tk"))
        .filter(size(col("tk")) >= n)
        .select(col("benchmark"), explode(wordNgrams(col("tk"), n)).as("gram"))
        .distinct()
        .write.mode("overwrite").parquet(s"$path/grams")
    }
    s.read.parquet(s"$path/grams")
  }

  /** The clearance table a release CONSUMER can recompute: per
    * (benchmark × split), the stored benchmark's distinct-gram count,
    * the residual grams the PUBLISHED release still carries, and the
    * clean bit — x4's certificate columns, minus the candidate-side
    * audit trail (the pre-decontamination candidate set is pipeline
    * state, not part of the published artifact). Inputs are ONLY the
    * release files and the stored benchmark index (PlanAuditSpec pins
    * zero raw-document scan); the DuckDB oracle recomputes the full
    * logical release, so a green row also proves the artifact matches
    * the logical definition through the filesystem round-trip.
    *
    * Scale shape: release postings stream map-side through the
    * guarded-broadcast gram join (the x1 shape); the residual
    * aggregate is (benchmark, split)-keyed with map-side partials —
    * shuffle bounded by hit count; the grid is |benchmarks|×3 rows. */
  private[graft] def clearanceFromRelease(
      s: org.apache.spark.sql.SparkSession, dir: String,
      maxBroadcastBenchGrams: Long = 10000000L)
      : org.apache.spark.sql.DataFrame = {
    import s.implicits._
    val n = 5
    val benchGrams = storedBenchIndex(s, dir, n)
    val benchTotals = benchGrams.groupBy("benchmark")
      .agg(count(lit(1)).as("n_bench_grams"))
    val relPost = PipelineQueries.releaseFrame(s, dir)
      .select(col("split"), split(col("text"), " ").as("tk"))
      .filter(size(col("tk")) >= n)
      .select(col("split"), wordNgrams(col("tk"), n).as("g"))
      .staged
      .select(col("split"), explode(col("g")).as("gram"))
    val residual = relPost
      .join(QueryDef.guardedBroadcast(benchGrams, maxBroadcastBenchGrams), "gram")
      .groupBy("benchmark", "split")
      .agg(countDistinct(col("gram")).as("n_residual_grams"))
    val splits = Seq("train", "val", "test").toDF("split")
    benchTotals.crossJoin(broadcast(splits))
      .join(residual, Seq("benchmark", "split"), "left")
      .select(col("benchmark"), col("split"), col("n_bench_grams"),
        coalesce(col("n_residual_grams"), lit(0L)).as("n_residual_grams"),
        (coalesce(col("n_residual_grams"), lit(0L)) === 0L).as("clean"))
      .orderBy("benchmark", "split")
  }

  val xClearanceFromRelease = QueryDef(
    "x4f_clearance_from_release",
    (s, dir) => clearanceFromRelease(s, dir),
    Some("""
      WITH canon AS (
        SELECT doc_id, text, source, n_chars
        FROM (SELECT doc_id, text, source, n_chars,
                     MIN(doc_id) OVER (PARTITION BY text) AS m FROM documents)
        WHERE doc_id = m),
      b AS (
        SELECT doc_id, n_chars, string_split(text, ' ') AS tk
        FROM canon WHERE len(string_split(text, ' ')) >= 2),
      tc AS (
        SELECT doc_id, t AS tok, COUNT(*) AS c
        FROM b, UNNEST(b.tk) AS u(t) GROUP BY doc_id, t),
      tp AS (SELECT doc_id, MAX(c) AS max_c FROM tc GROUP BY doc_id),
      q AS (
        SELECT b.doc_id FROM b JOIN tp USING (doc_id)
        WHERE len(tk) BETWEEN 30 AND 1000
          AND ((n_chars - CAST(len(tk) - 1 AS DOUBLE)) / len(tk)) BETWEEN 3.0 AND 10.0
          AND len(list_filter(tk, t -> t IN ('the','a','and','of','to','in'))) >= 2
          AND CAST(tp.max_c AS DOUBLE) / len(tk) <= 0.2
          AND 1.0 - CAST(len(list_distinct(list_transform(range(1, len(tk)),
                   i -> tk[i] || ' ' || tk[i+1]))) AS DOUBLE) / (len(tk) - 1) <= 0.3),
      pre AS (
        SELECT canon.* FROM canon JOIN q USING (doc_id) WHERE doc_id % 37 <> 0),
      bench AS (
        SELECT DISTINCT 'bench_' || (doc_id % 3) AS benchmark, u.t AS gram
        FROM (SELECT doc_id, list_distinct(list_transform(range(1, len(tk) - 3),
                i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2] || ' ' ||
                     tk[i+3] || ' ' || tk[i+4])) AS g
              FROM (SELECT doc_id, string_split(text, ' ') AS tk FROM documents
                    WHERE doc_id % 37 = 0)
              WHERE len(tk) >= 5) d, UNNEST(d.g) AS u(t)),
      bt AS (SELECT benchmark, COUNT(*) AS n_bench_grams FROM bench GROUP BY benchmark),
      candg AS (
        SELECT doc_id,
               CASE WHEN substring(md5(CAST(doc_id AS VARCHAR)), 3, 2) < 'cc' THEN 'train'
                    WHEN substring(md5(CAST(doc_id AS VARCHAR)), 3, 2) < 'e6' THEN 'val'
                    ELSE 'test' END AS split,
               u.t AS gram
        FROM (SELECT doc_id, list_distinct(list_transform(range(1, len(tk) - 3),
                i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2] || ' ' ||
                     tk[i+3] || ' ' || tk[i+4])) AS g
              FROM (SELECT doc_id, string_split(text, ' ') AS tk FROM pre)
              WHERE len(tk) >= 5) d, UNNEST(d.g) AS u(t)),
      contaminated AS (
        SELECT DISTINCT c.doc_id FROM candg c
        JOIN (SELECT DISTINCT gram FROM bench) be USING (gram)),
      relg AS (
        SELECT * FROM candg
        WHERE doc_id NOT IN (SELECT doc_id FROM contaminated)),
      resid AS (
        SELECT be.benchmark, r.split,
               COUNT(DISTINCT r.gram) AS n_residual_grams
        FROM bench be JOIN relg r USING (gram) GROUP BY 1, 2),
      grid AS (
        SELECT bt.benchmark, s.split
        FROM bt CROSS JOIN (VALUES ('train'), ('val'), ('test')) s(split))
      SELECT g.benchmark, g.split, bt.n_bench_grams,
             CAST(COALESCE(r.n_residual_grams, 0) AS BIGINT) AS n_residual_grams,
             COALESCE(r.n_residual_grams, 0) = 0 AS clean
      FROM grid g JOIN bt USING (benchmark)
      LEFT JOIN resid r ON r.benchmark = g.benchmark AND r.split = g.split
      ORDER BY g.benchmark, g.split"""))

  // ---- x6: semantic (embedding-level) decontamination (r17) ----------

  /** Embedding-level decontamination — the layer n-gram matching cannot
    * reach: a PARAPHRASED benchmark item shares no 5-gram with its
    * source yet sits next to it in embedding space (the OpenAI/Llama
    * eval-contamination reports' second check, and SemDeDup's
    * cross-set cousin). Per EVAL vector: its nearest TRAIN vector by
    * cosine (embeddings are unit-normalized, so dot = cosine), the
    * similarity, and the contaminated flag at `tau` — one row per eval
    * vector, zeros/low rows included, so the table is the same
    * always-complete certificate shape as x4.
    *
    * Exactness: this is the brute-force certificate (the v1 seat) —
    * the DuckDB oracle recomputes every dot product with the same
    * ascending-index IEEE order as the native kernel, and the argmax
    * ties break to the smallest train id via a composite max_by key on
    * the UNROUNDED sim in both engines. The flag compares the ROUNDED
    * similarity (cross-engine exact); `+ 0.0` on the oracle's rounded
    * column per the signed-zero audit (a max-cosine CAN in principle
    * round to −0.0).
    *
    * Scale shape: the eval side is benchmark-sized by convention and
    * BROADCAST (the v1/x1 seat); the train corpus streams map-side
    * through the broadcast nested-loop join and collapses to |eval|
    * rows via a map-side-partial max_by — the corpus never shuffles.
    * When the eval suite outgrows broadcast, this brute-force
    * certificate is not the tool: route the stored IVFADC index (v7)
    * exactly as x2/x3's bloom replaces x1's exact broadcast. */
  private[graft] def semanticDecontaminationOf(
      emb: org.apache.spark.sql.DataFrame, tau: Double = 0.36)
      : org.apache.spark.sql.DataFrame = {
    val eval = emb.filter(col("vec_id") % 37 === 0)
      .select(col("vec_id").as("eval_id"), col("embedding").as("qe"))
    val train = emb.filter(col("vec_id") % 37 =!= 0)
      .select(col("vec_id").as("nb"), col("embedding").as("ne"))
    train.join(broadcast(eval))
      .select(col("eval_id"), col("nb"),
        graft.functions.VectorExpressions.fdot(col("qe"), col("ne")).as("sim"))
      // argmax by (sim desc, nb asc): max_by on (sim, -nb) — map-side
      // combinable, unlike a window over the full cross product
      .groupBy("eval_id")
      .agg(max_by(struct(col("sim"), col("nb")),
        struct(col("sim"), (-col("nb")).as("negnb"))).as("m"))
      .select(col("eval_id"), col("m.nb").as("nearest_train"),
        round(col("m.sim"), 6).as("cosine"),
        (round(col("m.sim"), 6) >= tau).as("contaminated"))
      .orderBy("eval_id")
  }

  val xSemanticDecontamination = QueryDef(
    "x6_semantic_decontamination",
    (s, dir) => semanticDecontaminationOf(Tables.embeddings(s, dir)),
    Some("""
      WITH e AS (SELECT vec_id AS eval_id, embedding AS qe
                 FROM embeddings WHERE vec_id % 37 = 0),
      t AS (SELECT vec_id AS nb, embedding AS ne
            FROM embeddings WHERE vec_id % 37 <> 0),
      s AS (SELECT e.eval_id, t.nb,
                   list_reduce(
                     list_prepend(CAST(0.0 AS DOUBLE),
                       list_transform(range(1, len(e.qe) + 1),
                         i -> CAST(e.qe[i] AS DOUBLE) * CAST(t.ne[i] AS DOUBLE))),
                     (acc, v) -> acc + v) AS sim
            FROM e, t),
      r AS (SELECT eval_id, nb, sim,
                   ROW_NUMBER() OVER (PARTITION BY eval_id
                     ORDER BY sim DESC, nb ASC) AS rk
            FROM s)
      SELECT eval_id, nb AS nearest_train,
             ROUND(sim, 6) + 0.0 AS cosine,
             ROUND(sim, 6) + 0.0 >= 0.36 AS contaminated
      FROM r WHERE rk = 1 ORDER BY eval_id"""))

  /** x6b — x6's 100 TB seat made EXECUTABLE: the same per-eval nearest-
    * train certificate probed through the STORED IVFADC index (v7's
    * engine) instead of the brute-force broadcast — driver-side coarse
    * routing, statically partition-pruned ADC scan over 4-byte codes
    * with the eval set EXCLUDED from the candidate side at the scan
    * (`candFilter`, so held-out codes never reach the shortlist), exact
    * re-rank of the bounded shortlist, top-1 taken. Sub-linear in the
    * corpus: only nprobe of the coarse lists are read, as codes.
    *
    * Approximate by design (the v6/v7 adjudication): no DuckDB oracle —
    * the result is pinned (deterministic routing/shortlist/re-rank) and
    * SemanticDecontaminationSpec gates its agreement with x6's exact
    * certificate (coverage, neighbor/flag agreement floors) at sf0.01.
    * An eval vector whose routed lists hold no train codes would drop
    * from the table (over-fetch makes this vanishing; the spec pins
    * full coverage on the driver corpus). */
  private[graft] def semanticDecontaminationAnn(
      s: org.apache.spark.sql.SparkSession, dir: String, tau: Double = 0.36,
      nprobe: Int = 5, shortlistN: Int = 128)
      : org.apache.spark.sql.DataFrame = {
    val emb = Tables.embeddings(s, dir)
    val eval = emb.filter(col("vec_id") % 37 === 0)
      .select(col("vec_id").as("q"), col("embedding").as("qe"))
    val train = emb.filter(col("vec_id") % 37 =!= 0)
    VectorQueries.ivfAdcProbe(s, VectorQueries.storedPqIndex(s, dir), train,
        eval, nprobe, shortlistN, candFilter = col("nb") % 37 =!= 0)
      .filter(col("rank") === 1)
      .select(col("q").as("eval_id"), col("nb").as("nearest_train"),
        col("cosine"), (col("cosine") >= tau).as("contaminated"))
      .orderBy("eval_id")
  }

  val xSemanticDecontaminationAnn = QueryDef(
    "x6b_semantic_decon_ann",
    (s, dir) => semanticDecontaminationAnn(s, dir))

  // ---- x5f: gram-size profile over the PUBLISHED release (r18) -------

  /** The x5 gram-size decontamination profile computed from the
    * PUBLISHED release — the dataset card's seat: per n ∈ {5, 8, 13},
    * how many distinct eval grams exist, how many the SHIPPED ARTIFACT
    * still carries, how many release docs carry one, and the hit rate
    * on the constant released-doc base (x5's fixed-denominator rule).
    * A release consumer asks this right after the n=5 clearance: the
    * released corpus passed the 5-gram gate by construction, so the
    * n=5 row is the zero-residual certificate and the 8/13 rows show
    * the (expected-zero, monotone) tail. Inputs are ONLY the release
    * files and the stored per-n benchmark gram indexes (x4f's
    * lifecycle, built once per benchmark snapshot) — PlanAuditSpec pins
    * zero raw-document scan in the steady state; the oracle restates
    * the full logical release, so a green row again proves
    * artifact ≡ logical definition.
    *
    * Scale shape: per n, one release gram scan through the measured-
    * broadcast eval gram join (the x1 shape) + single-row aggregates —
    * 3 scans total, never a corpus shuffle. */
  private[graft] def decontaminationProfileFromRelease(
      s: org.apache.spark.sql.SparkSession, dir: String,
      ns: Seq[Int] = ProfileNs,
      maxBroadcastEvalGrams: Long = 10000000L)
      : org.apache.spark.sql.DataFrame = {
    val rel = PipelineQueries.releaseFrame(s, dir)
    val nRelDocs = rel.select(count(lit(1)).as("n_release_docs")).staged
    ns.map { n =>
      val grams = rel
        .select(col("doc_id"), split(col("text"), " ").as("tk"))
        .filter(size(col("tk")) >= n)
        .select(col("doc_id"), wordNgrams(col("tk"), n).as("g"))
        .staged
      val evalG = storedBenchIndex(s, dir, n)
        .select(col("gram")).distinct().staged
      val relPost = grams.select(col("doc_id").as("b"), explode(col("g")).as("gram"))
      val hits = relPost
        .join(QueryDef.guardedBroadcast(evalG, maxBroadcastEvalGrams), "gram")
      evalG.agg(count(lit(1)).as("n_eval_grams"))
        .crossJoin(broadcast(hits.agg(
          countDistinct(col("gram")).as("n_shared_grams"),
          countDistinct(col("b")).as("n_release_docs_hit"))))
        .crossJoin(broadcast(nRelDocs))
        .select(lit(n.toLong).as("n"), col("n_eval_grams"),
          col("n_shared_grams"), col("n_release_docs_hit"),
          when(col("n_release_docs") === 0L, lit(null).cast("double"))
            .otherwise(round(col("n_release_docs_hit").cast("double") /
              col("n_release_docs"), 6)).as("hit_rate"))
    }.reduce(_ unionByName _).orderBy("n")
  }

  val xDecontaminationProfileFromRelease = QueryDef(
    "x5f_decon_profile_from_release",
    (s, dir) => decontaminationProfileFromRelease(s, dir),
    Some(s"""
      WITH ${PipelineQueries.releaseSqlCtes},
      rtk AS (SELECT doc_id, string_split(text, ' ') AS tk FROM clean),
      prof AS (SELECT n FROM (VALUES (5), (8), (13)) v(n)),
      rg AS (
        SELECT prof.n, rtk.doc_id,
               list_distinct(list_transform(range(1, len(tk) - prof.n + 2),
                 i -> array_to_string(tk[i:i+prof.n-1], ' '))) AS g
        FROM rtk CROSS JOIN prof WHERE len(tk) >= prof.n),
      etk AS (SELECT doc_id, string_split(text, ' ') AS tk
              FROM documents WHERE doc_id % 37 = 0),
      egl AS (
        SELECT prof.n,
               list_distinct(list_transform(range(1, len(tk) - prof.n + 2),
                 i -> array_to_string(tk[i:i+prof.n-1], ' '))) AS g
        FROM etk CROSS JOIN prof WHERE len(tk) >= prof.n),
      eg AS (SELECT DISTINCT n, u.t AS gram FROM egl, UNNEST(egl.g) AS u(t)),
      rp AS (SELECT n, doc_id AS b, u.t AS gram FROM rg, UNNEST(rg.g) AS u(t)),
      h AS (SELECT rp.n, rp.b, rp.gram
            FROM rp JOIN eg ON eg.n = rp.n AND eg.gram = rp.gram),
      egc AS (SELECT n, COUNT(*) AS n_eval_grams FROM eg GROUP BY n),
      hc AS (SELECT n, COUNT(DISTINCT gram) AS n_shared_grams,
                    COUNT(DISTINCT b) AS n_release_docs_hit
             FROM h GROUP BY n),
      rd AS (SELECT COUNT(*) AS n_release_docs FROM clean)
      SELECT CAST(prof.n AS BIGINT) AS n,
             CAST(COALESCE(egc.n_eval_grams, 0) AS BIGINT) AS n_eval_grams,
             CAST(COALESCE(hc.n_shared_grams, 0) AS BIGINT) AS n_shared_grams,
             CAST(COALESCE(hc.n_release_docs_hit, 0) AS BIGINT) AS n_release_docs_hit,
             CASE WHEN rd.n_release_docs = 0 THEN NULL
                  ELSE ROUND(CAST(COALESCE(hc.n_release_docs_hit, 0) AS DOUBLE)
                         / rd.n_release_docs, 6) END AS hit_rate
      FROM prof CROSS JOIN rd
           LEFT JOIN egc ON egc.n = prof.n
           LEFT JOIN hc ON hc.n = prof.n
      ORDER BY prof.n"""))

  val all: Seq[QueryDef] = Seq(xDecontamination, xBloomScrub, xBloomScrubStored,
    xBenchmarkClearance, xDecontaminationProfile, xClearanceFromRelease,
    xSemanticDecontamination, xSemanticDecontaminationAnn,
    xDecontaminationProfileFromRelease)
}
