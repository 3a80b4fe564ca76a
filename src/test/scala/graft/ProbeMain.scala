package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.stats.Battery

/** Dev probe harness (forked JVM — sbt console's layered classloader
  * can't load Spark encoders). Drives estimators on degenerate panels.
  */
object ProbeMain {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("PROBE_CPUS", "4")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val p = Battery.examplePanel(spark)

    def tryRun(label: String)(f: => stats.EstimateResult): Unit =
      try {
        val r = f
        println(s"$label => beta=${r.betaR} se=${r.seBetaR} warn=${r.tiltWarning}")
      } catch {
        case e: Throwable =>
          println(s"$label => ${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(140)}")
      }

    tryRun("ET_ALL_INTERNAL") { Battery.run("ET-WCLS", p.filter(col("is_internal"))) }
    tryRun("WCLS_TINY_40ROWS") { Battery.run("WCLS-Internal", p.filter(col("user_id") <= 2)) }
    tryRun("DR_SMALL") { Battery.run("DR-WCLS",
      p.filter(col("user_id") <= 50 || (col("user_id") > 400 && col("user_id") <= 450))) }

    if (args.contains("edge")) {
      try {
        val pr = graft.harness.SimulationRunner.perRepResults(
          spark, Seq(graft.harness.SimulationRunner.Cell(20, 20)), nReps = 1,
          methods = Seq("NOT-A-METHOD"))
        println("EDGE_UNKNOWN_METHOD_ROWS=" + pr.count())
      } catch { case e: Throwable => println("EDGE=" + e.getClass.getSimpleName + ": " + String.valueOf(e.getMessage).take(120)) }
      try {
        val m = graft.harness.SimulationRunner.metrics(
          graft.harness.SimulationRunner.perRepResults(
            spark, Seq(graft.harness.SimulationRunner.Cell(20, 20)), nReps = 1,
            methods = Seq("WCLS-Internal")))
        m.select("method", "coef", "empirical_se", "empirical_rel_efficiency").show(4, false)
      } catch { case e: Throwable => println("EDGE=" + e.getClass.getSimpleName + ": " + String.valueOf(e.getMessage).take(120)) }
    }

    if (args.contains("stream")) {
      import org.apache.spark.sql.types._
      import org.apache.spark.sql.streaming.Trigger
      // end-to-end: real parquet file source -> streaming engine -> memory sink
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      spark.conf.set("spark.sql.session.timeZone", "UTC")
      // file stream sources need a directory
      val srcDir = java.nio.file.Files.createTempDirectory("graft_stream_src")
      java.nio.file.Files.copy(
        java.nio.file.Paths.get("/root/testdata/sf0.001/events.parquet"),
        srcDir.resolve("events.parquet"))
      // the ts encoding varies by driver round (TIMESTAMP(NANOS) read as
      // LONG under nanosAsLong, or TIMESTAMP(MICROS)/NTZ) — take the
      // schema from a batch read so this probe follows either, the same
      // dual-path Tables.events normalizes
      val schema = spark.read.parquet(srcDir.toString).schema
      val tsCol = schema("ts").dataType match {
        // integer div: double division loses sub-µs exactness at
        // epoch-nanos magnitude (2^63-scale longs round to 256ns steps)
        case LongType => timestamp_micros(expr("ts div 1000"))
        case _        => col("ts").cast(TimestampType)
      }
      val src = spark.readStream.schema(schema)
        .parquet(srcDir.toString)
        .select(tsCol.as("ts"), col("event_type").as("eventType"), col("value"))
      val q = graft.streaming.EventStreams.windowedCounts(src)
        .writeStream.format("memory").queryName("file_stream_counts")
        .outputMode("update").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      val n = spark.table("file_stream_counts")
        .agg(org.apache.spark.sql.functions.sum("n_events")).head().getLong(0)
      println(s"STREAM_FILE_SOURCE_EVENTS=$n (expect 1000)")

      // probe: late event beyond the 30-min watermark is dropped
      implicit val sqlCtx = spark.sqlContext
      import spark.implicits._
      import graft.streaming.EventStreams.Event
      val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Event]
      val q2 = graft.streaming.EventStreams.windowedCounts(mem.toDF())
        .writeStream.format("memory").queryName("late_probe")
        .outputMode("update").start()
      def T(min: Int) = new java.sql.Timestamp(1700000000000L + min * 60000L)
      mem.addData(Event(1, T(0), 1, "click", 1.0), Event(2, T(120), 1, "click", 1.0))
      q2.processAllAvailable()
      mem.addData(Event(3, T(1), 1, "click", 100.0)) // 119 min late > 30 min watermark
      q2.processAllAvailable()
      q2.stop()
      println("STREAM_LATE_PROBE_TABLE:")
      spark.table("late_probe").orderBy("window_start").show(10, false)
    }

    if (args.contains("explain")) {
      val dir = "/root/testdata/sf0.01"
      for (q <- Seq("q2_filter_revenue", "q1_pricing_summary", "q3_cust_per_region",
                    "v1_cosine_topk", "q21_asof_join")) {
        println(s"===== $q =====")
        println(graft.SparkEntry.queries(q)(spark, dir).queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode))
      }
    }

    if (args.contains("cg")) {
      // codegen_probe: does the generated java contain our primitive loop?
      val emb = graft.sources.Tables.embeddings(spark, "/root/testdata/sf0.001")
      val df = emb.select(graft.functions.VectorExpressions.fdot(col("embedding"), col("embedding")).as("d"))
      val gen = org.apache.spark.sql.execution.debug.codegenString(df.queryExecution.executedPlan)
      println("CG_HAS_LOOP=" + gen.contains(".getFloat("))
      println("CG_WHOLESTAGE=" + gen.contains("Found 1 WholeStageCodegen subtrees"))
      println("CG_VALUE=" + df.agg(min("d"), max("d")).head())
    }

    if (args.contains("sh")) {
      // simhash_probe
      import graft.functions.VectorExpressions.simhash64
      val r = spark.range(1).select(
        simhash64(array(lit("a"), lit("b"), lit("a"))).as("h"),
        simhash64(array().cast("array<string>")).as("empty"))
      println("SH_VALUES=" + r.head())
      try { spark.range(1).select(simhash64(array(lit(1), lit(2)))).head() }
      catch { case e: Throwable => println("SH_TYPEERR=" + String.valueOf(e.getMessage).take(100)) }
    }

    if (args.contains("rfx")) {
      // rfx_probe: review-fix error paths
      try { Battery.run("WCLS-Internal", p.filter(lit(false))) }
      catch { case e: Throwable => println("RFX_EMPTY=" + e.getClass.getSimpleName + ": " + String.valueOf(e.getMessage).take(80)) }
      import graft.functions.VectorExpressions.fdot
      val r = spark.range(1).select(
        fdot(array(lit(1.0f), lit(2.0f)), array(lit(3.0f))).as("mismatch"),
        fdot(array(lit(1.0f), lit(null).cast("float")), array(lit(1.0f), lit(2.0f))).as("nullel"))
      println("RFX_DOT=" + r.head())
    }

    if (args.contains("bigbin")) {
      // Attribute "Broadcasting large task binary" warnings to queries
      // (r15 verdict #4): the DAGScheduler warning carries no query
      // context, so bracket each query with stderr markers and let the
      // caller count warnings between them. WARN level so the scheduler
      // warning is emitted; sf via GRAFT_BIGBIN_SF_DIR (default sf0.1,
      // where the driver bench tail showed 1-2.1 MiB binaries).
      spark.sparkContext.setLogLevel(
        sys.env.getOrElse("GRAFT_BIGBIN_LEVEL", "WARN"))
      val sfDir = sys.env.getOrElse("GRAFT_BIGBIN_SF_DIR", "/root/testdata/sf0.1")
      val names = sys.env.get("GRAFT_BIGBIN_QUERIES")
        .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
        .getOrElse(graft.SparkEntry.queries.keys.toSeq.sorted)
      // a typo'd selector must FAIL up front, not produce a clean empty
      // marker bracket (the SPARK_GRAFT_BENCH_ONLY discipline)
      val unknown = names.filterNot(graft.SparkEntry.queries.keySet)
      require(unknown.isEmpty,
        s"GRAFT_BIGBIN_QUERIES names not in the catalog: ${unknown.mkString(", ")}")
      for (n <- names) {
        Console.err.println(s"BIGBIN_BEGIN $n"); Console.err.flush()
        try graft.SparkEntry.queries(n)(spark, sfDir).count()
        catch { case e: Throwable =>
          Console.err.println(s"BIGBIN_ERR $n ${e.getClass.getSimpleName}") }
        Console.err.println(s"BIGBIN_END $n"); Console.err.flush()
      }
    }

    if (args.contains("bigbinx1")) {
      // bisect x1's pipeline: which sub-frame's stages carry the
      // MiB-scale task binaries (markers as in bigbin)
      spark.sparkContext.setLogLevel("WARN")
      val dir = "/root/testdata/sf0.1"
      import graft.operators.{ContaminationQueries => CQ, QueryDef}
      val docs = QueryDef.spread(graft.sources.Tables.documents(spark, dir))
        .select(col("doc_id"), split(col("text"), " ").as("tk"))
        .filter(size(col("tk")) >= 5)
        .select(col("doc_id"), CQ.wordNgrams(col("tk"), 5).as("g"))
      def mark(n: String)(f: => Long): Unit = {
        Console.err.println(s"BIGBIN_BEGIN $n"); Console.err.flush()
        val r = f
        Console.err.println(s"BIGBIN_END $n rows=$r"); Console.err.flush()
      }
      import graft.plans.Stage.StageOps
      mark("ngram_pass")(docs.count())
      val staged = docs.staged
      val evalDocs = staged.filter(col("doc_id") % 37 === 0)
        .select(col("doc_id").as("a"), size(col("g")).cast("long").as("na"), col("g"))
      val evalPost = evalDocs.select(col("a"), col("na"), explode(col("g")).as("gram"))
      val trainPost = staged.filter(col("doc_id") % 37 =!= 0)
        .select(col("doc_id").as("b"), explode(col("g")).as("gram"))
      mark("eval_post")(evalPost.count())
      mark("train_post")(trainPost.count())
      val hits = trainPost.join(broadcast(evalPost), "gram")
      mark("hits_join")(hits.count())
      val hitsS = hits.staged
      mark("per_doc")(hitsS.groupBy("a").agg(countDistinct(col("gram"))).count())
      mark("per_pair")(hitsS.groupBy("a", "b").agg(count(lit(1))).count())
      // the final assembly: perDoc + windowed top-pair + two left joins
      val perDoc = hitsS.groupBy("a").agg(countDistinct(col("gram")).as("n_contaminated"))
      val perPair = hitsS.groupBy("a", "b").agg(count(lit(1)).as("shared"))
      val top = perPair
        .withColumn("rn", org.apache.spark.sql.functions.row_number().over(
          org.apache.spark.sql.expressions.Window.partitionBy("a")
            .orderBy(col("shared").desc, col("b").asc)))
        .filter(col("rn") === 1)
        .select(col("a"), col("b").as("top_train_doc"), col("shared").as("top_shared"))
      mark("assembly_nojoin_perdoc")(perDoc.count())
      mark("assembly_top")(top.count())
      mark("assembly_join1")(
        evalDocs.select(col("a"), col("na")).join(perDoc, Seq("a"), "left").count())
      mark("assembly_join2")(
        evalDocs.select(col("a"), col("na")).join(perDoc, Seq("a"), "left")
          .join(top, Seq("a"), "left").count())
      mark("assembly_full")(
        evalDocs.select(col("a"), col("na"))
          .join(perDoc, Seq("a"), "left").join(top, Seq("a"), "left")
          .select(col("a").as("doc_id"), col("na").as("n_grams"),
            coalesce(col("n_contaminated"), lit(0L)).as("n_contaminated"),
            round(coalesce(col("n_contaminated"), lit(0L)).cast("double") / col("na"), 6)
              .as("containment"),
            coalesce(col("top_train_doc"), lit(-1L)).as("top_train_doc"),
            coalesce(col("top_shared"), lit(0L)).as("top_shared"))
          .orderBy("doc_id").count())
      // candidate fix: stage the two tiny aggregate frames so the final
      // join stage's closure is three LogicalRDDs, not the full tree
      val perDocS = perDoc.staged
      val topS = top.staged
      mark("assembly_staged_fix")(
        evalDocs.select(col("a"), col("na"))
          .join(perDocS, Seq("a"), "left").join(topS, Seq("a"), "left")
          .orderBy("a").count())
      mark("assembly_staged_noorder")(
        evalDocs.select(col("a"), col("na"))
          .join(perDocS, Seq("a"), "left").join(topS, Seq("a"), "left").count())
      mark("assembly_join1_order")(
        evalDocs.select(col("a"), col("na"))
          .join(perDoc, Seq("a"), "left").orderBy("a").count())
      mark("evaldocs_order")(evalDocs.select(col("a"), col("na")).orderBy("a").count())
      mark("full_x1")(graft.SparkEntry.queries("x1_decontamination")(spark, dir).count())
    }

    if (args.contains("annparity")) {
      // v2/v5 after the ids-only-shuffle rewrite vs the pre-change dumps
      for (q <- Seq("v2_lsh_ann", "v5_ivf_ann", "v3_embed_neardup",
                    "d2_minhash_lsh_pairs", "d5_dedup_clusters")) {
        val neu = graft.SparkEntry.queries(q)(spark, "/root/testdata/sf0.01")
        val old = spark.read.parquet(s"/tmp/verify_out/$q")
        val cols = old.columns.sorted.map(col(_))
        val diff = neu.select(cols: _*).exceptAll(old.select(cols: _*)).count() +
          old.select(cols: _*).exceptAll(neu.select(cols: _*)).count()
        println(s"ANNPARITY $q diff=$diff (expect 0) rows=${neu.count()}")
      }
    }

    if (args.contains("mh")) {
      // MinHashK parity vs the 16-scan HOF form, on real corpus shingles
      val docs = graft.sources.Tables.documents(spark, "/root/testdata/sf0.01")
        .filter(size(split(col("text"), " ")) >= 3)
        .select(col("doc_id"),
          array_distinct(transform(sequence(lit(0), size(split(col("text"), " ")) - 3),
            i => concat_ws(" ",
              element_at(split(col("text"), " "), i + 1),
              element_at(split(col("text"), " "), i + 2),
              element_at(split(col("text"), " "), i + 3)))).as("sh"))
      val hof = array((0 until 16).map(i =>
        array_min(transform(col("sh"), x => xxhash64(lit(i), x)))): _*)
      val diff = docs.select(col("doc_id"),
          graft.functions.VectorExpressions.minhashK(col("sh"), 16).as("a"), hof.as("b"))
        .filter(not(col("a") <=> col("b"))).count()
      println(s"MH_PARITY_DIFF=$diff (expect 0)")
      for (_ <- 1 to 2) {
        val t0 = System.nanoTime()
        val n = graft.SparkEntry.queries("d2_minhash_lsh_pairs")(spark, "/root/testdata/sf0.1").count()
        println(f"MH_D2 rows=$n wall=${(System.nanoTime() - t0) / 1e9}%.1f s")
      }
    }

    if (args.contains("r4")) {
      // round-4 baseline/after timing for the bench-dominant queries
      val sf = sys.env.getOrElse("PROBE_SF", "/root/testdata/sf0.1")
      println("DOC_PARTS=" + graft.sources.Tables.documents(spark, sf).rdd.getNumPartitions)
      for (q <- Seq("x1_decontamination", "d2_minhash_lsh_pairs",
                    "d5_dedup_clusters", "d6_cluster_components", "v5_ivf_ann")) {
        val t0 = System.nanoTime()
        val n = graft.SparkEntry.queries(q)(spark, sf).count()
        println(f"R4 $q rows=$n wall=${(System.nanoTime() - t0) / 1e9}%.1f s")
      }
    }

    if (args.contains("x1b")) {
      // x1 phase breakdown at sf0.1
      val sf = sys.env.getOrElse("PROBE_SF", "/root/testdata/sf0.1")
      val toks = split(col("text"), " ")
      def wordNgrams(n: Int) = array_distinct(
        transform(sequence(lit(0), size(toks) - n),
          i => concat_ws(" ", (1 to n).map(j => element_at(toks, i + j)): _*)))
      val isEval = col("doc_id") % 37 === 0
      def t[A](label: String)(f: => A): A = {
        val t0 = System.nanoTime(); val r = f
        println(f"X1B $label wall=${(System.nanoTime() - t0) / 1e9}%.1f s"); r
      }
      val docs = graft.operators.QueryDef.spread(graft.sources.Tables.documents(spark, sf))
        .filter(size(toks) >= 5).select(col("doc_id"), wordNgrams(5).as("g"))
      val evalPost = docs.filter(isEval)
        .select(col("doc_id").as("a"), explode(col("g")).as("gram"))
      val trainPost = docs.filter(!isEval)
        .select(col("doc_id").as("b"), explode(col("g")).as("gram"))
      t("trainPost_count") { println("  n=" + trainPost.count()) }
      t("evalPost_count") { println("  n=" + evalPost.count()) }
      val hits = t("hits_checkpoint") {
        trainPost.join(broadcast(evalPost), "gram").localCheckpoint(true) }
      t("hits_count") { println("  n=" + hits.count()) }
      t("perDoc") { hits.groupBy("a").agg(countDistinct(col("gram"))).count() }
      t("perPair") { hits.groupBy("a", "b").agg(count(lit(1))).count() }
    }

    if (args.contains("x1c")) {
      // does projecting tokens into a column first kill the re-split cost?
      val sf = sys.env.getOrElse("PROBE_SF", "/root/testdata/sf0.1")
      def t[A](label: String)(f: => A): A = {
        val t0 = System.nanoTime(); val r = f
        println(f"X1C $label wall=${(System.nanoTime() - t0) / 1e9}%.1f s"); r
      }
      val tk = col("tk")
      val docs2 = graft.operators.QueryDef.spread(graft.sources.Tables.documents(spark, sf))
        .select(col("doc_id"), split(col("text"), " ").as("tk"))
        .filter(size(tk) >= 5)
        .select(col("doc_id"), array_distinct(
          transform(sequence(lit(0), size(tk) - 5),
            i => concat_ws(" ", (1 to 5).map(j => element_at(tk, i + j)): _*))).as("g"))
      val trainPost2 = docs2.filter(!(col("doc_id") % 37 === 0))
        .select(col("doc_id").as("b"), explode(col("g")).as("gram"))
      t("trainPost_tkcol") { println("  n=" + trainPost2.count()) }
      t("trainPost_tkcol_again") { println("  n=" + trainPost2.count()) }
    }

    if (args.contains("x1d")) {
      // bisect the n-gram construction cost
      val sf = sys.env.getOrElse("PROBE_SF", "/root/testdata/sf0.1")
      def t[A](label: String)(f: => A): A = {
        val t0 = System.nanoTime(); val r = f
        println(f"X1D $label wall=${(System.nanoTime() - t0) / 1e9}%.1f s"); r
      }
      val base = graft.operators.QueryDef.spread(graft.sources.Tables.documents(spark, sf))
        .select(col("doc_id"), split(col("text"), " ").as("tk"))
        .filter(size(col("tk")) >= 5)
      val tk = col("tk")
      t("scan_tokens") { println("  n=" + base.select(explode(tk)).count()) }
      t("transform_identity") { println("  n=" + base.select(explode(
        transform(sequence(lit(0), size(tk) - 5), i => element_at(tk, i + 1)))).count()) }
      t("transform_concat5") { println("  n=" + base.select(explode(
        transform(sequence(lit(0), size(tk) - 5),
          i => concat_ws(" ", (1 to 5).map(j => element_at(tk, i + j)): _*)))).count()) }
      t("plus_distinct") { println("  n=" + base.select(explode(array_distinct(
        transform(sequence(lit(0), size(tk) - 5),
          i => concat_ws(" ", (1 to 5).map(j => element_at(tk, i + j)): _*))))).count()) }
      t("no_spread_concat5") { println("  n=" + graft.sources.Tables.documents(spark, sf)
        .select(col("doc_id"), split(col("text"), " ").as("tk"))
        .filter(size(col("tk")) >= 5)
        .select(explode(transform(sequence(lit(0), size(tk) - 5),
          i => concat_ws(" ", (1 to 5).map(j => element_at(tk, i + j)): _*)))).count()) }
    }

    if (args.contains("x1e")) {
      val sf = sys.env.getOrElse("PROBE_SF", "/root/testdata/sf0.1")
      def t[A](label: String)(f: => A): A = {
        val t0 = System.nanoTime(); val r = f
        println(f"X1E $label wall=${(System.nanoTime() - t0) / 1e9}%.1f s"); r
      }
      val tk = col("tk")
      def ngrams = array_distinct(transform(sequence(lit(0), size(tk) - 5),
        i => concat_ws(" ", (1 to 5).map(j => element_at(tk, i + j)): _*)))
      val base = graft.operators.QueryDef.spread(graft.sources.Tables.documents(spark, sf))
        .select(col("doc_id"), split(col("text"), " ").as("tk"))
        .filter(size(col("tk")) >= 5)
      t("warm") { base.select(explode(ngrams)).count() }
      t("a_with_docid") { base.select(col("doc_id"), explode(ngrams).as("gram")).count() }
      t("b_two_step") { base.select(col("doc_id"), ngrams.as("g"))
        .select(col("doc_id"), explode(col("g")).as("gram")).count() }
      t("c_filtered") { base.filter(!(col("doc_id") % 37 === 0))
        .select(col("doc_id").as("b"), explode(ngrams).as("gram")).count() }
      t("d_x1c_exact") {
        val docs2 = base.select(col("doc_id"), ngrams.as("g"))
        docs2.filter(!(col("doc_id") % 37 === 0))
          .select(col("doc_id").as("b"), explode(col("g")).as("gram")).count() }
      println("=== PLAN b_two_step ===")
      println(base.select(col("doc_id"), ngrams.as("g"))
        .select(col("doc_id"), explode(col("g")).as("gram"))
        .queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode))
      println("=== PLAN a_inline ===")
      println(base.select(col("doc_id"), explode(ngrams).as("gram"))
        .queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode))
    }

    if (args.contains("v7recall")) {
      // recall@3 of the ANN ladder vs the exact v1 baseline on the
      // LshRecallSpec fixture (sf0.001) — tune pqCoarseK/nprobe here
      val d = "/root/testdata/sf0.001"
      val exact = graft.operators.VectorQueries.vCosineTopK.fn(spark, d)
        .filter(col("rank") <= 3).select("q", "nb")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      for (n <- Seq("v2_lsh_ann", "v5_ivf_ann", "v6_pq_ann", "v7_ivfadc_ann")) {
        val approx = graft.SparkEntry.queries(n)(spark, d)
          .select("q", "nb").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
        println(s"RECALL $n = ${(exact & approx).size.toDouble / exact.size}")
      }
    }

    if (args.contains("pins")) {
      // print fixture hashes for every no_oracle query at sf0.01, run
      // twice to confirm determinism — the memoized pairs frame is
      // cleared between runs so d2/d5 genuinely RE-EXECUTE the pipeline
      // (hashing the same materialized frame twice proves nothing).
      // Session config must match FixturePinSpec's (local[4], shuffle 4):
      // v5's k-means|| init is partition-layout sensitive.
      require(cpus == "4",
        s"pins must run with PROBE_CPUS=4 to match FixturePinSpec's session (got $cpus)")
      // derived, not hardcoded: a new no_oracle query shows up here
      // automatically (FixturePinSpec's set-equality test is the gate
      // that forces its hash to be committed)
      val names = (graft.SparkEntry.queries.keySet --
        graft.SparkEntry.oracleSql.keySet).toSeq.sorted
      for (n <- names) {
        graft.operators.DedupQueries.clearPairsMemo()
        val h1 = CanonicalHash(graft.SparkEntry.queries(n)(spark, "/root/testdata/sf0.01"))
        graft.operators.DedupQueries.clearPairsMemo()
        val h2 = CanonicalHash(graft.SparkEntry.queries(n)(spark, "/root/testdata/sf0.01"))
        println(s"""PIN "$n" -> "$h1", ${if (h1 == h2) "STABLE" else "UNSTABLE " + h2}""")
      }
    }

    if (args.contains("oraclefix")) {
      // Regenerate the committed per-rep fixture CSVs behind the
      // h1/h3/s4 DuckDB oracles (oracles/*.csv). The fixtures hold the
      // DETERMINISTIC per-replication intermediates at full double
      // precision (Double.toString — shortest exact roundtrip); the
      // oracle SQL recomputes the metric aggregation / pretty-table
      // formatting from them in DuckDB, so the driver's compare checks
      // BOTH that the live pipeline still reproduces the committed
      // per-rep values AND that the aggregation math is cross-engine
      // exact. Rerun after an INTENTIONAL estimator/harness change.
      def writeCsv(path: String, header: String, rows: Seq[String]): Unit = {
        val p = java.nio.file.Paths.get(path)
        java.nio.file.Files.createDirectories(p.getParent)
        java.nio.file.Files.writeString(p, (header +: rows).mkString("", "\n", "\n"))
        println(s"WROTE $path (${rows.size} rows)")
      }
      def perRepCsv(nReps: Int, methods: Seq[String]): Seq[String] =
        graft.harness.SimulationRunner.perRepResults(
            spark, Seq(graft.harness.SimulationRunner.Cell(30, 30)),
            nReps = nReps, methods = methods)
          .collect().map { r =>
            Seq(r.getInt(0), r.getInt(1), r.getInt(2), r.getString(3),
              r.getString(4), r.getDouble(5), r.getDouble(6),
              r.getBoolean(7), r.getBoolean(8)).mkString(",")
          }.toSeq
      val hdr = "n_internal,n_external,replication,method,coef,estimate,se,covered,tilt_warning"
      writeCsv("/root/repo/oracles/h1_per_rep.csv", hdr,
        perRepCsv(3, Seq("WCLS-Internal", "WCLS-Pooled", "P-WCLS-Pooled")))
      writeCsv("/root/repo/oracles/h3_per_rep.csv", hdr,
        perRepCsv(2, Seq("WCLS-Internal", "WCLS-Pooled")))
      // h2: the same per-rep shape under each perturbed DGP, prefixed
      // with the scenario's display label (must mirror h2's label map)
      val h2labels = Map(
        "x2_0" -> "no_x2_effect", "x2_2" -> "positive_x2", "x12sq" -> "quadratic")
      val h2rows = graft.harness.SensitivityGrid.scenarios.flatMap { sc =>
        val name = h2labels.getOrElse(sc.label, sc.label)
        graft.harness.SimulationRunner.perRepResults(
            spark, Seq(graft.harness.SimulationRunner.Cell(30, 30)),
            nReps = 2, methods = Seq("WCLS-Internal"),
            cfg0 = graft.gen.PanelGenerator.Config(
              x2Coef = sc.x2Coef, x21sqCoef = sc.x21sqCoef))
          .collect().map { r =>
            (name +: Seq(r.getInt(0), r.getInt(1), r.getInt(2), r.getString(3),
              r.getString(4), r.getDouble(5), r.getDouble(6),
              r.getBoolean(7), r.getBoolean(8))).mkString(",")
          }.toSeq
      }
      writeCsv("/root/repo/oracles/h2_per_rep.csv", "scenario," + hdr, h2rows)
      val s4 = graft.SparkEntry.queries("s4_estimator_battery")(spark, "")
        .collect().map { r =>
          Seq(r.getString(0), r.getString(1), r.getDouble(2), r.getDouble(3),
            r.getBoolean(4)).mkString(",")
        }.toSeq
      writeCsv("/root/repo/oracles/s4_battery.csv",
        "method,coef,estimate,se,tilt_warning", s4)
      // t16: the fitted classifier coefficients at full double precision
      // (Double.toString — shortest exact roundtrip), keyed by corpus
      // doc count so one fixture serves every committed sf. The oracle
      // restates the closed-form scoring from these; a live-fit drift
      // moves every score and fails the hash gate.
      // keyed by (n_docs, sum n_chars): n_docs alone collides (sf0.001
      // and sf0.01 both hold 500 docs); the char total disambiguates and
      // both are one cheap aggregate in either engine
      val t16rows = Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01",
          "/root/testdata/sf0.1").map { d =>
        val key = graft.sources.Tables.documents(spark, d)
          .agg(org.apache.spark.sql.functions.count(
              org.apache.spark.sql.functions.lit(1)),
            org.apache.spark.sql.functions.sum(
              org.apache.spark.sql.functions.col("n_chars"))).head()
        val fit = graft.stats.Glm.logistic(
          graft.operators.ClassifierQueries.featureFrame(spark, d),
          graft.operators.ClassifierQueries.design,
          org.apache.spark.sql.functions.col("y"))
        require(fit.converged, s"t16 oraclefix: IRLS did not converge at $d")
        (Seq(key.getLong(0).toString, key.getLong(1).toString) ++
          fit.coef.toArray.map(_.toString).toSeq).mkString(",")
      }
      writeCsv("/root/repo/oracles/t16_coefs.csv",
        "n_docs,sum_chars,b0,b1,b2,b3", t16rows)
    }

    if (args.contains("latex")) {
      // regenerate the committed S4 LaTeX fixture from the committed
      // acceptance metrics (LatexReportSpec asserts byte equality)
      val metrics = spark.read.option("header", "true").option("inferSchema", "true")
        .csv("results/acceptance/metrics_csv")
      val table = graft.harness.LatexReport.simulationTable(
        metrics, sampleSize = 400, nReplications = 400,
        methods = Seq("WCLS-Internal", "WCLS-Pooled", "P-WCLS-Internal",
          "P-WCLS-Pooled", "ET-WCLS", "DR-WCLS", "PET-WCLS"))
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get("results/acceptance/latex_table_400.tex"), table)
      println("LATEX_WRITTEN bytes=" + table.length)
      // sensitivity tables (sensitivity.R:228-287): one per committed
      // scenario, regenerated from its committed metrics CSV
      for (sc <- graft.harness.SensitivityGrid.scenarios) {
        val m = spark.read.option("header", "true").option("inferSchema", "true")
          .csv(s"results/sensitivity/${sc.label}/metrics_csv")
        val t = graft.harness.LatexReport.sensitivityTable(
          m, sc.label, nReplications = 400,
          methods = Seq("WCLS-Internal", "WCLS-Pooled", "P-WCLS-Internal",
            "P-WCLS-Pooled", "ET-WCLS", "DR-WCLS", "PET-WCLS"))
        java.nio.file.Files.writeString(
          java.nio.file.Paths.get(s"results/sensitivity/${sc.label}/latex_table_400.tex"), t)
        println(s"LATEX_WRITTEN ${sc.label} bytes=" + t.length)
      }
    }

    if (args.contains("figures")) {
      // render the committed SVG figures from the committed figure
      // frames / per-rep checkpoints (SvgFiguresSpec asserts byte
      // equality — same discipline as the LaTeX fixtures above)
      val se = spark.read.option("header", "true")
        .schema("panel STRING, coef STRING, method STRING, x INT, " +
          "empirical_se DOUBLE, n_reps_used BIGINT")
        .csv("results/acceptance/fig_se_curve")
      val bp = graft.harness.FigureFrames.boxplotFrame(
        spark.read.parquet("results/acceptance/cell_400_400"))
      java.nio.file.Files.createDirectories(
        java.nio.file.Paths.get("results/figures"))
      for ((name, svg) <- Seq(
          "sample_size_se.svg" -> graft.harness.SvgFigures.seCurveSvg(se),
          "estimates_400_400.svg" -> graft.harness.SvgFigures.boxplotSvg(bp))) {
        java.nio.file.Files.writeString(
          java.nio.file.Paths.get(s"results/figures/$name"), svg)
        println(s"FIGURE_WRITTEN $name bytes=" + svg.length)
      }
    }

    if (args.contains("htime")) {
      for (q <- Seq("h1_simulation_metrics", "h2_sensitivity_scenarios", "h3_pretty_table",
                    "g1_panel_summary")) {
        val t0 = System.nanoTime()
        val n = graft.SparkEntry.queries(q)(spark, "/root/testdata/sf0.01").count()
        println(f"HTIME $q rows=$n wall=${(System.nanoTime() - t0) / 1e9}%.1f s")
      }
    }

    if (args.contains("genparity")) {
      // panelReps must be bit-identical to the per-rep union it replaced
      import graft.gen.PanelGenerator
      val cfg = PanelGenerator.Config(nInternal = 7, nExternal = 5, tMax = 4)
      val base = 9100000L
      val old = (1 to 3).map { rep =>
        PanelGenerator.panel(spark, base + rep, cfg)
          .withColumn("replication", lit(rep))
      }.reduce(_ unionByName _)
      val neu = PanelGenerator.panelReps(spark, base, cfg, 3)
      val cols = old.columns.sorted.map(col(_))
      val diff = old.select(cols: _*).exceptAll(neu.select(cols: _*)).count() +
        neu.select(cols: _*).exceptAll(old.select(cols: _*)).count()
      println(s"GENPARITY_DIFF=$diff (expect 0), n=${neu.count()} (expect ${old.count()})")
    }

    if (args.contains("sim")) {
      val t0 = System.nanoTime()
      val perRep = graft.harness.SimulationRunner.perRepResults(
        spark, Seq(graft.harness.SimulationRunner.Cell(100, 100)), nReps = 20,
        methods = Seq("WCLS-Internal", "WCLS-Pooled", "PET-WCLS"))
      graft.harness.SimulationRunner.metrics(perRep)
        .select("coef", "method", "avg_estimate", "empirical_se", "coverage", "empirical_rel_efficiency")
        .show(20, false)
      println(f"SIM_WALL=${(System.nanoTime() - t0) / 1e9}%.1f s")
    }
    spark.stop()
  }
}
