package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Loaders for the driver-provided test tables (TESTDATA.md) and the
  * reference's committed golden panel CSV (FIXTURES.md §A1).
  *
  * All reads go through `spark.read.parquet`/`.csv` so Catalyst gets
  * column pruning + predicate pushdown into the scan for free.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(spark: SparkSession, dir: String): DataFrame     = load(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame     = load(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame   = load(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame   = load(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame       = load(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame     = load(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame   = load(spark, dir, "lineitem")
  /** `events.ts` normalized to the engine contract: nanos-since-epoch
    * LONG, exact integer semantics matching DuckDB's `epoch_ns(ts)`.
    * The driver has shipped two encodings across rounds: parquet
    * TIMESTAMP(NANOS) — which Spark's micros TimestampType refuses, so
    * the legacy conf reads it as a nanos LONG directly — and parquet
    * TIMESTAMP(MICROS) with isAdjustedToUTC=false, which Spark reads as
    * TIMESTAMP_NTZ. Both are UTC instants; the NTZ→epoch cast is
    * session-timezone-sensitive, so pin the zone to UTC (the oracle's
    * `epoch_ns` on a naive timestamp assumes UTC too).
    */
  def events(spark: SparkSession, dir: String): DataFrame =
    Tables.synchronized {
      // nanosAsLong stays set for the session's lifetime ON PURPOSE: the
      // parquet scan re-reads it at execution-plan time, so a
      // set/restore window would break a NANOS-encoded scan executed
      // after the restore. Its only effect is TIMESTAMP(NANOS) columns
      // reading as LONG, and events.ts is the engine's only such column.
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val df = load(spark, dir, "events")
      df.schema("ts").dataType match {
        case LongType => df
        case _ =>
          // the NTZ→TIMESTAMP cast resolves its zone AT ANALYSIS
          // (Dataset creation), so pinning UTC only around the
          // withColumn is safe — and it must not leak: tz-sensitive
          // expressions elsewhere would silently depend on whether
          // events() had been called. The Tables lock serializes the
          // save/set/restore window against concurrent callers.
          withConf(spark, "spark.sql.session.timeZone", "UTC") {
            df.withColumn("ts",
              unix_micros(col("ts").cast(TimestampType)) * lit(1000L))
          }
      }
    }

  /** Set a session conf, run `body` (whose Dataset creation captures the
    * conf at analysis), restore the previous value. Callers hold the
    * Tables lock so concurrent save/restore windows cannot interleave. */
  private def withConf[A](spark: SparkSession, key: String, value: String)(
      body: => A): A = {
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, value)
    try body
    finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None    => spark.conf.unset(key)
    }
  }
  def documents(spark: SparkSession, dir: String): DataFrame  = load(spark, dir, "documents")

  /** Ingest a JSONL corpus (plain or gzipped — Spark decompresses by
    * extension) into the `documents` contract. Real corpora arrive as
    * JSON-lines, so this is the boundary where they enter the engine:
    * the schema is EXPLICIT (an inference pass would both re-scan the
    * data and type-drift on sparse fields), and a missing `n_chars` —
    * raw corpora rarely carry it — is derived as length(text), the
    * same definition the driver tables use. Missing lang/source read
    * as null: the loader normalizes encoding, it does not invent
    * metadata. FAILFAST mode: a malformed line (truncated upload,
    * garbled shard) must abort the read, not decode to a silent
    * all-null row that flows null doc_ids into dedup joins and the
    * split hash — at an ingestion boundary, loud beats lossy.
    * FAILFAST only catches SYNTACTICALLY malformed lines; a well-formed
    * line that omits `doc_id`/`text` (or carries an explicit null) would
    * still decode to a null key and flow into exactly those joins — so
    * the key contract is enforced per row with `raise_error` (a pure
    * map-side guard: zero cost on valid corpora, loud with the offending
    * line's context on the first violation, never a driver-side count
    * pass). Honest scope: the guard rides the guarded COLUMN, so it
    * fires when that column is consumed — which covers every flow the
    * guard exists for (a null doc_id/text can only do damage where it
    * is read), but a projection that never touches `text` will not
    * police it. Scale shape: a plain line-splittable scan (gzip files
    * are one split each — shard the corpus into many files, which the
    * release writer's layout already does). */
  def documentsJsonl(spark: SparkSession, path: String): DataFrame = {
    def required(c: String): Column =
      when(col(c).isNull, raise_error(concat(
        lit(s"documentsJsonl: null/missing required key '$c' (doc_id="),
        coalesce(col("doc_id").cast("string"), lit("null")), lit(")"))))
        .otherwise(col(c))
    spark.read
      .schema("doc_id LONG, text STRING, lang STRING, source STRING, n_chars LONG")
      .option("mode", "FAILFAST")
      .json(path)
      .withColumn("doc_id", required("doc_id"))
      .withColumn("text", required("text"))
      .withColumn("n_chars",
        coalesce(col("n_chars"), length(col("text")).cast("long")))
  }

  /** `embeddings.embedding` normalized to array<float> — the native
    * kernels (DotProduct codegen, PQ encode) are FloatType-typed, and a
    * driver regeneration that flips the arrow list to double (the same
    * encoding-drift class that hit events.ts in r11) must not crash the
    * entire v-family. A float-typed source stays a zero-cost pass-through
    * (no cast in the plan). Scope honestly stated: this is
    * CRASH-avoidance, not oracle parity — under a double-typed source
    * the DuckDB oracles still compute in full doubles, so v1/v4 would
    * surface as visible hash mismatches in the correctness artifact
    * (diagnosable data-drift evidence) instead of an AnalysisException
    * that takes down every v query and pin. */
  def embeddings(spark: SparkSession, dir: String): DataFrame = {
    val df = load(spark, dir, "embeddings")
    df.schema("embedding").dataType match {
      case ArrayType(FloatType, _) => df
      case _ => df.withColumn("embedding", col("embedding").cast("array<float>"))
    }
  }

  /** Schema of the reference's committed `example_dat.csv`
    * (reference: generate_data.R:77-93, example-analysis.R:34).
    * Column 1 is R's unnamed 1-based row index; time order is encoded by
    * row position (row k = user ((k-1) mod n)+1 at t = floor((k-1)/n)+1,
    * SURVEY.md §1.1) — we surface it as an explicit `t` column.
    */
  private val exampleDatSchema = StructType(Seq(
    StructField("_rowidx", LongType),
    StructField("is_internal", BooleanType),
    StructField("is_external", BooleanType),
    StructField("x1", DoubleType),
    StructField("x2", DoubleType),
    StructField("x3", DoubleType),
    StructField("p_h", DoubleType),
    StructField("p_h_a", DoubleType),
    StructField("a_logical", BooleanType),
    StructField("a", DoubleType),
    StructField("epsilon", DoubleType),
    StructField("treatment_effect", DoubleType),
    StructField("y", DoubleType),
    StructField("user_id", LongType),
    StructField("ones", DoubleType)))

  /** Read a reference-format panel CSV, deriving the explicit `t` column
    * from the row index (nUsers = number of distinct users; the R layout
    * is column-major over an nUsers x tMax matrix).
    */
  def panelCsv(spark: SparkSession, path: String, nUsers: Int): DataFrame =
    spark.read
      .option("header", "true")
      .schema(exampleDatSchema)
      .csv(path)
      .withColumn("t", (((col("_rowidx") - 1L) / nUsers) + 1L).cast(IntegerType))
}
