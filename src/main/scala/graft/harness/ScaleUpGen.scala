package graft.harness

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** sf1-scale benchmark data, self-generated (the driver's synthetic
  * tables stop at sf0.1): tile every sf0.1 table `factor`× with
  * disjoint key ranges, so the result has sf1's row counts, the same
  * schemas, the same per-tile distributions, and VALID foreign keys
  * (each tile's orders reference that tile's customers, etc.). Tile 0
  * is the sf0.1 data verbatim; tile t offsets every key family by
  * t × (max key + 1), measured from the source.
  *
  * Two deliberate de-duplications keep the scaled corpus WORKLOAD-
  * HONEST rather than 10 exact copies (which would turn every dedup /
  * ANN query into a pathological 10-way duplicate mine that no organic
  * sf1 corpus exhibits):
  *  - documents: tile t > 0 appends a per-tile marker token to the
  *    text (one ~5-char token on 40–300-token docs — negligible to
  *    quality stats; n_chars is recomputed so the text/n_chars
  *    contract holds);
  *  - embeddings: tile t rotates the 64-dim vector left by t
  *    positions — norm-preserving, distribution-preserving, and
  *    distinct from every other tile.
  * Dimension tables (region, nation) keep TPC-H semantics: they do
  * not scale.
  *
  * Usage: `runMain graft.harness.ScaleUpGen` — GRAFT_SCALEUP_FACTOR
  * (default 10), GRAFT_SCALEUP_SRC (default /root/testdata/sf0.1),
  * GRAFT_SCALEUP_OUT (default /tmp/graft_sf1). Output partition count
  * scales with the factor so downstream scans see sf1-shaped splits,
  * not one giant file.
  */
object ScaleUpGen {

  def main(args: Array[String]): Unit = {
    val factor = sys.env.getOrElse("GRAFT_SCALEUP_FACTOR", "10").toInt
    val src = sys.env.getOrElse("GRAFT_SCALEUP_SRC", "/root/testdata/sf0.1")
    val out = sys.env.getOrElse("GRAFT_SCALEUP_OUT", "/tmp/graft_sf1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def read(t: String): DataFrame = spark.read.parquet(s"$src/$t.parquet")

    def maxOf(df: DataFrame, c: String): Long =
      df.agg(max(col(c))).head.getLong(0) + 1L

    // cross-tile expansion: one row per (source row, tile)
    def tiled(df: DataFrame): DataFrame =
      df.withColumn("__t",
        explode(array((0 until factor).map(i => lit(i.toLong)): _*)))

    def off(c: String, span: Long) = col(c) + col("__t") * span

    def write(name: String, df: DataFrame, parts: Int): Unit = {
      df.drop("__t").repartition(parts)
        .write.mode("overwrite").parquet(s"$out/$name.parquet")
      println(s"[scaleup] $name done")
    }

    val (customer, supplier, part, orders, lineitem) =
      (read("customer"), read("supplier"), read("part"), read("orders"),
        read("lineitem"))
    val cSpan = maxOf(customer, "c_custkey")
    val sSpan = maxOf(supplier, "s_suppkey")
    val pSpan = maxOf(part, "p_partkey")
    val oSpan = maxOf(orders, "o_orderkey")

    // dimension tables: copied, not scaled (TPC-H semantics)
    read("region").write.mode("overwrite").parquet(s"$out/region.parquet")
    read("nation").write.mode("overwrite").parquet(s"$out/nation.parquet")

    write("customer", tiled(customer)
      .withColumn("c_custkey", off("c_custkey", cSpan)), factor)
    write("supplier", tiled(supplier)
      .withColumn("s_suppkey", off("s_suppkey", sSpan)), factor)
    write("part", tiled(part)
      .withColumn("p_partkey", off("p_partkey", pSpan)), factor)
    write("orders", tiled(orders)
      .withColumn("o_orderkey", off("o_orderkey", oSpan))
      .withColumn("o_custkey", off("o_custkey", cSpan)), factor * 2)
    write("lineitem", tiled(lineitem)
      .withColumn("l_orderkey", off("l_orderkey", oSpan))
      .withColumn("l_partkey", off("l_partkey", pSpan))
      .withColumn("l_suppkey", off("l_suppkey", sSpan)), factor * 4)

    val events = read("events")
    val eSpan = maxOf(events, "event_id")
    val uSpan = maxOf(events, "user_id")
    write("events", tiled(events)
      .withColumn("event_id", off("event_id", eSpan))
      .withColumn("user_id", off("user_id", uSpan)), factor * 2)

    val documents = read("documents")
    val dSpan = maxOf(documents, "doc_id")
    write("documents", tiled(documents)
      .withColumn("doc_id", off("doc_id", dSpan))
      .withColumn("text",
        when(col("__t") === 0L, col("text"))
          .otherwise(concat(col("text"), lit(" tile"), col("__t"))))
      .withColumn("n_chars", length(col("text"))), factor)

    val embeddings = read("embeddings")
    val vSpan = maxOf(embeddings, "vec_id")
    val dim = 64
    val rot = when(col("__t") === 0L, col("embedding")).otherwise(
      concat(
        expr(s"slice(embedding, cast(__t % $dim + 1 as int), cast($dim - __t % $dim as int))"),
        expr(s"slice(embedding, 1, cast(__t % $dim as int))")))
    write("embeddings", tiled(embeddings)
      .withColumn("vec_id", off("vec_id", vSpan))
      .withColumn("embedding", rot), factor)

    println(s"[scaleup] wrote ${factor}x of $src to $out")
    spark.stop()
  }
}
