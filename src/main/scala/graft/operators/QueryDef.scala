package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One verifiable engine query: a Spark implementation and (when the
  * semantics are ANSI-SQL-expressible) an equivalent DuckDB oracle SQL
  * over the same parquet tables.
  *
  * Determinism contract (driver compare hashes values after sorting
  * columns by name): every query must produce a fully deterministic
  * result set — ORDER BY a unique key in BOTH implementations, identical
  * column names, and floating-point outputs either exact-decimal
  * (decimal-cast sums) or rounded well below the cross-engine error.
  */
final case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String] = None)

object QueryDef {
  /** Decimal-cast sum pattern, Spark side. Per-row doubles are IEEE-exact
    * across engines; casting to decimal before SUM makes the aggregation
    * order-independent and therefore bit-identical to the DuckDB oracle.
    */
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.functions._
  import org.apache.spark.sql.types.DecimalType

  def dsum(c: Column, scale: Int): Column =
    sum(c.cast(DecimalType(30, scale)))
  /** Final decimal→double cast can differ by 1 ulp across engines once
    * the scaled integer exceeds 2^53; round(.,4) absorbs that (margin
    * 5e-5 ≫ ulp for any sum below ~1e11). Keep scales ≤ 6. */
  def dsumd(c: Column, scale: Int): Column =
    round(dsum(c, scale).cast("double"), 4)

  /** Spread a small-file scan across all cores before CPU-heavy per-row
    * expression work (shingling, n-gram explode, hashing). The sf test
    * parquets arrive as ONE split, which would serialize the whole
    * pipeline onto a single task; at production scale the input already
    * has ≥ defaultParallelism splits and this is a no-op — so the
    * round-trip shuffle is only ever paid when the input is tiny.
    */
  import org.apache.spark.sql.DataFrame
  def spread(df: DataFrame): DataFrame = {
    val p = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < p) df.repartition(p) else df
  }

  /** The x1 broadcast discipline as a SHARED helper: a "small" join side
    * is broadcast only after its row count is MEASURED against a bound.
    * "Small by construction" claims (a Misra-Gries candidate union
    * bounded by P·m, a benchmark-gram set, an overlap-sized dropped
    * set) silently stop holding when the corpus — and with it the map
    * partition count or the contamination rate — grows, and an
    * unguarded broadcast then dies at Spark's broadcast cap instead of
    * degrading to a shuffle. The frame is staged first so the count and
    * the downstream join read ONE materialized result rather than
    * re-executing the producing plan per consumer; above the bound the
    * frame is returned un-hinted and Catalyst plans a scale-safe
    * shuffle join. Either path is exact — the guard bounds memory, not
    * accuracy.
    */
  def guardedBroadcast(small: DataFrame, maxRows: Long): DataFrame =
    small.queryExecution.optimizedPlan match {
      // already driver-local (a LocalRelation — e.g. the union-find
      // route of DedupClusters, or a literal lookup table): the row
      // count is on the plan, so the measure costs ZERO Spark jobs and
      // the stage+count ceremony below would only re-materialize data
      // the driver already holds (r21). The guard itself is unchanged —
      // the bound is still compared before any broadcast hint.
      case lr: org.apache.spark.sql.catalyst.plans.logical.LocalRelation
          if lr.data.length <= maxRows =>
        broadcast(small)
      case _ =>
        val m = graft.plans.Stage(small)
        if (m.count() <= maxRows) broadcast(m) else m
    }

  /** Measured max-group-population probe — the skew twin of
    * [[guardedBroadcast]]: one aggregate with map-side partials down to
    * a single row, read off an already-staged frame so the probe never
    * re-runs the producing plan. Shared by the d2 adaptive-salt gate
    * (keys = band, bh) and v2's degenerate-bucket cap (keys = tbl,
    * sig); 0 on an empty frame. */
  def maxGroupCount(df: DataFrame, keys: String*): Long = {
    val r = df.groupBy(keys.map(col): _*).agg(count(lit(1)).as("__c"))
      .agg(max(col("__c"))).head
    if (r.isNullAt(0)) 0L else r.getLong(0)
  }
}
