package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.sources.Tables
import QueryDef.{dsum, dsumd}

/** The ⊕ relational operator suite (SURVEY.md §2.3-§2.7, §2.11 H5-H8):
  * filters, projections/derived columns, joins (broadcast/semi/anti),
  * unions, grouped + windowed aggregation, sorts, conditional relabel,
  * string/formatting ops, pivot — each with a DuckDB oracle.
  *
  * Scale notes: all joins against region/nation/supplier/part are
  * broadcast (tiny dims); big-table aggregations are partial (map-side
  * combine) hash aggregates; every query is a single shuffle or less
  * beyond its scan wherever semantics allow.
  */
object RelationalQueries {

  private def T(s: SparkSession, dir: String, n: String) = Tables.load(s, dir, n)

  /** TPC-H Q1 shape (SURVEY A5/A6): grouped decimal-exact aggregation. */
  val q1PricingSummary = QueryDef(
    "q1_pricing_summary",
    (s, dir) => {
      val li = T(s, dir, "lineitem")
      li.filter(col("l_shipdate") <= lit("1999-12-31").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          dsumd(col("l_quantity"), 2).as("sum_qty"),
          dsumd(col("l_extendedprice"), 2).as("sum_base_price"),
          dsumd(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 6).as("sum_disc_price"),
          dsumd(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * (lit(1.0) + col("l_tax")), 6).as("sum_charge"),
          count(lit(1)).as("count_order"))
        .withColumn("avg_qty", round(col("sum_qty") / col("count_order"), 4))
        .orderBy("l_returnflag", "l_linestatus")
    },
    Some("""
      SELECT l_returnflag, l_linestatus,
             ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(30,2))) AS DOUBLE), 4) AS sum_qty,
             ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(30,2))) AS DOUBLE), 4) AS sum_base_price,
             ROUND(CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(30,6))) AS DOUBLE), 4) AS sum_disc_price,
             ROUND(CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax) AS DECIMAL(30,6))) AS DOUBLE), 4) AS sum_charge,
             COUNT(*) AS count_order,
             ROUND(ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(30,2))) AS DOUBLE), 4) / COUNT(*), 4) AS avg_qty
      FROM lineitem
      WHERE l_shipdate <= TIMESTAMP '1999-12-31 00:00:00'
      GROUP BY l_returnflag, l_linestatus
      ORDER BY l_returnflag, l_linestatus"""))

  /** TPC-H Q6 shape (F1/F3 + P-exprs): selective filter, scalar agg.
    * Filters are pushed to the parquet scan (PushedFilters). */
  val q2FilterRevenue = QueryDef(
    "q2_filter_revenue",
    (s, dir) =>
      T(s, dir, "lineitem")
        .filter(
          col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") <  lit("1998-01-01").cast("timestamp") &&
          col("l_discount").between(0.02, 0.09) &&
          col("l_quantity") < 24)
        .agg(
          dsumd(col("l_extendedprice") * col("l_discount"), 6).as("revenue"),
          count(lit(1)).as("n_rows")),
    Some("""
      SELECT ROUND(CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(30,6))) AS DOUBLE), 4) AS revenue,
             COUNT(*) AS n_rows
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
        AND l_discount BETWEEN 0.02 AND 0.09
        AND l_quantity < 24"""))

  /** Broadcast-join chain over the dim tables (J3): customer⋈nation⋈region. */
  val q3CustPerRegion = QueryDef(
    "q3_cust_per_region",
    (s, dir) => {
      val c = T(s, dir, "customer")
      val n = broadcast(T(s, dir, "nation"))
      val r = broadcast(T(s, dir, "region"))
      c.join(n, c("c_nationkey") === n("n_nationkey"))
        .join(r, n("n_regionkey") === r("r_regionkey"))
        .groupBy(col("r_name"), col("n_name"))
        .agg(
          count(lit(1)).as("n_cust"),
          dsumd(col("c_acctbal"), 2).as("total_acctbal"))
        .orderBy("r_name", "n_name")
    },
    Some("""
      SELECT r_name, n_name, COUNT(*) AS n_cust,
             ROUND(CAST(SUM(CAST(c_acctbal AS DECIMAL(30,2))) AS DOUBLE), 4) AS total_acctbal
      FROM customer JOIN nation ON c_nationkey = n_nationkey
                    JOIN region ON n_regionkey = r_regionkey
      GROUP BY r_name, n_name
      ORDER BY r_name, n_name"""))

  /** Fact-fact join (orders⋈lineitem) + agg; AQE handles the shuffle. */
  val q4RevenueByPriority = QueryDef(
    "q4_revenue_by_priority",
    (s, dir) => {
      val o = T(s, dir, "orders")
      val li = T(s, dir, "lineitem")
      o.join(li, o("o_orderkey") === li("l_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(
          countDistinct(col("o_orderkey")).as("n_orders"),
          count(lit(1)).as("n_lines"),
          dsumd(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 6).as("revenue"))
        .orderBy("o_orderpriority")
    },
    Some("""
      SELECT o_orderpriority,
             COUNT(DISTINCT o_orderkey) AS n_orders,
             COUNT(*) AS n_lines,
             ROUND(CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(30,6))) AS DOUBLE), 4) AS revenue
      FROM orders JOIN lineitem ON o_orderkey = l_orderkey
      GROUP BY o_orderpriority
      ORDER BY o_orderpriority"""))

  /** Left-semi join (F2 membership semantics at scale). */
  val q5SemiJoin = QueryDef(
    "q5_semijoin_segments",
    (s, dir) => {
      val c = T(s, dir, "customer")
      val urgent = T(s, dir, "orders").filter(col("o_orderpriority") === "1-URGENT")
      c.join(urgent, c("c_custkey") === urgent("o_custkey"), "left_semi")
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_cust_with_urgent"))
        .orderBy("c_mktsegment")
    },
    Some("""
      SELECT c_mktsegment, COUNT(*) AS n_cust_with_urgent
      FROM customer c
      WHERE EXISTS (SELECT 1 FROM orders o
                    WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT')
      GROUP BY c_mktsegment
      ORDER BY c_mktsegment"""))

  /** Left-anti join (NOT EXISTS). */
  val q6AntiJoin = QueryDef(
    "q6_antijoin_no_urgent",
    (s, dir) => {
      val c = T(s, dir, "customer")
      val urgent = T(s, dir, "orders").filter(col("o_orderpriority") === "1-URGENT")
      c.join(urgent, c("c_custkey") === urgent("o_custkey"), "left_anti")
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_cust_no_urgent"),
             dsumd(col("c_acctbal"), 2).as("acctbal_sum"))
        .orderBy("c_mktsegment")
    },
    Some("""
      SELECT c_mktsegment, COUNT(*) AS n_cust_no_urgent,
             ROUND(CAST(SUM(CAST(c_acctbal AS DECIMAL(30,2))) AS DOUBLE), 4) AS acctbal_sum
      FROM customer c
      WHERE NOT EXISTS (SELECT 1 FROM orders o
                        WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT')
      GROUP BY c_mktsegment
      ORDER BY c_mktsegment"""))

  /** Union of tagged subsets (J1 rbind semantics → unionByName). */
  val q7UnionTagged = QueryDef(
    "q7_union_tagged",
    (s, dir) => {
      val o = T(s, dir, "orders")
      val hi = o.filter(col("o_totalprice") >= 250000.0).withColumn("tier", lit("high"))
      val lo = o.filter(col("o_totalprice") < 50000.0).withColumn("tier", lit("low"))
      hi.unionByName(lo)
        .groupBy(col("tier"), col("o_orderstatus"))
        .agg(count(lit(1)).as("n"), dsumd(col("o_totalprice"), 2).as("total"))
        .orderBy("tier", "o_orderstatus")
    },
    Some("""
      WITH u AS (
        SELECT *, 'high' AS tier FROM orders WHERE o_totalprice >= 250000.0
        UNION ALL
        SELECT *, 'low' AS tier FROM orders WHERE o_totalprice < 50000.0)
      SELECT tier, o_orderstatus, COUNT(*) AS n,
             ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(30,2))) AS DOUBLE), 4) AS total
      FROM u GROUP BY tier, o_orderstatus
      ORDER BY tier, o_orderstatus"""))

  /** Exact distinct counts per group (A4). */
  val q8DistinctCounts = QueryDef(
    "q8_distinct_counts",
    (s, dir) =>
      T(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          countDistinct(col("l_suppkey")).as("n_supp"),
          countDistinct(col("l_partkey")).as("n_part"),
          count(lit(1)).as("n_rows"))
        .orderBy("l_returnflag"),
    Some("""
      SELECT l_returnflag,
             COUNT(DISTINCT l_suppkey) AS n_supp,
             COUNT(DISTINCT l_partkey) AS n_part,
             COUNT(*) AS n_rows
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""))

  /** Window ranking (W-ops): top-3 orders per customer. */
  val q9WindowTopN = QueryDef(
    "q9_window_topn",
    (s, dir) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      T(s, dir, "orders")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
                col("rn").cast("long").as("rn"))
        .orderBy("o_custkey", "rn")
    },
    Some("""
      SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
        SELECT o_custkey, o_orderkey, o_totalprice,
               ROW_NUMBER() OVER (PARTITION BY o_custkey
                                  ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
        FROM orders) t
      WHERE rn <= 3 ORDER BY o_custkey, rn"""))

  /** Ordered per-user lag/delta/running-sum over the events table (W2). */
  val q10WindowLag = QueryDef(
    "q10_window_lag",
    (s, dir) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
      val dec = (c: org.apache.spark.sql.Column) => c.cast(DecimalType(30, 2))
      Tables.events(s, dir)
        .withColumn("prev_value", lag(col("value"), 1).over(w))
        .withColumn("delta", (dec(col("value")) - dec(col("prev_value"))).cast("double"))
        .withColumn("running_sum",
          sum(dec(col("value"))).over(w.rowsBetween(Window.unboundedPreceding, 0)).cast("double"))
        .select(col("event_id"), col("user_id"), col("value"), col("prev_value"),
                col("delta"), col("running_sum"))
        .orderBy("event_id")
    },
    Some("""
      SELECT event_id, user_id, value,
             LAG(value, 1) OVER w AS prev_value,
             CAST(CAST(value AS DECIMAL(30,2)) - CAST(LAG(value, 1) OVER w AS DECIMAL(30,2)) AS DOUBLE) AS delta,
             CAST(SUM(CAST(value AS DECIMAL(30,2))) OVER (PARTITION BY user_id ORDER BY event_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_sum
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY event_id)
      ORDER BY event_id"""))

  /** Global sort + limit (W1). TakeOrderedAndProject — no full sort shuffle. */
  val q11TopOrders = QueryDef(
    "q11_top_orders",
    (s, dir) =>
      T(s, dir, "orders")
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .limit(20),
    Some("""
      SELECT o_orderkey, o_custkey, o_totalprice
      FROM orders ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 20"""))

  /** String/formatting ops (H6-H8): case, regex, substring, concat. */
  val q12StringOps = QueryDef(
    "q12_string_ops",
    (s, dir) =>
      T(s, dir, "part")
        .select(
          col("p_partkey"),
          upper(col("p_name")).as("name_upper"),
          regexp_replace(col("p_name"), "[aeiou]", "").as("name_novowel"),
          length(col("p_name")).cast("long").as("name_len"),
          substring(col("p_type"), 1, 5).as("type_prefix"),
          concat_ws("#", col("p_brand"), col("p_type")).as("brand_type"),
          format_string("%08d", col("p_partkey")).as("key_padded"))
        .orderBy("p_partkey"),
    Some("""
      SELECT p_partkey,
             UPPER(p_name) AS name_upper,
             REGEXP_REPLACE(p_name, '[aeiou]', '', 'g') AS name_novowel,
             LENGTH(p_name) AS name_len,
             SUBSTRING(p_type, 1, 5) AS type_prefix,
             CONCAT(p_brand, '#', p_type) AS brand_type,
             PRINTF('%08d', p_partkey) AS key_padded
      FROM part ORDER BY p_partkey"""))

  /** Conditional bucketing / relabel (H7 when-otherwise). */
  val q13CaseBucket = QueryDef(
    "q13_case_bucket",
    (s, dir) =>
      T(s, dir, "orders")
        .withColumn("bucket",
          when(col("o_totalprice") < 50000.0, "small")
            .when(col("o_totalprice") < 150000.0, "medium")
            .otherwise("large"))
        .groupBy(col("bucket"), col("o_orderstatus"))
        .agg(count(lit(1)).as("n"), dsumd(col("o_totalprice"), 2).as("total"))
        .orderBy("bucket", "o_orderstatus"),
    Some("""
      SELECT CASE WHEN o_totalprice < 50000.0 THEN 'small'
                  WHEN o_totalprice < 150000.0 THEN 'medium'
                  ELSE 'large' END AS bucket,
             o_orderstatus, COUNT(*) AS n,
             ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(30,2))) AS DOUBLE), 4) AS total
      FROM orders GROUP BY 1, 2 ORDER BY 1, 2"""))

  /** Grouped extremes (A7): the top-acctbal customer per nation. */
  val q14GroupedExtremes = QueryDef(
    "q14_grouped_extremes",
    (s, dir) => {
      val c = T(s, dir, "customer")
      val n = broadcast(T(s, dir, "nation"))
      val w = Window.partitionBy(col("n_name"))
        .orderBy(col("c_acctbal").desc, col("c_custkey").asc)
      c.join(n, c("c_nationkey") === n("n_nationkey"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("n_name"), col("c_custkey"), col("c_name"), col("c_acctbal"))
        .orderBy("n_name")
    },
    Some("""
      SELECT n_name, c_custkey, c_name, c_acctbal FROM (
        SELECT n_name, c_custkey, c_name, c_acctbal,
               ROW_NUMBER() OVER (PARTITION BY n_name
                                  ORDER BY c_acctbal DESC, c_custkey ASC) AS rn
        FROM customer JOIN nation ON c_nationkey = n_nationkey) t
      WHERE rn = 1 ORDER BY n_name"""))

  /** Ratio vs a baseline group (A8 relative-efficiency pattern):
    * per-segment decimal-exact mean acctbal over the BUILDING baseline. */
  val q15RatioVsBaseline = QueryDef(
    "q15_ratio_vs_baseline",
    (s, dir) => {
      val per = T(s, dir, "customer")
        .groupBy(col("c_mktsegment"))
        .agg((dsumd(col("c_acctbal"), 2) / count(lit(1))).as("avg_bal"))
      val base = per.filter(col("c_mktsegment") === "BUILDING")
        .select(col("avg_bal").as("base_bal"))
      per.crossJoin(broadcast(base))
        .select(
          col("c_mktsegment"),
          round(col("avg_bal"), 4).as("avg_bal"),
          round(col("avg_bal") / col("base_bal"), 6).as("ratio_vs_building"))
        .orderBy("c_mktsegment")
    },
    Some("""
      WITH per AS (
        SELECT c_mktsegment,
               ROUND(CAST(SUM(CAST(c_acctbal AS DECIMAL(30,2))) AS DOUBLE), 4) / COUNT(*) AS avg_bal
        FROM customer GROUP BY c_mktsegment)
      -- avg = rounded-exact decimal sum / count: identical doubles both engines
      SELECT p.c_mktsegment, ROUND(p.avg_bal, 4) + 0.0 AS avg_bal,
             ROUND(p.avg_bal / b.avg_bal, 6) + 0.0 AS ratio_vs_building
      FROM per p, (SELECT avg_bal FROM per WHERE c_mktsegment = 'BUILDING') b
      ORDER BY p.c_mktsegment"""))

  /** Pivot via conditional aggregation (H5 pretty-table pattern). */
  val q16PivotStatus = QueryDef(
    "q16_pivot_status",
    (s, dir) =>
      T(s, dir, "orders")
        .groupBy(col("o_orderpriority"))
        .agg(
          sum(when(col("o_orderstatus") === "F", 1L).otherwise(0L)).as("n_f"),
          sum(when(col("o_orderstatus") === "O", 1L).otherwise(0L)).as("n_o"),
          sum(when(col("o_orderstatus") === "P", 1L).otherwise(0L)).as("n_p"),
          count(lit(1)).as("n_total"))
        .orderBy("o_orderpriority"),
    Some("""
      SELECT o_orderpriority,
             CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_f,
             CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n_o,
             CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS n_p,
             COUNT(*) AS n_total
      FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority"""))

  /** Closed-form per-group OLS (M2/M3 shape, decimal-exact moments):
    * slope/intercept of value on (event_id mod 1000) per event_type. */
  val q17GroupedOls = QueryDef(
    "q17_grouped_ols",
    (s, dir) => {
      val x = (col("event_id") % 1000).cast("double")
      val agg = Tables.events(s, dir)
        .withColumn("x", x)
        .groupBy(col("event_type"))
        .agg(
          count(lit(1)).cast("double").as("n"),
          dsumd(col("x"), 0).as("sx"),
          dsumd(col("value"), 2).as("sy"),
          dsumd(col("x") * col("value"), 2).as("sxy"),
          dsumd(col("x") * col("x"), 0).as("sxx"))
      agg.select(
          col("event_type"),
          col("n").cast("long").as("n"),
          round((col("n") * col("sxy") - col("sx") * col("sy")) /
                (col("n") * col("sxx") - col("sx") * col("sx")), 8).as("slope"),
          round((col("sy") - ((col("n") * col("sxy") - col("sx") * col("sy")) /
                (col("n") * col("sxx") - col("sx") * col("sx"))) * col("sx")) / col("n"), 6).as("intercept"))
        .orderBy("event_type")
    },
    Some("""
      WITH m AS (
        SELECT event_type,
               CAST(COUNT(*) AS DOUBLE) AS n,
               ROUND(CAST(SUM(CAST(CAST(event_id % 1000 AS DOUBLE) AS DECIMAL(30,0))) AS DOUBLE), 4) AS sx,
               ROUND(CAST(SUM(CAST(value AS DECIMAL(30,2))) AS DOUBLE), 4) AS sy,
               ROUND(CAST(SUM(CAST(CAST(event_id % 1000 AS DOUBLE) * value AS DECIMAL(30,2))) AS DOUBLE), 4) AS sxy,
               ROUND(CAST(SUM(CAST(CAST(event_id % 1000 AS DOUBLE) * CAST(event_id % 1000 AS DOUBLE) AS DECIMAL(30,0))) AS DOUBLE), 4) AS sxx
        FROM events GROUP BY event_type)
      SELECT event_type, CAST(n AS BIGINT) AS n,
             ROUND((n * sxy - sx * sy) / (n * sxx - sx * sx), 8) + 0.0 AS slope,
             ROUND((sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx) / n, 6) + 0.0 AS intercept
      FROM m ORDER BY event_type"""))

  /** Moment statistics via exact sums (A5 empirical-SE pattern). */
  val q18Moments = QueryDef(
    "q18_moments",
    (s, dir) => {
      val agg = Tables.events(s, dir)
        .groupBy(col("event_type"))
        .agg(
          count(lit(1)).cast("double").as("n"),
          dsumd(col("value"), 2).as("s1"),
          dsumd(col("value") * col("value"), 4).as("s2"))
      agg.select(
          col("event_type"),
          col("n").cast("long").as("n"),
          round(col("s1") / col("n"), 6).as("mean_value"),
          round(sqrt((col("s2") - col("s1") * col("s1") / col("n")) / col("n")), 6).as("sd_pop"))
        .orderBy("event_type")
    },
    Some("""
      WITH m AS (
        SELECT event_type, CAST(COUNT(*) AS DOUBLE) AS n,
               ROUND(CAST(SUM(CAST(value AS DECIMAL(30,2))) AS DOUBLE), 4) AS s1,
               ROUND(CAST(SUM(CAST(value * value AS DECIMAL(30,4))) AS DOUBLE), 4) AS s2
        FROM events GROUP BY event_type)
      SELECT event_type, CAST(n AS BIGINT) AS n,
             ROUND(s1 / n, 6) AS mean_value,
             ROUND(SQRT((s2 - s1 * s1 / n) / n), 6) AS sd_pop
      FROM m ORDER BY event_type"""))

  /** Calendar bucketing: per-month order counts + totals. */
  val q19MonthlyOrders = QueryDef(
    "q19_monthly_orders",
    (s, dir) =>
      T(s, dir, "orders")
        .groupBy(
          year(col("o_orderdate")).cast("long").as("y"),
          month(col("o_orderdate")).cast("long").as("m"))
        .agg(count(lit(1)).as("n_orders"), dsumd(col("o_totalprice"), 2).as("total"))
        .orderBy("y", "m"),
    Some("""
      SELECT CAST(YEAR(o_orderdate) AS BIGINT) AS y, CAST(MONTH(o_orderdate) AS BIGINT) AS m,
             COUNT(*) AS n_orders,
             ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(30,2))) AS DOUBLE), 4) AS total
      FROM orders GROUP BY 1, 2 ORDER BY 1, 2"""))

  /** Sessionization via gap detection (W2 + running state, batch form). */
  val q20Sessionize = QueryDef(
    "q20_sessionize",
    (s, dir) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
      val gapNanos = 1800L * 1000000000L
      Tables.events(s, dir)
        .withColumn("prev_ts", lag(col("ts"), 1).over(w))
        .withColumn("new_session",
          when(col("prev_ts").isNull || col("ts") - col("prev_ts") > gapNanos, 1L)
            .otherwise(0L))
        .groupBy(col("user_id"))
        .agg(sum(col("new_session")).as("n_sessions"), count(lit(1)).as("n_events"))
        .orderBy("user_id")
    },
    Some("""
      WITH g AS (
        SELECT user_id,
               CASE WHEN LAG(ts, 1) OVER (PARTITION BY user_id ORDER BY event_id) IS NULL
                         OR EPOCH_NS(ts) - EPOCH_NS(LAG(ts, 1) OVER (PARTITION BY user_id ORDER BY event_id)) > 1800000000000
                    THEN 1 ELSE 0 END AS new_session
        FROM events)
      SELECT user_id, CAST(SUM(new_session) AS BIGINT) AS n_sessions, COUNT(*) AS n_events
      FROM g GROUP BY user_id ORDER BY user_id"""))

  /** As-of join: each event paired with the customer's most recent prior
    * order. Spark lacks a native ASOF operator; the scalable pattern is
    * union-both-sides + one window pass (`last(..., ignoreNulls)` over
    * time order) — a single shuffle on the join key, no per-key range
    * explosion, O(n log n) regardless of orders-per-customer skew.
    * Ties are pre-collapsed with max_by on both sides so the DuckDB
    * ASOF JOIN oracle is unambiguous.
    */
  val q21AsofJoin = QueryDef(
    "q21_asof_join",
    (s, dir) => {
      val ev = Tables.events(s, dir) // ts is nanos-since-epoch LONG
      val od = T(s, dir, "orders")
        .groupBy(col("o_custkey"), col("o_orderdate"))
        .agg(max(col("o_orderkey")).as("o_orderkey"),
             max_by(col("o_totalprice"), col("o_orderkey")).as("o_totalprice"))
        .select(
          col("o_custkey").as("key"),
          (unix_micros(col("o_orderdate").cast("timestamp")) * 1000L).as("t_ns"),
          col("o_orderkey"), col("o_totalprice"),
          lit(null).cast("long").as("event_id"), lit(0).as("is_event"))
      val el = ev.select(
        col("user_id").as("key"), col("ts").as("t_ns"),
        lit(null).cast("long").as("o_orderkey"),
        lit(null).cast("double").as("o_totalprice"),
        col("event_id"), lit(1).as("is_event"))
      // orders sort before events at the same instant => '>=' asof semantics
      val w = Window.partitionBy(col("key"))
        .orderBy(col("t_ns"), col("is_event"), col("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, 0)
      od.unionByName(el)
        .withColumn("last_orderkey", last(col("o_orderkey"), ignoreNulls = true).over(w))
        .withColumn("last_totalprice", last(col("o_totalprice"), ignoreNulls = true).over(w))
        .withColumn("last_order_tns", last(when(col("is_event") === 0, col("t_ns")), ignoreNulls = true).over(w))
        // inner-asof semantics (match DuckDB ASOF JOIN): drop events with
        // no prior order rather than emitting them with nulls
        .filter(col("is_event") === 1 && col("last_orderkey").isNotNull)
        .select(
          col("event_id"), col("key").as("user_id"),
          col("last_orderkey").as("o_orderkey"),
          col("last_totalprice").as("o_totalprice"),
          round((col("t_ns") - col("last_order_tns")).cast("double") / lit(86400e9), 4)
            .as("order_age_days"))
        .orderBy("event_id")
    },
    Some("""
      WITH od AS (
        SELECT o_custkey, o_orderdate,
               MAX(o_orderkey) AS o_orderkey,
               ARG_MAX(o_totalprice, o_orderkey) AS o_totalprice
        FROM orders GROUP BY o_custkey, o_orderdate)
      SELECT e.event_id, e.user_id, od.o_orderkey, od.o_totalprice,
             ROUND(CAST(EPOCH_NS(e.ts) - EPOCH_NS(od.o_orderdate) AS DOUBLE) / 86400e9, 4)
               AS order_age_days
      FROM events e ASOF JOIN od
        ON e.user_id = od.o_custkey AND e.ts >= od.o_orderdate
      ORDER BY e.event_id"""))

  /** Grouping sets: ROLLUP over (priority, status) — subtotal rows with
    * NULL group keys, ordered NULLS FIRST on both engines. */
  val q22Rollup = QueryDef(
    "q22_rollup",
    (s, dir) =>
      T(s, dir, "orders")
        .rollup(col("o_orderpriority"), col("o_orderstatus"))
        .agg(count(lit(1)).as("n"), dsumd(col("o_totalprice"), 2).as("total"))
        .orderBy(col("o_orderpriority").asc_nulls_first, col("o_orderstatus").asc_nulls_first),
    Some("""
      SELECT o_orderpriority, o_orderstatus, COUNT(*) AS n,
             ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(30,2))) AS DOUBLE), 4) AS total
      FROM orders GROUP BY ROLLUP(o_orderpriority, o_orderstatus)
      ORDER BY o_orderpriority NULLS FIRST, o_orderstatus NULLS FIRST"""))

  /** Semi-structured extraction: pull `k` out of the JSON `props` column
    * and aggregate it per event type. */
  val q23JsonExtract = QueryDef(
    "q23_json_extract",
    (s, dir) =>
      Tables.events(s, dir)
        .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
        .groupBy(col("event_type"))
        .agg(
          count(lit(1)).as("n"),
          sum(col("k")).as("sum_k"),
          min(col("k")).as("min_k"),
          max(col("k")).as("max_k"),
          sum(col("k").isNull.cast("long")).as("n_null"))
        .orderBy("event_type"),
    Some("""
      SELECT event_type, COUNT(*) AS n,
             CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
             CAST(MIN(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS min_k,
             CAST(MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS max_k,
             CAST(SUM(CASE WHEN json_extract_string(props, '$.k') IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null
      FROM events GROUP BY event_type ORDER BY event_type"""))

  /** Value-range window frame: per-user sum of `value` over events whose
    * event_id lies within 100 of the current row (RANGE frame, not ROWS). */
  val q24RangeFrame = QueryDef(
    "q24_range_frame",
    (s, dir) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
        .rangeBetween(-100L, 0L)
      Tables.events(s, dir)
        .withColumn("range_sum",
          sum(col("value").cast(DecimalType(30, 2))).over(w).cast("double"))
        .select(col("event_id"), col("user_id"), col("range_sum"))
        .orderBy("event_id")
    },
    Some("""
      SELECT event_id, user_id,
             CAST(SUM(CAST(value AS DECIMAL(30,2))) OVER (
               PARTITION BY user_id ORDER BY event_id
               RANGE BETWEEN 100 PRECEDING AND CURRENT ROW) AS DOUBLE) AS range_sum
      FROM events ORDER BY event_id"""))

  val all: Seq[QueryDef] = Seq(
    q1PricingSummary, q2FilterRevenue, q3CustPerRegion, q4RevenueByPriority,
    q5SemiJoin, q6AntiJoin, q7UnionTagged, q8DistinctCounts, q9WindowTopN,
    q10WindowLag, q11TopOrders, q12StringOps, q13CaseBucket, q14GroupedExtremes,
    q15RatioVsBaseline, q16PivotStatus, q17GroupedOls, q18Moments,
    q19MonthlyOrders, q20Sessionize, q21AsofJoin, q22Rollup, q23JsonExtract,
    q24RangeFrame)
}
