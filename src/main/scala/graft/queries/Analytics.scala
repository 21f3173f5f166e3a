package graft.queries

import graft.functions.Fx
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** Analytic-function coverage beyond the round-1 surface: the full
  * window-function family (ntile / percent_rank / cume_dist / lead),
  * exact percentiles, statistical aggregates (corr / covariance /
  * stddev), argmin/argmax aggregation, and CUBE grouping sets.
  *
  * Cross-engine determinism (per queries.Relational): window orderings
  * carry a unique tiebreak column; double aggregates are rounded on both
  * engines with margins sized to the co-moment accumulation error
  * (partition-order-dependent in the last ~1e-9 relative for 600k-row
  * groups — far inside the rounding).
  *
  * Scale notes: every window partitions on a real key (no
  * whole-relation window except the intentionally-tiny percentile
  * output); stats/percentile aggregates are single-shuffle partial
  * aggregations except exact percentile, which is sort-based by nature —
  * the approx_percentile sketch (q90-style) is the 100 TB path, exact is
  * the oracle-checkable baseline.
  */
object Analytics {

  type Q = (SparkSession, String) => DataFrame

  // ------------------------------------------------- q25 window family

  /** ntile/percent_rank/cume_dist/lead over per-segment balance order —
    * one exchange on the window key serves all four functions. */
  def q25WindowSuite(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("c_mktsegment"))
      .orderBy(col("c_acctbal").asc, col("c_custkey").asc)
    Tables.customer(s, dir)
      .withColumn("quartile", ntile(4).over(w))
      .withColumn("pct_rank", Fx.fx(percent_rank().over(w), 6))
      .withColumn("cume", Fx.fx(cume_dist().over(w), 6))
      .withColumn("next_cust", lead(col("c_custkey"), 1).over(w))
      .select(col("c_mktsegment"), col("c_custkey"), col("c_acctbal"),
        col("quartile"), col("pct_rank"), col("cume"), col("next_cust"))
  }

  val q25Sql: String =
    s"""SELECT c_mktsegment, c_custkey, c_acctbal,
      |  CAST(ntile(4) OVER w AS INTEGER) AS quartile,
      |  ${Fx.fxSql("percent_rank() OVER w", 6)} AS pct_rank,
      |  ${Fx.fxSql("cume_dist() OVER w", 6)} AS cume,
      |  lead(c_custkey, 1) OVER w AS next_cust
      |FROM customer
      |WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal ASC, c_custkey ASC)""".stripMargin

  // --------------------------------------------------- q26 percentiles

  /** Exact interpolated percentiles per group (the oracle-checkable
    * baseline; approx_percentile is the sketch path at scale). */
  def q26Percentiles(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .groupBy(col("l_returnflag"))
      .agg(
        Fx.fx(percentile(col("l_quantity"), lit(0.5)), 4).as("median_qty"),
        Fx.fx(percentile(col("l_extendedprice"), lit(0.25)), 4).as("p25_price"),
        Fx.fx(percentile(col("l_extendedprice"), lit(0.75)), 4).as("p75_price"),
        count(lit(1)).as("n"))

  val q26Sql: String =
    s"""SELECT l_returnflag,
      |  ${Fx.fxSql("quantile_cont(l_quantity, 0.5)", 4)} AS median_qty,
      |  ${Fx.fxSql("quantile_cont(l_extendedprice, 0.25)", 4)} AS p25_price,
      |  ${Fx.fxSql("quantile_cont(l_extendedprice, 0.75)", 4)} AS p75_price,
      |  count(*) AS n
      |FROM lineitem GROUP BY l_returnflag""".stripMargin

  /** q26's 100 TB path: approx_percentile (GK sketch — partial-merge,
    * bounded memory per group, no global sort). The raw sketch outputs
    * are engine-specific and can never hash-match a DuckDB twin, so the
    * COMPARED columns are the exact percentiles plus a
    * `within_tolerance` boolean that checks the sketch's error BOUND:
    * accuracy 10000 guarantees relative rank error ≤ 1e-4, so each
    * approx value must lie inside the exact interpolated percentile
    * band at rank p ± 1e-3 (a 10× margin). The oracle computes the
    * exact twin and a literal TRUE — a sketch that drifts outside its
    * contract flips the boolean and fails the hash. */
  def q91ApproxPercentiles(s: SparkSession, dir: String): DataFrame = {
    val eps = 0.001
    // ONE Percentile buffer per column (an array of percentages shares
    // the buffer) — 9 scalar percentile aggs would build 9 sorted
    // count-maps per group and ran 5.5 s at sf0.1; this shape runs the
    // same check with 2 buffers in ~2 s (q26's cost class)
    val pq = percentile(col("l_quantity"),
      array(lit(0.5 - eps), lit(0.5), lit(0.5 + eps)))
    val pp = percentile(col("l_extendedprice"),
      array(lit(0.25 - eps), lit(0.25), lit(0.25 + eps),
        lit(0.75 - eps), lit(0.75), lit(0.75 + eps)))
    val aq = percentile_approx(col("l_quantity"), lit(0.5), lit(10000))
    val ap = percentile_approx(col("l_extendedprice"),
      array(lit(0.25), lit(0.75)), lit(10000))
    Tables.lineitem(s, dir)
      .groupBy(col("l_returnflag"))
      .agg(pq.as("pq"), pp.as("pp"), aq.as("aq"), ap.as("ap"),
        count(lit(1)).as("n"))
      .select(col("l_returnflag"),
        Fx.fx(element_at(col("pq"), 2), 4).as("exact_median_qty"),
        Fx.fx(element_at(col("pp"), 2), 4).as("exact_p25_price"),
        Fx.fx(element_at(col("pp"), 5), 4).as("exact_p75_price"),
        col("n"),
        (col("aq").between(element_at(col("pq"), 1), element_at(col("pq"), 3)) &&
          element_at(col("ap"), 1)
            .between(element_at(col("pp"), 1), element_at(col("pp"), 3)) &&
          element_at(col("ap"), 2)
            .between(element_at(col("pp"), 4), element_at(col("pp"), 6)))
          .as("within_tolerance"))
  }

  val q91Sql: String =
    s"""SELECT l_returnflag,
      |  ${Fx.fxSql("quantile_cont(l_quantity, 0.5)", 4)} AS exact_median_qty,
      |  ${Fx.fxSql("quantile_cont(l_extendedprice, 0.25)", 4)} AS exact_p25_price,
      |  ${Fx.fxSql("quantile_cont(l_extendedprice, 0.75)", 4)} AS exact_p75_price,
      |  count(*) AS n,
      |  TRUE AS within_tolerance
      |FROM lineitem GROUP BY l_returnflag""".stripMargin

  // ---------------------------------------------- q27 statistical aggs

  /** corr / covar_samp / stddev_samp — single-pass partial-merge
    * co-moments on both engines; rounding absorbs the partition-order
    * accumulation difference. */
  def q27StatsAgg(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .groupBy(col("l_linestatus"))
      .agg(
        Fx.fx(corr(col("l_quantity"), col("l_extendedprice")), 6).as("corr_qty_price"),
        Fx.fx(covar_samp(col("l_quantity"), col("l_extendedprice")), 3).as("covar_qty_price"),
        Fx.fx(stddev_samp(col("l_extendedprice")), 3).as("stddev_price"),
        // exact cents sum / count, not avg(): the 600k-addend float sum
        // inside avg() is order-dependent across engines (q01 posture);
        // the co-moment aggregates above stay fx-presented - their
        // nonlinear merges cannot be integerized (documented in Fx)
        Fx.fx(sum(floor(col("l_extendedprice") * 100 + lit(0.5))).cast("double")
          / (count(lit(1)) * lit(100.0)), 4).as("avg_price"))

  val q27Sql: String =
    s"""SELECT l_linestatus,
      |  ${Fx.fxSql("corr(l_quantity, l_extendedprice)", 6)} AS corr_qty_price,
      |  ${Fx.fxSql("covar_samp(l_quantity, l_extendedprice)", 3)} AS covar_qty_price,
      |  ${Fx.fxSql("stddev_samp(l_extendedprice)", 3)} AS stddev_price,
      |  ${Fx.fxSql("sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT))::DOUBLE / (count(*) * CAST(100 AS DOUBLE))", 4)} AS avg_price
      |FROM lineitem GROUP BY l_linestatus""".stripMargin

  // ------------------------------------------------- q28 argmin/argmax

  /** max_by/min_by (argmax/argmin) per supplier. max_by over a tied key
    * is engine-nondeterministic and never oracle-safe — and the synthetic
    * lineitem DOES carry duplicate (orderkey, linenumber) rows — so the
    * ordering key is a 60-bit content hash of the full row identity,
    * unique in practice and computed identically by both engines. */
  def q28ArgMinMax(s: SparkSession, dir: String): DataFrame = {
    val rowKey = graft.functions.Portable.h60(concat_ws("-",
      col("l_orderkey"), col("l_linenumber"), col("l_partkey")))
    Tables.lineitem(s, dir)
      .groupBy(col("l_suppkey"))
      .agg(
        max_by(col("l_partkey"), rowKey).as("argmax_partkey"),
        min_by(col("l_partkey"), rowKey).as("argmin_partkey"),
        max(rowKey).as("max_row_key"))
  }

  val q28Sql: String = {
    val k = "('0x' || substr(md5(l_orderkey || '-' || l_linenumber || '-' || l_partkey), 1, 15))::BIGINT"
    s"""SELECT l_suppkey,
       |  arg_max(l_partkey, $k) AS argmax_partkey,
       |  arg_min(l_partkey, $k) AS argmin_partkey,
       |  max($k) AS max_row_key
       |FROM lineitem GROUP BY l_suppkey""".stripMargin
  }

  // ------------------------------------------------------- q29 cube

  /** CUBE over (priority, status) with the grouping-id bitmask — all
    * four grouping sets in ONE shuffle (Spark expands the cube into a
    * single Expand + hash aggregate, not four scans). */
  def q29Cube(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .cube(col("o_orderpriority"), col("o_orderstatus"))
      // grouping_id() is only resolvable INSIDE the cube's agg list
      .agg(grouping_id().cast("long").as("gid"),
        count(lit(1)).as("n"),
        (sum(floor(col("o_totalprice") * 100 + lit(0.5))) / lit(100.0)).as("sum_price"))
      .select(
        coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
        coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
        col("gid"), col("n"), col("sum_price"))

  val q29Sql: String =
    s"""SELECT coalesce(o_orderpriority, 'ALL') AS priority,
      |  coalesce(o_orderstatus, 'ALL') AS status,
      |  CAST(GROUPING(o_orderpriority, o_orderstatus) AS BIGINT) AS gid,
      |  count(*) AS n, sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) / CAST(100 AS DOUBLE) AS sum_price
      |FROM orders
      |GROUP BY CUBE (o_orderpriority, o_orderstatus)""".stripMargin

  // --------------------------------------------- q93 z-score outliers

  /** Per-group z-score outlier detection (|z| > 2.5) with ENGINE-EXACT
    * floats: values quantize to integer cents, the group moments
    * (n, Σx, Σx²) are exact integer sums, and mean/std/z are then the
    * SAME IEEE expression over the same exact inputs on both engines —
    * so even unrounded doubles would hash-match; z is rounded to 4 only
    * for display convention. The group-stats join broadcasts (5 rows).
    * (Contrast q27, which uses the built-in single-pass co-moments and
    * needs rounding to absorb partition-order accumulation.) */
  def q93ZscoreOutliers(s: SparkSession, dir: String): DataFrame = {
    val v = Tables.events(s, dir).select(
      col("event_id"), col("event_type"),
      floor(col("value") * 100 + lit(0.5)).cast("long").as("vc"))
    val g = v.groupBy(col("event_type")).agg(
      count(lit(1)).as("n"),
      sum(col("vc")).as("s1"),
      sum(col("vc") * col("vc")).as("s2"))
    val s1d = col("s1").cast("double")
    v.join(broadcast(g), Seq("event_type"))
      .withColumn("z",
        (col("vc") - s1d / col("n")) /
          sqrt((col("s2") - s1d * col("s1") / col("n")) / (col("n") - 1)))
      .filter(abs(col("z")) > 2.5)
      .select(col("event_id"), col("event_type"),
        Fx.fx(col("vc") / 100.0, 2).as("value"), Fx.fx(col("z"), 4).as("z"))
  }

  val q93Sql: String =
    s"""WITH v AS (
      |  SELECT event_id, event_type,
      |    CAST(floor(value * 100 + 0.5) AS BIGINT) AS vc
      |  FROM events),
      |g AS (
      |  SELECT event_type, count(*) AS n, sum(vc) AS s1, sum(vc * vc) AS s2
      |  FROM v GROUP BY event_type),
      |z AS (
      |  SELECT v.event_id, v.event_type, v.vc,
      |    (v.vc - CAST(g.s1 AS DOUBLE) / g.n) /
      |      sqrt((g.s2 - CAST(g.s1 AS DOUBLE) * g.s1 / g.n) / (g.n - 1)) AS z
      |  FROM v JOIN g USING (event_type))
      |SELECT event_id, event_type, ${Fx.fxSql("vc / 100.0", 2)} AS value,
      |  ${Fx.fxSql("z", 4)} AS z
      |FROM z WHERE abs(z) > 2.5""".stripMargin

  // ------------------------------------------------ q105 time-range frame

  /** Trailing-30-day per-customer order stats at every order: a RANGE
    * window frame over the day number — peers (same-day orders) enter
    * the frame together, so the result is deterministic without a
    * tiebreak, unlike ROWS frames. The feature shape behind
    * time-decayed aggregates ("spend in the last 30 days") at 100 TB:
    * one hash exchange on the entity key, a per-partition sort, then a
    * sliding frame — no self-join, no per-day grid materialization.
    * Sums run in exact decimal (per-frame sums are small, so double
    * accumulation noise would land on the half-cent boundary). */
  def q105RangeFrame(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(datediff(col("o_orderdate"), lit("1970-01-01").cast("date")))
      .rangeBetween(-29, Window.currentRow)
    Tables.orders(s, dir)
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"),
        count(lit(1)).over(w).as("trailing_n"),
        Fx.fx(sum(col("o_totalprice").cast("decimal(18,4)")).over(w), 2)
          .cast("double").as("trailing_spend"))
  }

  val q105Sql: String =
    s"""SELECT o_orderkey, o_custkey, o_orderdate,
      |  count(*) OVER w AS trailing_n,
      |  CAST(${Fx.fxSql("sum(CAST(o_totalprice AS DECIMAL(18,4))) OVER w", 2)} AS DOUBLE) AS trailing_spend
      |FROM orders
      |WINDOW w AS (PARTITION BY o_custkey
      |  ORDER BY (CAST(o_orderdate AS DATE) - DATE '1970-01-01')
      |  RANGE BETWEEN 29 PRECEDING AND CURRENT ROW)""".stripMargin

  // --------------------------- q113 global rank / q114 histogram

  /** q113: exact global curriculum rank over `documents` by length
    * ([[graft.operators.GlobalRank]]) — the scale-safe replacement for
    * a partition-less `row_number() OVER (ORDER BY …)`: a domain-sized
    * offset table (distinct n_chars values) broadcast onto a
    * per-score-value window. No task ever sorts more than one score
    * value's rows; the oracle is the naive global window. */
  def q113GlobalRank(s: SparkSession, dir: String): DataFrame =
    graft.operators.GlobalRank.globalRank(
      Tables.documents(s, dir).select(col("doc_id"), col("n_chars")),
      col("n_chars"), col("doc_id"))

  val q113Sql: String =
    """SELECT doc_id, n_chars,
      |  row_number() OVER (ORDER BY n_chars, doc_id) AS global_rank
      |FROM documents""".stripMargin

  /** q114: equi-width price histogram ([[graft.operators.Histogram]])
    * in exact integer cents — ONE corpus aggregation (per distinct
    * value), binning and roll-up on the domain-sized relation. */
  private val HistBuckets = 20

  def q114Histogram(s: SparkSession, dir: String): DataFrame =
    graft.operators.Histogram.equiWidth(
      Tables.lineitem(s, dir),
      Fx.fx(col("l_extendedprice") * 100, 0).cast("long"), HistBuckets)

  val q114Sql: String =
    s"""WITH v AS (
       |  SELECT CAST(${Fx.fxSql("l_extendedprice * 100", 0)} AS BIGINT) AS v
       |  FROM lineitem WHERE l_extendedprice IS NOT NULL),
       |pv AS (SELECT v, count(*) AS n FROM v GROUP BY v),
       |s AS (SELECT min(v) AS lo, max(v) AS hi FROM pv)
       |SELECT ((pv.v - s.lo) * $HistBuckets) // (s.hi - s.lo + 1) AS bucket,
       |  CAST(sum(pv.n) AS BIGINT) AS n
       |FROM pv, s GROUP BY 1""".stripMargin

  val queries: Map[String, Q] = Map(
    "q113_global_rank" -> q113GlobalRank,
    "q114_histogram"   -> q114Histogram,
    "q25_window_suite" -> q25WindowSuite,
    "q26_percentiles"  -> q26Percentiles,
    "q27_stats_agg"    -> q27StatsAgg,
    "q28_argminmax"    -> q28ArgMinMax,
    "q29_cube"         -> q29Cube,
    "q91_approx_percentiles" -> q91ApproxPercentiles,
    "q93_zscore_outliers" -> q93ZscoreOutliers,
    "q105_range_frame" -> q105RangeFrame,
  )
  val oracles: Map[String, String] = Map(
    "q113_global_rank" -> q113Sql,
    "q114_histogram"   -> q114Sql,
    "q25_window_suite" -> q25Sql,
    "q26_percentiles"  -> q26Sql,
    "q27_stats_agg"    -> q27Sql,
    "q28_argminmax"    -> q28Sql,
    "q29_cube"         -> q29Sql,
    "q91_approx_percentiles" -> q91Sql,
    "q93_zscore_outliers" -> q93Sql,
    "q105_range_frame" -> q105Sql,
  )
}
