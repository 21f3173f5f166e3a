package graft.queries

import graft.functions.Fx
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables
import graft.functions.Portable._

/** Core relational operator coverage over the driver star schema
  * (scan, filter+pushdown, joins incl. broadcast/semi/anti, hash agg,
  * rollup, windows, top-k, set ops, explode, JSON extraction).
  *
  * Cross-engine determinism rules (shared with every other query group):
  *  - double aggregates are `round`ed on BOTH engines (sum order across
  *    partitions differs in the last ulp — SURVEY.md §2.2 trap ⑧ analog);
  *  - raw column pass-throughs stay unrounded (bit-identical parquet);
  *  - timestamps are exposed as epoch-second longs or DATEs, never raw
  *    (the testdata's ns precision exceeds Spark's micros).
  *
  * Scale notes are inline per query; the common ones: every groupBy here
  * keys on low-cardinality/low-skew columns and benefits from Spark's
  * partial aggregation; dimension joins broadcast the small side
  * explicitly so the 100 TB fact side never shuffles.
  */
object Relational {

  type Q = (SparkSession, String) => DataFrame

  /** TPC-H Q1-flavor pricing summary: filter → hash agg on 2 keys.
    * Partial agg collapses ~row-count to 6 groups map-side: at 100 TB the
    * shuffle carries only (6 groups × partitions) rows. */
  def q01PricingSummary(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        // money sums in EXACT integer cents (the q97 posture): every
        // money column is 2-decimal, so floor(x*100+.5) is the exact
        // cent value and the long sum is order-independent - this
        // closes the one hazard fx cannot (different float-sum results
        // across engines straddling a boundary). Means over exact sums
        // are identical-input, so fx fully determinizes them.
        Fx.fx(sum(col("l_quantity")), 2).as("sum_qty"), // integer-valued: already exact
        (sum(floor(col("l_extendedprice") * 100 + lit(0.5))) / lit(100.0)).as("sum_base_price"),
        (sum(floor(col("l_extendedprice") * 100 + lit(0.5)) *
          (lit(100L) - floor(col("l_discount") * 100 + lit(0.5)))) / lit(10000.0)).as("sum_disc_price"),
        Fx.fx(avg(col("l_quantity")), 3).as("avg_qty"),
        Fx.fx((sum(floor(col("l_discount") * 100 + lit(0.5))).cast("double") /
          count(lit(1))) / lit(100.0), 4).as("avg_disc"),
        count(lit(1)).as("count_order"))

  val q01Sql: String =
    s"""SELECT l_returnflag, l_linestatus,
      |  ${Fx.fxSql("sum(l_quantity)", 2)} AS sum_qty,
      |  sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) / CAST(100 AS DOUBLE) AS sum_base_price,
      |  sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
      |      * (100 - CAST(floor(l_discount * 100 + 0.5) AS BIGINT))) / CAST(10000 AS DOUBLE) AS sum_disc_price,
      |  ${Fx.fxSql("avg(l_quantity)", 3)} AS avg_qty,
      |  ${Fx.fxSql("(sum(CAST(floor(l_discount * 100 + 0.5) AS BIGINT))::DOUBLE / count(*)) / CAST(100 AS DOUBLE)", 4)} AS avg_disc,
      |  count(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
      |GROUP BY l_returnflag, l_linestatus""".stripMargin

  /** Selective filter + narrow projection: the plan must show
    * PushedFilters on all three predicates and ReadSchema of exactly 4
    * columns — the "don't read 100 TB to answer a 4-column question"
    * query. Raw values pass through bit-identical. */
  def q02FilterPushdown(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .filter(col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"), col("l_discount"))

  val q02Sql: String =
    """SELECT l_orderkey, l_linenumber, l_extendedprice, l_discount
      |FROM lineitem
      |WHERE l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24""".stripMargin

  /** 3-way join: fact lineitem ⋈ orders, dims broadcast. customer and
    * nation are broadcast explicitly (dimension tables stay small even at
    * 100 TB fact scale); lineitem⋈orders co-shuffles on the orderkey. */
  def q03JoinRevenue(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
    val o  = Tables.orders(s, dir)
    val c  = Tables.customer(s, dir)
    val n  = Tables.nation(s, dir)
    li.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(
        // exact 10^-4-unit revenue (cents x discount-complement pct) -
        // order-independent long sum, the q01/q115 posture
        (sum(floor(col("l_extendedprice") * 100 + lit(0.5)) *
          (lit(100L) - floor(col("l_discount") * 100 + lit(0.5)))) / lit(10000.0)).as("revenue"),
        count(lit(1)).as("n_items"))
  }

  val q03Sql: String =
    s"""SELECT n_name,
      |  sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
      |      * (100 - CAST(floor(l_discount * 100 + 0.5) AS BIGINT))) / CAST(10000 AS DOUBLE) AS revenue,
      |  count(*) AS n_items
      |FROM lineitem
      |JOIN orders   ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation   ON c_nationkey = n_nationkey
      |GROUP BY n_name""".stripMargin

  /** Semi + anti join (EXISTS / NOT EXISTS): customers with vs without
    * orders, per market segment. Broadcast-able key set at any scale
    * (distinct custkeys of orders shrink map-side first). */
  def q04SemiAnti(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(s, dir)
    val o = Tables.orders(s, dir)
    val withO = c.join(o, col("c_custkey") === col("o_custkey"), "left_semi")
      .groupBy(col("c_mktsegment")).agg(count(lit(1)).as("n_with_orders"))
    val withoutO = c.join(o, col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy(col("c_mktsegment")).agg(count(lit(1)).as("n_without_orders"))
    withO.join(withoutO, Seq("c_mktsegment"), "full_outer")
      .select(col("c_mktsegment"),
        coalesce(col("n_with_orders"), lit(0L)).as("n_with_orders"),
        coalesce(col("n_without_orders"), lit(0L)).as("n_without_orders"))
  }

  val q04Sql: String =
    """WITH w AS (
      |  SELECT c_mktsegment, count(*) AS n_with_orders
      |  FROM customer WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
      |  GROUP BY c_mktsegment),
      |wo AS (
      |  SELECT c_mktsegment, count(*) AS n_without_orders
      |  FROM customer WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
      |  GROUP BY c_mktsegment)
      |SELECT coalesce(w.c_mktsegment, wo.c_mktsegment) AS c_mktsegment,
      |  coalesce(n_with_orders, 0) AS n_with_orders,
      |  coalesce(n_without_orders, 0) AS n_without_orders
      |FROM w FULL OUTER JOIN wo USING (c_mktsegment)""".stripMargin

  /** Ordered top-k (TakeOrderedAndProject): per-partition top-100 then a
    * single 100-row merge on the driver — no global sort at any scale.
    * orderkey tiebreak makes the boundary deterministic. */
  def q05TopK(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      .limit(100)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))

  val q05Sql: String =
    """SELECT o_orderkey, o_custkey, o_totalprice
      |FROM orders ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 100""".stripMargin

  /** Ranking window: top-3 customers by balance per segment.
    * One hash-partition exchange on the window key; the rank filter
    * prunes before anything else runs downstream. */
  def q06WindowRank(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("c_mktsegment"))
      .orderBy(col("c_acctbal").desc, col("c_custkey").asc)
    Tables.customer(s, dir)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select(col("c_mktsegment"), col("rn"), col("c_custkey"), col("c_acctbal"))
  }

  val q06Sql: String =
    """SELECT c_mktsegment, rn, c_custkey, c_acctbal FROM (
      |  SELECT c_mktsegment, c_custkey, c_acctbal,
      |    row_number() OVER (PARTITION BY c_mktsegment
      |                       ORDER BY c_acctbal DESC, c_custkey ASC) AS rn
      |  FROM customer) t
      |WHERE rn <= 3""".stripMargin

  /** Running-frame window: cumulative sum + lag per user over event time.
    * Sequential accumulation order is pinned by (ts_ns, event_id) so both
    * engines fold doubles identically. */
  def q07WindowRunning(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts_ns"), col("event_id"))
    Tables.events(s, dir)
      .withColumn("running_value", sum(col("value")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("prev_value", lag(col("value"), 1).over(w))
      .select(col("event_id"), col("user_id"),
        Fx.fx(col("running_value"), 2).as("running_value"),
        Fx.fx(col("value") - col("prev_value"), 2).as("delta"))
  }

  val q07Sql: String =
    s"""SELECT event_id, user_id,
      |  ${Fx.fxSql("sum(value) OVER (PARTITION BY user_id ORDER BY epoch_ns(ts), event_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)", 2)} AS running_value,
      |  ${Fx.fxSql("value - lag(value, 1) OVER (PARTITION BY user_id ORDER BY epoch_ns(ts), event_id)", 2)} AS delta
      |FROM events""".stripMargin

  /** Generator/explode: tokenize documents and count words — the classic
    * flatten. Partial agg absorbs the explosion map-side (vocab is tiny
    * next to the token stream, at any scale). */
  def q08Wordcount(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("doc_id"), explode(tokens(col("text"))).as("word"))
      .groupBy(col("word"))
      .agg(count(lit(1)).as("n"), countDistinct(col("doc_id")).as("n_docs"))

  val q08Sql: String =
    """SELECT w AS word, count(*) AS n, count(DISTINCT doc_id) AS n_docs
      |FROM (SELECT doc_id,
      |        unnest(list_filter(string_split_regex(text, '\s+'), x -> x <> '')) AS w
      |      FROM documents) t
      |GROUP BY w""".stripMargin

  /** Semi-structured extraction: JSON path into the props payload, then
    * aggregate. At scale the JSON parse is the hot loop — this stays in
    * codegen (GetJsonObject), no UDF. */
  def q09JsonExtract(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .withColumn("k", get_json_object(col("props"), "$.k").cast("int"))
      .groupBy(col("event_type"), (col("k") % 10).as("k_mod"))
      .agg(count(lit(1)).as("n"),
        (sum(floor(col("value") * 100 + lit(0.5))) / lit(100.0)).as("sum_value"))

  val q09Sql: String =
    s"""SELECT event_type, CAST(props->>'k' AS INTEGER) % 10 AS k_mod,
      |  count(*) AS n,
      |  sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) / CAST(100 AS DOUBLE) AS sum_value
      |FROM events
      |GROUP BY event_type, CAST(props->>'k' AS INTEGER) % 10""".stripMargin

  /** 30-minute tumbling-window aggregation over event time (reference E2
    * semantics on the events stream table). Bucketing is integer floor
    * math — exact on both engines; label format per the reference
    * (velocidades-medias.py:26–31). */
  def q10TimeBucket(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
      .withColumn("bucket_start", bucket30mStart(col("ts_sec")))
    ev.groupBy(col("bucket_start"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        (sum(floor(col("value") * 100 + lit(0.5))) / lit(100.0)).as("sum_value"))
      .withColumn("intervalo", interval30Label(col("bucket_start")))
      .select(col("bucket_start"), col("intervalo"), col("event_type"), col("n"), col("sum_value"))
  }

  val q10Sql: String =
    s"""SELECT bucket_start,
      |  strftime(make_timestamp(bucket_start * 1000000), '%H:%M') || '-' ||
      |    strftime(make_timestamp((bucket_start + 1800) * 1000000), '%H:%M') AS intervalo,
      |  event_type, count(*) AS n,
      |  sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) / CAST(100 AS DOUBLE) AS sum_value
      |FROM (SELECT (epoch_ns(ts) // 1000000000 // 1800) * 1800 AS bucket_start, event_type, value
      |      FROM events) t
      |GROUP BY bucket_start, event_type""".stripMargin

  /** Set operations (distinct semantics on both engines). */
  def q11SetOps(s: SparkSession, dir: String): DataFrame = {
    val custNations = Tables.customer(s, dir).select(col("c_nationkey").as("nationkey"))
    val suppNations = Tables.supplier(s, dir).select(col("s_nationkey").as("nationkey"))
    val both = custNations.intersect(suppNations).withColumn("tag", lit("both"))
    val custOnly = custNations.except(suppNations).withColumn("tag", lit("cust_only"))
    both.unionByName(custOnly).select(col("tag"), col("nationkey"))
  }

  val q11Sql: String =
    """SELECT 'both' AS tag, nationkey FROM
      |  (SELECT c_nationkey AS nationkey FROM customer
      |   INTERSECT SELECT s_nationkey FROM supplier) t1
      |UNION ALL
      |SELECT 'cust_only' AS tag, nationkey FROM
      |  (SELECT c_nationkey AS nationkey FROM customer
      |   EXCEPT SELECT s_nationkey FROM supplier) t2""".stripMargin

  /** Rollup (grouping sets): subtotals + grand total in one pass.
    * Spark expands to a single shuffle with a grouping-id column. */
  def q12Rollup(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(Fx.fx(sum(col("l_quantity")), 2).as("sum_qty"), count(lit(1)).as("n"))
      .select(
        coalesce(col("l_returnflag"), lit("ALL")).as("returnflag"),
        coalesce(col("l_linestatus"), lit("ALL")).as("linestatus"),
        col("sum_qty"), col("n"))

  val q12Sql: String =
    s"""SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
      |  coalesce(l_linestatus, 'ALL') AS linestatus,
      |  ${Fx.fxSql("sum(l_quantity)", 2)} AS sum_qty, count(*) AS n
      |FROM lineitem
      |GROUP BY ROLLUP (l_returnflag, l_linestatus)""".stripMargin

  /** Nested build → flatten round-trip (reference F1: the two-level
    * explode of EP2, SURVEY.md §2.1). collect_list+sort_array builds the
    * nested day-document shape; posexplode unnests it back with the
    * position preserved — proving Generator semantics. */
  def q13NestedFlatten(s: SparkSession, dir: String): DataFrame = {
    val nested = Tables.events(s, dir)
      .groupBy(col("user_id"))
      .agg(sort_array(collect_list(struct(col("ts_ns"), col("event_id"), col("value")))).as("evs"))
    nested.select(col("user_id"), posexplode(col("evs")).as(Seq("pos", "ev")))
      .select(col("user_id"), col("pos"), col("ev.event_id").as("event_id"),
        Fx.fx(col("ev.value"), 2).as("value"))
  }

  val q13Sql: String =
    s"""SELECT user_id,
      |  row_number() OVER (PARTITION BY user_id ORDER BY epoch_ns(ts), event_id) - 1 AS pos,
      |  event_id, ${Fx.fxSql("value", 2)} AS value
      |FROM events""".stripMargin

  /** Bloom-pruned semi-join (operators.BloomPrune): lineitem rows of
    * high-value orders, map-side pruned by a broadcast Bloom filter
    * before the exact semi-join. Oracle is the plain EXISTS — the
    * Bloom stage is output-invisible by construction. */
  def q57BloomSemi(s: SparkSession, dir: String): DataFrame =
    graft.operators.BloomPrune.semiJoin(
        Tables.lineitem(s, dir), col("l_orderkey"),
        Tables.orders(s, dir).filter(col("o_totalprice") > 150000.0),
        col("o_orderkey"),
        // sized for the selective side (~tens of k keys at sf0.1):
        // a 25 KB filter literal, not the 1 MB default — the filter
        // bytes are embedded in the plan, so oversizing bloats every
        // explain/log of the query
        expectedItems = 200000L, numBits = 200000L)
      .groupBy(col("l_returnflag"))
      .agg(Fx.fx(sum(col("l_quantity")), 2).as("sum_qty"),
        count(lit(1)).as("n"))

  val q57Sql: String =
    s"""SELECT l_returnflag, ${Fx.fxSql("sum(l_quantity)", 2)} AS sum_qty,
      |  count(*) AS n
      |FROM lineitem l
      |WHERE EXISTS (SELECT 1 FROM orders o
      |              WHERE o.o_orderkey = l.l_orderkey
      |                AND o.o_totalprice > 150000.0)
      |GROUP BY l_returnflag""".stripMargin

  /** Salted fact↔dim join (operators.SaltedJoin): lineitem ⋈ part with
    * the hot-key spread over 8 salt buckets. The salt is output-
    * invisible (every fact row joins exactly once), so the oracle is
    * the plain inner join. */
  def q58SaltedJoin(s: SparkSession, dir: String): DataFrame =
    graft.operators.SaltedJoin.inner(
        Tables.lineitem(s, dir), col("l_partkey"),
        Tables.part(s, dir), col("p_partkey"),
        saltSource = struct(col("l_orderkey"), col("l_linenumber")),
        salts = 8)
      .groupBy(col("p_brand"))
      .agg(Fx.fx(sum(col("l_extendedprice")), 2).as("revenue"),
        count(lit(1)).as("n"))

  val q58Sql: String =
    s"""SELECT p_brand, ${Fx.fxSql("sum(l_extendedprice)", 2)} AS revenue,
      |  count(*) AS n
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |GROUP BY p_brand""".stripMargin

  /** Full outer join with BOTH dangling sides exercised (customer ids ≡
    * 0 mod 3 vs order-aggregate ids ≡ 0 mod 5): unmatched customers keep
    * null order counts, unmatched order groups keep null segments. */
  def q92FullOuter(s: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(s, dir)
      .filter(col("c_custkey") % 3 === 0)
      .select(col("c_custkey"), col("c_mktsegment"))
    val ords = Tables.orders(s, dir)
      .filter(col("o_custkey") % 5 === 0)
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n_orders"),
        (sum(floor(col("o_totalprice") * 100 + lit(0.5))) / lit(100.0)).as("sum_price"))
    cust.join(ords, col("c_custkey") === col("o_custkey"), "full_outer")
      .select(
        coalesce(col("c_custkey"), col("o_custkey")).as("custkey"),
        col("c_mktsegment"), col("n_orders"), col("sum_price"))
  }

  val q92Sql: String =
    s"""WITH c AS (
      |  SELECT c_custkey, c_mktsegment FROM customer WHERE c_custkey % 3 = 0),
      |o AS (
      |  SELECT o_custkey, count(*) AS n_orders,
      |    sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) / CAST(100 AS DOUBLE) AS sum_price
      |  FROM orders WHERE o_custkey % 5 = 0 GROUP BY o_custkey)
      |SELECT coalesce(c_custkey, o_custkey) AS custkey,
      |  c_mktsegment, n_orders, sum_price
      |FROM c FULL OUTER JOIN o ON c_custkey = o_custkey""".stripMargin

  /** Data-quality audit (operators.Expectations): four contract rules
    * over lineitem — two range checks, a null check, and a referential
    * check composed as a broadcast left join producing a row-local
    * boolean — counted in ONE scan. */
  def q96Expectations(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Expectations.{audit, Rule}
    val pk = broadcast(Tables.part(s, dir).select(col("p_partkey")).distinct())
    val li = Tables.lineitem(s, dir)
      .join(pk, col("l_partkey") === col("p_partkey"), "left")
    audit(li, Seq(
      Rule("qty_range", col("l_quantity").between(1, 45)),
      Rule("discount_cap", col("l_discount") <= 0.05),
      Rule("shipdate_set", col("l_shipdate").isNotNull),
      Rule("part_exists", col("p_partkey").isNotNull)))
  }

  val q96Sql: String =
    """WITH li AS (
      |  SELECT l.*, p.p_partkey AS pk
      |  FROM lineitem l LEFT JOIN (SELECT DISTINCT p_partkey FROM part) p
      |    ON l.l_partkey = p.p_partkey),
      |a AS (
      |  SELECT count(*) AS n_rows,
      |    count(*) FILTER (WHERE NOT coalesce(l_quantity BETWEEN 1 AND 45, false)) AS v_qty,
      |    count(*) FILTER (WHERE NOT coalesce(l_discount <= 0.05, false)) AS v_disc,
      |    count(*) FILTER (WHERE NOT coalesce(l_shipdate IS NOT NULL, false)) AS v_ship,
      |    count(*) FILTER (WHERE NOT coalesce(pk IS NOT NULL, false)) AS v_pk
      |  FROM li)
      |SELECT 'qty_range' AS rule, v_qty AS n_violations, n_rows FROM a
      |UNION ALL SELECT 'discount_cap', v_disc, n_rows FROM a
      |UNION ALL SELECT 'shipdate_set', v_ship, n_rows FROM a
      |UNION ALL SELECT 'part_exists', v_pk, n_rows FROM a""".stripMargin

  /** q118: schema-evolution union — two "generations" of the orders
    * feed with drifted column sets (an old extract lacking
    * `o_orderpriority`/`o_orderstatus`, a new one lacking
    * `o_totalprice`) merged with `unionByName(allowMissingColumns =
    * true)`: absent columns null-pad per branch, matching is by NAME
    * (positional union would silently misalign — the classic pipeline
    * bug this operator exists to prevent). Scale: a union is a no-op
    * plan node — no shuffle, each branch scans with its own pruned
    * column set. Oracle spells out the same null padding. */
  def q118UnionEvolve(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
    val cutoff = lit("1998-01-01 00:00:00").cast("timestamp")
    val gen1 = o.where(col("o_orderdate") < cutoff)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
    val gen2 = o.where(col("o_orderdate") >= cutoff)
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
        col("o_orderpriority"))
    gen1.unionByName(gen2, allowMissingColumns = true)
  }

  val q118Sql: String =
    """SELECT o_orderkey, o_custkey, o_totalprice,
      |  CAST(NULL AS VARCHAR) AS o_orderstatus,
      |  CAST(NULL AS VARCHAR) AS o_orderpriority
      |FROM orders WHERE o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
      |UNION ALL
      |SELECT o_orderkey, o_custkey, CAST(NULL AS DOUBLE) AS o_totalprice,
      |  o_orderstatus, o_orderpriority
      |FROM orders WHERE o_orderdate >= TIMESTAMP '1998-01-01 00:00:00'""".stripMargin

  /** q119: k-anonymity suppression — emit only rows whose
    * quasi-identifier combination (c_mktsegment, c_nationkey) occurs at
    * least k=10 times, tagging each with its cohort size. The privacy
    * primitive for training-data release: rare attribute combinations
    * identify individuals, so they are suppressed wholesale. Shape: one
    * unordered window count (per-key count, no sort buffer) = ONE hash
    * exchange on the quasi-identifier; no groupBy+join round trip. */
  def q119KAnonymity(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("c_mktsegment"), col("c_nationkey"))
    Tables.customer(s, dir)
      .withColumn("cohort_n", count(lit(1)).over(w))
      .where(col("cohort_n") >= 10)
      .select(col("c_custkey"), col("c_mktsegment"), col("c_nationkey"),
        col("cohort_n"))
  }

  val q119Sql: String =
    """SELECT c_custkey, c_mktsegment, c_nationkey, cohort_n FROM (
      |  SELECT c_custkey, c_mktsegment, c_nationkey,
      |    count(*) OVER (PARTITION BY c_mktsegment, c_nationkey) AS cohort_n
      |  FROM customer)
      |WHERE cohort_n >= 10""".stripMargin

  val queries: Map[String, Q] = Map(
    "q118_union_evolve"   -> q118UnionEvolve,
    "q119_k_anonymity"    -> q119KAnonymity,
    "q96_expectations"    -> q96Expectations,
    "q92_full_outer"      -> q92FullOuter,
    "q57_bloom_semi"      -> q57BloomSemi,
    "q58_salted_join"     -> q58SaltedJoin,
    "q01_pricing_summary" -> q01PricingSummary,
    "q02_filter_pushdown" -> q02FilterPushdown,
    "q03_join_revenue"    -> q03JoinRevenue,
    "q04_semi_anti"       -> q04SemiAnti,
    "q05_topk"            -> q05TopK,
    "q06_window_rank"     -> q06WindowRank,
    "q07_window_running"  -> q07WindowRunning,
    "q08_wordcount"       -> q08Wordcount,
    "q09_json_extract"    -> q09JsonExtract,
    "q10_time_bucket"     -> q10TimeBucket,
    "q11_setops"          -> q11SetOps,
    "q12_rollup"          -> q12Rollup,
    "q13_nested_flatten"  -> q13NestedFlatten,
  )

  val oracles: Map[String, String] = Map(
    "q118_union_evolve"   -> q118Sql,
    "q119_k_anonymity"    -> q119Sql,
    "q96_expectations"    -> q96Sql,
    "q92_full_outer"      -> q92Sql,
    "q57_bloom_semi"      -> q57Sql,
    "q58_salted_join"     -> q58Sql,
    "q01_pricing_summary" -> q01Sql,
    "q02_filter_pushdown" -> q02Sql,
    "q03_join_revenue"    -> q03Sql,
    "q04_semi_anti"       -> q04Sql,
    "q05_topk"            -> q05Sql,
    "q06_window_rank"     -> q06Sql,
    "q07_window_running"  -> q07Sql,
    "q08_wordcount"       -> q08Sql,
    "q09_json_extract"    -> q09Sql,
    "q10_time_bucket"     -> q10Sql,
    "q11_setops"          -> q11Sql,
    "q12_rollup"          -> q12Sql,
    "q13_nested_flatten"  -> q13Sql,
  )
}
