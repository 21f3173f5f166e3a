package graft.queries

import graft.functions.Fx
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Cluster-scale physical-layout techniques as first-class gate entries:
  * bucketed (pre-partitioned) co-located joins and count-min frequency
  * sketches. Both address the same 100 TB question — how to avoid paying
  * a full corpus shuffle for every join/count — from opposite ends:
  * bucketing moves the shuffle to WRITE time once so every later join is
  * exchange-free, and the count-min sketch replaces a full per-key
  * aggregation consumer with a bounded d×w model that answers frequency
  * queries within a proven error bound.
  *
  * Oracle strategy: q103's results are layout-independent (same rows as
  * the plain join — the oracle IS the plain join); q104 follows the
  * q90/q91 sketch pattern — the COMPARED columns are the exact counts
  * plus a `within_bound` boolean checking the sketch's error contract,
  * so the engine-specific estimates never need to hash-match DuckDB.
  */
object ScaleOps {

  type Q = (SparkSession, String) => DataFrame

  // ------------------------------------------- q103 bucketed co-located join

  /** Write both join sides bucketed by the join key (the one range/hash
    * shuffle, paid at layout time), then run join + per-key aggregate
    * reading the bucketed tables: the scan's bucket clustering satisfies
    * the join's and the aggregate's distribution requirements, so the
    * whole chain is EXCHANGE-FREE (plan-asserted in ScaleOpsSpec with
    * broadcast disabled). At 100 TB this is the canonical fact-table
    * layout: every daily join against the bucketed key costs zero
    * shuffle instead of re-shuffling the corpus.
    *
    * The bucketed tables are written ONCE per (session, source dir) —
    * exactly a real deployment's economics, where the layout shuffle is
    * paid at ingest and amortized over every downstream consumer — into
    * a temp dir with dir-keyed catalog names (shared-session safe via
    * the lock; repeat calls, e.g. bench attempts, reuse the layout just
    * like the nightly jobs reusing the bucketed fact table). 32 buckets
    * here (core count), `corpus_bytes / target_partition_bytes` on a
    * real deployment.
    *
    * NOTE the build is EAGER at DataFrame construction — analysis needs
    * the catalog tables to exist — so the first `fn(spark, dir)` per
    * dir pays the layout write even if the caller only wants the
    * schema/plan (SparkEntry.artifactEntries flags this for harnesses).
    */
  def q103BucketedJoin(s: SparkSession, dir: String): DataFrame = {
    val tag = {
      // stable per source dir; sign-free hex so names stay identifiers
      val h = scala.util.hashing.MurmurHash3.stringHash(dir)
      f"${h & 0xffffffffL}%08x"
    }
    val liName = s"graft_b_lineitem_$tag"
    val ordName = s"graft_b_orders_$tag"
    ScaleOps.synchronized {
      if (!s.catalog.tableExists(liName) || !s.catalog.tableExists(ordName)) {
        s.sql(s"DROP TABLE IF EXISTS $liName")
        s.sql(s"DROP TABLE IF EXISTS $ordName")
        val base = graft.TempArtifacts.dir("graft_bucketed")
        // bucket only the columns this consumer reads — the layout
        // shuffle is identical, the write is ~5× smaller
        Tables.lineitem(s, dir)
          .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount"))
          .write.bucketBy(32, "l_orderkey").sortBy("l_orderkey")
          .option("path", s"$base/lineitem").saveAsTable(liName)
        Tables.orders(s, dir)
          .select(col("o_orderkey"), col("o_orderdate"), col("o_orderpriority"))
          .write.bucketBy(32, "o_orderkey").sortBy("o_orderkey")
          .option("path", s"$base/orders").saveAsTable(ordName)
      }
    }
    val li = s.table(liName)
    val ord = s.table(ordName).filter(col("o_orderpriority") === "1-URGENT")
    // exact decimal arithmetic: per-order sums are small (2–7 items), so
    // double accumulation-order noise lands ON the half-cent boundary a
    // few times per thousand groups — decimal is exact on both engines,
    // the rounded result casts back to double identically
    val revenue = sum(col("l_extendedprice").cast("decimal(18,4)") *
      (lit(1).cast("decimal(18,4)") - col("l_discount").cast("decimal(18,4)")))
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderkey"), col("o_orderdate"))
      .agg(
        round(revenue, 2).cast("double").as("revenue"),
        count(lit(1)).as("n_items"))
  }

  val q103Sql: String =
    """SELECT o_orderkey, o_orderdate,
      |  CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,4)) *
      |    (1 - CAST(l_discount AS DECIMAL(18,4)))), 2) AS DOUBLE) AS revenue,
      |  count(*) AS n_items
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |WHERE o_orderpriority = '1-URGENT'
      |GROUP BY o_orderkey, o_orderdate""".stripMargin

  // ------------------------------------------- q104 count-min heavy hitters

  /** Count-min sketch depth (independent hash rows) and width (buckets
    * per row). Overcount bound: est − exact ≤ ⌈e/w · N⌉ with failure
    * probability ≤ (collision-mass/bound)^d per key (Markov per row,
    * independent rows) — at these settings < 1e-5 across every testdata
    * SF, and deterministic for fixed seeds/data once it holds. */
  private val CmsDepth = 6
  private val CmsWidth = 8192

  /** Per-key frequency via a count-min sketch, verified against the
    * exact counts. The sketch is ONE corpus pass: each row fans out to
    * `d` (seed, bucket) cells (bucket = xxhash64(key, seed) mod w) and a
    * single partial-merged groupBy builds the d×w cell-count model —
    * bounded by d·w regardless of corpus size, the property that lets a
    * 100 TB deployment keep running frequency estimates where exact
    * per-key counts would be another full shuffle per consumer. Probing
    * broadcasts the tiny cell table back onto the keys; est(key) =
    * min over seeds of its cell count (never under, over by ≤ e/w·N).
    *
    * Compared columns are the exact counts + the bound check; the
    * estimates themselves stay inside the boolean (q90/q91 pattern).
    */
  def q104CountMin(s: SparkSession, dir: String): DataFrame = {
    val keyed = Tables.lineitem(s, dir).select(col("l_suppkey"))
    def cells(key: org.apache.spark.sql.Column) = array((0 until CmsDepth).map { i =>
      struct(lit(i).as("seed"),
        pmod(xxhash64(key, lit(i)), lit(CmsWidth.toLong)).as("bucket"))
    }: _*)
    val sketch = keyed
      .select(explode(cells(col("l_suppkey"))).as("sb"))
      .groupBy(col("sb.seed").as("seed"), col("sb.bucket").as("bucket"))
      .agg(count(lit(1)).as("cell_cnt"))
    val exact = keyed.groupBy(col("l_suppkey")).agg(count(lit(1)).as("exact_cnt"))
    // N = Σ exact_cnt — a re-aggregate of the 1000-row exact counts (the
    // shuffle is exchange-reused), NOT a third corpus scan
    val total = exact.agg(sum(col("exact_cnt")).as("n_total"))
    val probes = exact.select(col("l_suppkey"), col("exact_cnt"),
      explode(cells(col("l_suppkey"))).as("sb"))
    probes
      .join(broadcast(sketch),
        probes("sb.seed") === sketch("seed") && probes("sb.bucket") === sketch("bucket"))
      .groupBy(col("l_suppkey"), col("exact_cnt"))
      .agg(min(col("cell_cnt")).as("est"))
      .crossJoin(broadcast(total))
      .select(col("l_suppkey"), col("exact_cnt"),
        (col("est") >= col("exact_cnt") &&
          col("est") - col("exact_cnt") <= ceil(lit(math.E) * col("n_total") / lit(CmsWidth)))
          .as("within_bound"))
  }

  val q104Sql: String =
    """SELECT l_suppkey, count(*) AS exact_cnt, TRUE AS within_bound
      |FROM lineitem GROUP BY l_suppkey""".stripMargin

  val queries: Map[String, Q] = Map(
    "q103_bucketed_join" -> q103BucketedJoin,
    "q104_count_min"     -> q104CountMin,
  )

  val oracles: Map[String, String] = Map(
    "q103_bucketed_join" -> q103Sql,
    "q104_count_min"     -> q104Sql,
  )
}
