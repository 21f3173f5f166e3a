package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.PageRank

/** Graph-analytics coverage: link-rank over a co-occurrence graph.
  * The graph is derived from the star schema itself — parts are linked
  * when they appear in the same order (the classic co-purchase graph),
  * so the gate needs no extra fixture and the edge build exercises the
  * self-join + dedup shape a real link graph extraction has.
  *
  * The oracle mirrors the FIXED-iteration integer fixed-point contract
  * of [[graft.operators.PageRank]] as chained CTEs — one per sweep —
  * so every rank hash-matches exactly (integer math end to end).
  */
object GraphOps {

  type Q = (SparkSession, String) => DataFrame

  private val Iterations = 3
  private val Scale = 1000000L
  private val Base = 150000L // Scale * (100-85)/100

  /** Hub-key fan-out cap for the co-occurrence self-join: an order
    * contributes pairs quadratically in its item count, so ONE hub key
    * (a synthetic mega-order, a crawl's link farm) squares into a
    * straggler partition at 100× data. Keep the C lowest part keys per
    * order (deterministic, oracle-mirrorable) — the standard
    * within-basket truncation for co-occurrence graphs — bounding any
    * key's contribution at C·(C−1) pairs. 64 is far above this data's
    * ≤7 items/order (the testdata edge set is bit-unchanged) while
    * capping a worst-case key at ~4k pairs instead of millions. */
  private[queries] val MaxItemsPerOrder = 64

  /** `(k, l_partkey)` distinct order items, capped per order at
    * [[MaxItemsPerOrder]] by lowest part key. The row_number runs on the
    * same `k` hash partitioning the self-join needs — no extra
    * exchange, one sort. */
  private[graft] def cappedItems(li: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("k")).orderBy(col("l_partkey"))
    li.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= MaxItemsPerOrder)
      .drop("__rn")
  }

  /** Distinct part→part co-occurrence edges (symmetric by
    * construction: both directions appear), hub-capped per order. */
  private[graft] def coEdges(s: SparkSession, dir: String): DataFrame = {
    val li = cappedItems(Tables.lineitem(s, dir)
      .select(col("l_orderkey").as("k"), col("l_partkey")).distinct())
    li.select(col("k"), col("l_partkey").as("src"))
      .join(li.select(col("k"), col("l_partkey").as("dst")), Seq("k"))
      .filter(col("src") =!= col("dst"))
      .select(col("src"), col("dst")).distinct()
  }

  def q110PageRank(s: SparkSession, dir: String): DataFrame = {
    val scope = graft.CacheScope.scoped()
    scope.materializeAndRelease(
      PageRank.run(coEdges(s, dir), "src", "dst", Iterations,
        scale = Scale, scope = Some(scope)))
  }

  val q110Sql: String = {
    val sb = new StringBuilder
    sb ++= s"""WITH li0 AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
      |li AS (SELECT l_orderkey, l_partkey FROM li0
      |       QUALIFY row_number() OVER (PARTITION BY l_orderkey
      |                                  ORDER BY l_partkey) <= $MaxItemsPerOrder),
      |e AS (SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
      |      FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey
      |      WHERE a.l_partkey <> b.l_partkey),
      |deg AS (SELECT src, count(*) AS outdeg FROM e GROUP BY src),
      |n AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
      |r0 AS (SELECT node, ${Scale}::BIGINT AS pr FROM n)""".stripMargin
    for (i <- 1 to Iterations) {
      sb ++= s""",
        |c$i AS (SELECT e.dst AS node, CAST(sum((85 * r.pr) // (100 * d.outdeg)) AS BIGINT) AS in_c
        |       FROM e JOIN r${i - 1} r ON e.src = r.node
        |              JOIN deg d ON e.src = d.src
        |       GROUP BY e.dst),
        |r$i AS (SELECT n.node, CAST($Base + coalesce(c.in_c, 0) AS BIGINT) AS pr
        |       FROM n LEFT JOIN c$i c ON c.node = n.node)""".stripMargin
    }
    sb ++= s"\nSELECT node, pr FROM r$Iterations"
    sb.toString
  }

  val queries: Map[String, Q] = Map(
    "q110_pagerank" -> q110PageRank
  )

  val oracles: Map[String, String] = Map(
    "q110_pagerank" -> q110Sql
  )
}
