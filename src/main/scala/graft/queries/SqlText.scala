package graft.queries

import graft.functions.Fx
import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.Tables

/** SQL-TEXT entry path: gate queries submitted as SQL strings through
  * `spark.sql` over registered temp views — proving the engine's
  * parser/analyzer/registry surface end-to-end, including the graft
  * EXTENSION functions (`haversine_m`, `dot_product`) resolving through
  * the session's function registry from SQL text. q16 (TPC-H Q3) covers
  * the plain-ANSI join path; these cover windows and extension
  * functions. The plans these texts analyze into are the same Catalyst
  * plans the DataFrame twins build — same pushdown, same codegen — so
  * the scale posture is inherited, not re-argued.
  */
object SqlText {

  type Q = (SparkSession, String) => DataFrame

  /** The haversine pipeline's hop distance, as SQL text through the
    * registered `haversine_m` extension function (a named WINDOW clause
    * exercises the parser's window path too). Oracle: the shared posCte
    * dataflow, whose `hops` CTE inlines the identical formula
    * (operation order matches graft.functions.Haversine.compute — see
    * q20's green hash for the standing proof). */
  def q100SqlHaversine(s: SparkSession, dir: String): DataFrame = {
    OlhoVivo.posicoesFromEvents(s, dir).createOrReplaceTempView("posicoes")
    s.sql(
      """WITH lagged AS (
        |  SELECT prefixo_veiculo, event_id, py, px, `timestamp`,
        |    lag(py) OVER w AS py_prev,
        |    lag(px) OVER w AS px_prev
        |  FROM posicoes
        |  WINDOW w AS (PARTITION BY prefixo_veiculo ORDER BY `timestamp`, event_id))
        |SELECT prefixo_veiculo, event_id,
        |  round(haversine_m(py_prev, px_prev, py, px), 2) AS dist_m
        |FROM lagged WHERE px_prev IS NOT NULL""".stripMargin)
  }

  val q100Sql: String = OlhoVivo.posCte +
    """SELECT prefixo_veiculo, event_id, distancia AS dist_m FROM hops""".stripMargin

  /** q07's running window as SQL text: cumulative sum + lag per user,
    * accumulation order pinned by (ts_ns, event_id) so both engines
    * fold doubles identically. */
  def q101SqlWindow(s: SparkSession, dir: String): DataFrame = {
    Tables.events(s, dir).createOrReplaceTempView("events")
    s.sql(
      s"""SELECT event_id, user_id,
        |  ${Fx.fxSqlPortable("sum(value) OVER (PARTITION BY user_id ORDER BY ts_ns, event_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)", 2)} AS running_value,
        |  ${Fx.fxSqlPortable("value - lag(value, 1) OVER (PARTITION BY user_id ORDER BY ts_ns, event_id)", 2)}
        |    AS delta
        |FROM events""".stripMargin)
  }

  val q101Sql: String =
    s"""SELECT event_id, user_id,
      |  ${Fx.fxSqlPortable("sum(value) OVER (PARTITION BY user_id ORDER BY epoch_ns(ts), event_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)", 2)} AS running_value,
      |  ${Fx.fxSqlPortable("value - lag(value, 1) OVER (PARTITION BY user_id ORDER BY epoch_ns(ts), event_id)", 2)} AS delta
      |FROM events""".stripMargin

  /** The similarity hot loop through SQL text: the registered
    * `dot_product` codegen expression scoring a broadcast query set
    * against a corpus slice. Oracle mirrors the fold with the same
    * sequential element order (VectorOps.dotSql's standing parity). */
  def q102SqlDot(s: SparkSession, dir: String): DataFrame = {
    Tables.embeddings(s, dir).createOrReplaceTempView("embeddings")
    s.sql(
      s"""WITH q AS (SELECT vec_id AS query_id, embedding AS qvec
        |           FROM embeddings WHERE vec_id < 4),
        |c AS (SELECT vec_id AS corpus_id, embedding AS cvec
        |      FROM embeddings WHERE vec_id < 500)
        |SELECT query_id, corpus_id,
        |  ${Fx.fxSqlPortable("dot_product(qvec, cvec)", 4)} AS dot
        |FROM q JOIN c ON corpus_id <> query_id""".stripMargin)
  }

  val q102Sql: String =
    s"""WITH q AS (SELECT vec_id AS query_id, embedding AS qvec
       |           FROM embeddings WHERE vec_id < 4),
       |c AS (SELECT vec_id AS corpus_id, embedding AS cvec
       |      FROM embeddings WHERE vec_id < 500)
       |SELECT query_id, corpus_id,
       |  ${Fx.fxSql(VectorOps.dotSql("qvec", "cvec"), 4)} AS dot
       |FROM q JOIN c ON corpus_id <> query_id""".stripMargin

  /** TPC-H Q5 (local-supplier volume): the 6-table join through the
    * parser/analyzer — ONE SQL text serves both engines verbatim.
    * Revenue is exact integer fixed-point (price cents × discount
    * complement in percent → 10^-4 dollar units, summed as BIGINT), the
    * q93 trick: float-sum accumulation order can differ across
    * engines/partitionings, integer sums cannot. Catalyst broadcasts
    * region/nation/supplier and shuffles only the orders⋈lineitem spine
    * — the same plan the DataFrame twin would build. */
  def q115SqlQ5(s: SparkSession, dir: String): DataFrame = {
    Seq("customer", "orders", "lineitem", "supplier", "nation", "region")
      .foreach(t => Tables.table(s, dir, t).createOrReplaceTempView(t))
    s.sql(q115Sql)
  }

  val q115Sql: String =
    """SELECT n_name,
      |  CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT) *
      |      (100 - CAST(round(l_discount * 100) AS BIGINT))) AS BIGINT) AS revenue_e4,
      |  count(*) AS n_items
      |FROM customer
      |JOIN orders   ON c_custkey = o_custkey
      |JOIN lineitem ON l_orderkey = o_orderkey
      |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      |JOIN nation   ON s_nationkey = n_nationkey
      |JOIN region   ON n_regionkey = r_regionkey
      |WHERE r_name = 'ASIA'
      |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
      |GROUP BY n_name""".stripMargin

  val queries: Map[String, Q] = Map(
    "q100_sql_haversine" -> q100SqlHaversine,
    "q101_sql_window"    -> q101SqlWindow,
    "q102_sql_dot"       -> q102SqlDot,
    "q115_sql_q5"        -> q115SqlQ5,
  )

  val oracles: Map[String, String] = Map(
    "q100_sql_haversine" -> q100Sql,
    "q101_sql_window"    -> q101Sql,
    "q102_sql_dot"       -> q102Sql,
    "q115_sql_q5"        -> q115Sql,
  )
}
