package graft.queries

import graft.functions.Fx
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.olhovivo.SpeedPipeline
import graft.olhovivo.SpeedPipeline.SpeedConf

/** The reference's analytical pipeline (EP3: E2/W1/W2/P1–P4/E3–E7/A1/L1,
  * SURVEY.md §2.1) exercised through graft.olhovivo.SpeedPipeline — the
  * actual library code — over a deterministic positions view derived
  * from the driver `events` table (user→vehicle, event-time→timestamp,
  * value→coordinates).
  *
  * The DuckDB oracles reimplement the identical dataflow in SQL from a
  * shared CTE prefix; rounding discipline per queries.Relational.
  */
object OlhoVivo {

  type Q = (SparkSession, String) => DataFrame

  /** Deterministic positions view over events. Kept 1:1 with the
    * `posCte` SQL below. */
  def posicoesFromEvents(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir).select(
      col("event_id"),
      col("user_id").cast("string").as("prefixo_veiculo"),
      concat(lit("L"), (col("user_id") % 10).cast("string")).as("letreiro"),
      (col("user_id") % 10).cast("int").as("codigo_linha"),
      (col("user_id") % 2 + 1).cast("int").as("sentido_linha"),
      (col("user_id") % 3 === 0).as("acessibilidade"),
      col("ts_sec").as("timestamp"),
      (lit(-23.55) + col("value") / 1000.0).as("py"),
      (lit(-46.63) + col("value") / 1500.0).as("px"))

  private[queries] val posCte: String =
    s"""WITH pos AS (
      |  SELECT event_id,
      |    CAST(user_id AS VARCHAR) AS prefixo_veiculo,
      |    'L' || CAST(user_id % 10 AS VARCHAR) AS letreiro,
      |    CAST(user_id % 10 AS INTEGER) AS codigo_linha,
      |    CAST(user_id % 2 + 1 AS INTEGER) AS sentido_linha,
      |    (user_id % 3 = 0) AS acessibilidade,
      |    epoch_ns(ts) // 1000000000 AS "timestamp",
      |    -23.55 + value / 1000.0 AS py,
      |    -46.63 + value / 1500.0 AS px
      |  FROM events),
      |lagged AS (
      |  SELECT *,
      |    lag(px) OVER w AS px_anterior,
      |    lag(py) OVER w AS py_anterior,
      |    lag("timestamp") OVER w AS timestamp_anterior
      |  FROM pos
      |  WINDOW w AS (PARTITION BY prefixo_veiculo ORDER BY "timestamp", event_id)),
      |hops AS (
      |  SELECT *, "timestamp" - timestamp_anterior AS tempo,
      |    round(2 * 6371000 * atan2(
      |      sqrt(pow(sin(radians(py - py_anterior) / 2), 2)
      |         + cos(radians(py_anterior)) * cos(radians(py))
      |         * pow(sin(radians(px - px_anterior) / 2), 2)),
      |      sqrt(1 - (pow(sin(radians(py - py_anterior) / 2), 2)
      |         + cos(radians(py_anterior)) * cos(radians(py))
      |         * pow(sin(radians(px - px_anterior) / 2), 2)))), 2) AS distancia
      |  FROM lagged
      |  WHERE px_anterior IS NOT NULL),
      |clean AS (
      |  SELECT *,
      |    CAST(make_timestamp("timestamp" * 1000000) AS DATE) AS data,
      |    strftime(make_timestamp(("timestamp" // 1800) * 1800 * 1000000), '%H:%M')
      |      || '-' ||
      |    strftime(make_timestamp((("timestamp" // 1800) * 1800 + 1800) * 1000000), '%H:%M')
      |      AS intervalo
      |  FROM hops
      |  WHERE tempo > 0 AND tempo <= 600
      |    AND NOT (distancia / tempo > 33))
      |""".stripMargin

  /** E2+W2+P1+P2+E3–E6+P3: the cleaned per-hop speeds. */
  def q20SpeedHops(s: SparkSession, dir: String): DataFrame =
    SpeedPipeline.hops(posicoesFromEvents(s, dir),
        SpeedConf(), orderTiebreak = Seq(col("event_id")))
      .select(col("prefixo_veiculo"), col("event_id"), col("data"), col("intervalo"),
        col("tempo"), col("distancia"),
        Fx.fx(col("velocidade_media"), 4).as("velocidade_media"))

  val q20Sql: String = posCte +
    s"""SELECT prefixo_veiculo, event_id, data, intervalo, tempo, distancia,
      |  ${Fx.fxSql("distancia / tempo", 4)} AS velocidade_media
      |FROM clean""".stripMargin

  /** A1+E7: hash aggregate on the reference keys (minus the two constant
    * terminal columns, which the events mapping doesn't model) with the
    * algebraic speed recompute. */
  def q21SpeedAgg(s: SparkSession, dir: String): DataFrame = {
    val keys = Seq("data", "intervalo", "letreiro", "codigo_linha",
      "sentido_linha", "prefixo_veiculo", "acessibilidade")
    val clean = SpeedPipeline.hops(posicoesFromEvents(s, dir),
      SpeedConf(), orderTiebreak = Seq(col("event_id")))
    SpeedPipeline.aggregate(clean, keys)
      .select(
        keys.map(col) ++ Seq(
          Fx.fx(col("px"), 4).as("px"),
          Fx.fx(col("py"), 4).as("py"),
          Fx.fx(col("distancia"), 2).as("distancia"),
          col("tempo"),
          Fx.fx(col("velocidade_media"), 4).as("velocidade_media")): _*)
  }

  val q21Sql: String = posCte +
    s"""SELECT data, intervalo, letreiro, codigo_linha, sentido_linha,
      |  prefixo_veiculo, acessibilidade,
      |  ${Fx.fxSql("avg(px)", 4)} AS px, ${Fx.fxSql("avg(py)", 4)} AS py,
      |  ${Fx.fxSql("sum(distancia)", 2)} AS distancia,
      |  CAST(sum(tempo) AS BIGINT) AS tempo,
      |  ${Fx.fxSql("sum(distancia) / sum(tempo)", 4)} AS velocidade_media
      |FROM clean
      |GROUP BY data, intervalo, letreiro, codigo_linha, sentido_linha,
      |  prefixo_veiculo, acessibilidade""".stripMargin

  /** P4: per-observation slow points (velocidade < 1.4 m/s). */
  def q22SlowPoints(s: SparkSession, dir: String): DataFrame = {
    val clean = SpeedPipeline.hops(posicoesFromEvents(s, dir),
      SpeedConf(), orderTiebreak = Seq(col("event_id")))
    SpeedPipeline.slowPoints(clean)
      .select(col("prefixo_veiculo"), col("event_id"), col("data"), col("intervalo"),
        Fx.fx(col("px"), 6).as("px"), Fx.fx(col("py"), 6).as("py"),
        col("tempo"), col("distancia"),
        Fx.fx(col("velocidade_media"), 4).as("velocidade_media"))
  }

  val q22Sql: String = posCte +
    s"""SELECT prefixo_veiculo, event_id, data, intervalo,
      |  ${Fx.fxSql("px", 6)} AS px, ${Fx.fxSql("py", 6)} AS py, tempo, distancia,
      |  ${Fx.fxSql("distancia / tempo", 4)} AS velocidade_media
      |FROM clean WHERE distancia / tempo < 1.4""".stripMargin

  /** The acessiveis branch: 30-min mean positions + accessibility flag,
    * derived from the same aggregate as q21 (plan reuse per the
    * reference, velocidades:146/166). */
  def q23Acessiveis(s: SparkSession, dir: String): DataFrame = {
    val keys = Seq("data", "intervalo", "letreiro", "codigo_linha",
      "sentido_linha", "prefixo_veiculo", "acessibilidade")
    val clean = SpeedPipeline.hops(posicoesFromEvents(s, dir),
      SpeedConf(), orderTiebreak = Seq(col("event_id")))
    SpeedPipeline.acessiveis(SpeedPipeline.aggregate(clean, keys), keys)
      .select(
        col("data"), col("intervalo"), col("letreiro"), col("codigo_linha"),
        col("sentido_linha"), col("prefixo_veiculo"),
        Fx.fx(col("px"), 4).as("px"), Fx.fx(col("py"), 4).as("py"),
        col("acessibilidade"))
  }

  val q23Sql: String = posCte +
    s"""SELECT data, intervalo, letreiro, codigo_linha, sentido_linha,
      |  prefixo_veiculo,
      |  ${Fx.fxSql("avg(px)", 4)} AS px, ${Fx.fxSql("avg(py)", 4)} AS py, acessibilidade
      |FROM clean
      |GROUP BY data, intervalo, letreiro, codigo_linha, sentido_linha,
      |  prefixo_veiculo, acessibilidade""".stripMargin

  /** L1: the strict-reference ordered truncate (velocidades:97–98) as a
    * TakeOrderedAndProject — per-partition top-n, no global sort. */
  def q24StrictLimit(s: SparkSession, dir: String): DataFrame =
    posicoesFromEvents(s, dir)
      .orderBy(col("prefixo_veiculo"), col("timestamp"), col("event_id"))
      .limit(1000)
      .select(col("event_id"), col("prefixo_veiculo"), col("timestamp"))

  val q24Sql: String =
    """SELECT event_id, CAST(user_id AS VARCHAR) AS prefixo_veiculo,
      |  epoch_ns(ts) // 1000000000 AS "timestamp"
      |FROM events
      |ORDER BY prefixo_veiculo, "timestamp", event_id LIMIT 1000""".stripMargin

  val queries: Map[String, Q] = Map(
    "q20_speed_hops"   -> q20SpeedHops,
    "q21_speed_agg"    -> q21SpeedAgg,
    "q22_slow_points"  -> q22SlowPoints,
    "q23_acessiveis"   -> q23Acessiveis,
    "q24_strict_limit" -> q24StrictLimit,
  )

  val oracles: Map[String, String] = Map(
    "q20_speed_hops"   -> q20Sql,
    "q21_speed_agg"    -> q21Sql,
    "q22_slow_points"  -> q22Sql,
    "q23_acessiveis"   -> q23Sql,
    "q24_strict_limit" -> q24Sql,
  )
}
