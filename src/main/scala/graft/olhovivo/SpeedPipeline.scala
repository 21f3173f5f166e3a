package graft.olhovivo

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.Portable

/** EP3 — the reference's analytical core (etl-olho-vivo-velocidades-
  * medias.py:60–173): per-vehicle hop speeds, slow points, aggregated
  * speeds and accessibility, with every cleaning rule and pandas parity
  * trap from SURVEY.md §2.2 made explicit.
  *
  * Plan shape at scale: exactly two wide exchanges — one hash partition
  * on `prefixo_veiculo` for the lag window (fleet ≈ 13–15k vehicles, no
  * skew pathology), one on the 9 aggregation keys. Everything between
  * pipelines inside whole-stage codegen; haversine is a composed builtin
  * expression tree, not a UDF (the reference's `df.apply` hot spot
  * dissolves into codegen — SURVEY.md §4).
  */
object SpeedPipeline {

  /** Reference magic numbers, each with its file:line provenance. */
  case class SpeedConf(
      staleGapSec: Long = 600,        // velocidades:112 (README.md:26: >10 min gap)
      maxSpeedMs: Double = 33.0,      // velocidades:127 (README says 33.33; code wins)
      slowSpeedMs: Double = 1.4,      // velocidades:137 (README says 1.389; code wins)
      strictReference: Boolean = false, // reproduce pandas-exact behavior
      limitRows: Option[Int] = None)  // velocidades:97–98 debug truncate ("TEMPORARIO")

  object SpeedConf {
    /** Bit-parity with the deployed reference, debug truncate included. */
    val strict: SpeedConf = SpeedConf(strictReference = true, limitRows = Some(1000))
  }

  /** The 9 reference aggregation keys (velocidades:146–152). */
  val referenceAggKeys: Seq[String] = Seq(
    "data", "intervalo", "letreiro", "codigo_linha", "sentido_linha",
    "destino_linha", "origem_linha", "prefixo_veiculo", "acessibilidade")

  /** E2 (velocidades:26–31,90): event-time date + 30-minute interval
    * label from the Unix-seconds `timestamp` column. Integer floor math —
    * exact, and identical in the DuckDB oracle. */
  def withTimeColumns(df: DataFrame): DataFrame = {
    val bucket = Portable.bucket30mStart(col("timestamp"))
    df.withColumn("data", to_date(timestamp_seconds(col("timestamp"))))
      .withColumn("intervalo", Portable.interval30Label(bucket))
  }

  /** W2 (velocidades:101–103): previous observation of the same vehicle
    * via `lag` over a per-vehicle window — the reference's sort+shift
    * (W1+W2) collapses into ONE hash exchange + per-partition sort; no
    * global sort ever happens (SURVEY.md §2.1 W1 note).
    *
    * `orderTiebreak`: the reference orders by timestamp alone, which is
    * nondeterministic under equal timestamps (trap ②). Callers that need
    * determinism (tests, the oracle gate) append a unique column. */
  def lagPrevious(df: DataFrame, orderTiebreak: Seq[Column] = Nil): DataFrame = {
    val w = Window.partitionBy(col("prefixo_veiculo"))
      .orderBy(col("timestamp") +: orderTiebreak: _*)
    df.withColumn("px_anterior", lag(col("px"), 1).over(w))
      .withColumn("py_anterior", lag(col("py"), 1).over(w))
      .withColumn("timestamp_anterior", lag(col("timestamp"), 1).over(w))
  }

  /** The cleaned per-hop speeds relation (EP3 through P3 — the shared
    * sub-plan all three outputs branch from, SURVEY.md §3).
    *
    * Steps, in reference order:
    *   L1 strict truncate (velocidades:97–98) — only with `limitRows`;
    *   W2 lag ×3 (101–103); P1 drop first observation (106);
    *   E3 tempo (109); P2 stale-gap drop, `tempo == 600` survives (112);
    *   E4 haversine (115–118) + E5 round-2 (121); E6 speed (124);
    *   P3 anomaly drop, `== 33` survives (127).
    *
    * Trap ⑤ (zero-elapsed pairs — duplicate timestamps): pandas division
    * by zero yields `inf` when distancia > 0 (then `inf > 33` drops the
    * row at P3) but `NaN` when distancia == 0, and `NaN > 33` is False —
    * the 0-distance/0-time row is KEPT with NaN speed
    * (velocidades:124,127). Default mode applies the *intended* cleaning
    * `tempo > 0` (drops all duplicate-timestamp hops — degenerate rows);
    * strictReference reproduces pandas exactly: explicit ±inf/null speed
    * and a null-keeping P3. */
  def hops(posicoes: DataFrame, conf: SpeedConf = SpeedConf(),
           orderTiebreak: Seq[Column] = Nil): DataFrame = {
    val limited = conf.limitRows match {
      case Some(n) =>
        // L1: the deployed debug truncate — an ordered global limit
        // (TakeOrderedAndProject: per-partition top-n + single driver
        // merge of n rows; safe at any scale).
        posicoes.orderBy(col("prefixo_veiculo") +: col("timestamp") +: orderTiebreak: _*)
          .limit(n)
      case None => posicoes
    }
    val p2 = lagPrevious(withTimeColumns(limited), orderTiebreak)
      .filter(col("px_anterior").isNotNull)                            // P1
      .withColumn("tempo", col("timestamp") - col("timestamp_anterior")) // E3
      .filter(col("tempo") <= conf.staleGapSec &&                      // P2
        (if (conf.strictReference) lit(true) else col("tempo") > 0))   // trap ⑤ (default)
      .withColumn("distancia",
        round(Portable.haversineMeters(
          col("py_anterior"), col("px_anterior"), col("py"), col("px")), 2)) // E4+E5
    if (conf.strictReference)
      p2.withColumn("velocidade_media",                                // E6, pandas-exact
          when(col("tempo") > 0, col("distancia") / col("tempo"))
            .when(col("distancia") > 0, lit(Double.PositiveInfinity))
            .otherwise(lit(null).cast("double")))
        .filter(col("velocidade_media").isNull ||                      // P3: NaN kept,
          !(col("velocidade_media") > conf.maxSpeedMs))                // inf dropped
    else
      p2.withColumn("velocidade_media", col("distancia") / col("tempo")) // E6
        .filter(!(col("velocidade_media") > conf.maxSpeedMs))            // P3
  }

  /** P4 + J1 (velocidades:134–142): per-observation slow points,
    * `velocidade_media < 1.4` strictly. */
  def slowPoints(cleanHops: DataFrame, conf: SpeedConf = SpeedConf()): DataFrame =
    cleanHops.filter(col("velocidade_media") < conf.slowSpeedMs)

  /** A1 + E7 (velocidades:146–155): hash aggregate on the 9 keys, then
    * the algebraic speed recompute sum(distancia)/sum(tempo) — the
    * reference's own fix for mean-of-means (comment at :154).
    *
    * Trap ⑥: pandas silently drops groups with any NaN key; strict mode
    * reproduces with na.drop on the keys. Default mode keeps null-key
    * groups (Spark semantics — the *intended* behavior).
    *
    * Scale: partial aggregation runs map-side before the single key
    * exchange; group count ≈ vehicles × intervals — low cardinality,
    * no skew. */
  def aggregate(cleanHops: DataFrame,
                keys: Seq[String] = referenceAggKeys,
                strict: Boolean = false): DataFrame = {
    val base = if (strict) cleanHops.na.drop("any", keys) else cleanHops
    base.groupBy(keys.map(col): _*)
      .agg(
        avg(col("px")).as("px"),
        avg(col("py")).as("py"),
        sum(col("distancia")).as("distancia"),
        sum(col("tempo")).as("tempo"))
      .withColumn("velocidade_media", col("distancia") / col("tempo")) // E7
  }

  /** The `acessiveis` projection (velocidades:164–167): 30-min mean
    * positions + accessibility flag, reusing the SAME aggregate the
    * speeds output uses (the reference reuses `aggregated_df`). */
  def acessiveis(aggregated: DataFrame, keys: Seq[String] = referenceAggKeys): DataFrame = {
    val keep = keys ++ Seq("px", "py")
    aggregated.select(keep.distinct.map(col): _*)
  }
}
