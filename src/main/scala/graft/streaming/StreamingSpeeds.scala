package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.olhovivo.SpeedPipeline.SpeedConf

/** Structured Streaming variant of EP3 (SURVEY.md §7.3): the batch
  * window-lag becomes per-vehicle state. `lag` is unsupported over
  * streams, so each vehicle's last observation is carried in
  * `flatMapGroupsWithState`; every arriving position emits at most one
  * cleaned hop (the reference's P1–P3 rules applied incrementally).
  *
  * State is O(1) per vehicle (a single (px, py, ts) triple — ~40 bytes ×
  * fleet size), with a processing-time timeout evicting vehicles idle
  * longer than the stale-gap bound — the streaming twin of P2: a gap
  * > staleGapSec could never produce a hop anyway.
  *
  * The 30-minute aggregation (A1) composes downstream as a standard
  * watermarked tumbling-window aggregate (see windowedSpeedAgg).
  */
object StreamingSpeeds {

  case class Position(prefixo_veiculo: String, timestamp: Long, py: Double, px: Double)
  case class LastObs(timestamp: Long, py: Double, px: Double)
  case class Hop(prefixo_veiculo: String, timestamp: Long, tempo: Long,
                 distancia: Double, velocidade_media: Double)

  /** Keyed variants: `event_id` is a total-order tiebreak for
    * same-second observations, mirroring the batch pipeline's
    * `orderTiebreak = Seq(col("event_id"))` (OlhoVivo.q20SpeedHops).
    * With it, the streaming hop set is deterministic — and therefore
    * exactly oracle-checkable — even when a vehicle reports twice in
    * one second; the unkeyed API keeps its stable arrival-order
    * behavior for sources that have no such key. */
  case class KeyedPosition(prefixo_veiculo: String, event_id: Long,
                           timestamp: Long, py: Double, px: Double)
  case class KeyedHop(prefixo_veiculo: String, event_id: Long, timestamp: Long,
                      tempo: Long, distancia: Double, velocidade_media: Double)

  /** Reference haversine (R=6371000, round 2) in plain Scala for the
    * stateful path — same math as Portable.haversineMeters. */
  private[streaming] def haversine(lat1: Double, lon1: Double, lat2: Double, lon2: Double): Double = {
    val dlat = math.toRadians(lat2 - lat1)
    val dlon = math.toRadians(lon2 - lon1)
    val a = math.pow(math.sin(dlat / 2), 2) +
      math.cos(math.toRadians(lat1)) * math.cos(math.toRadians(lat2)) *
        math.pow(math.sin(dlon / 2), 2)
    val d = 2.0 * 6371000.0 * math.atan2(math.sqrt(a), math.sqrt(1.0 - a))
    // HALF_UP to 2 decimals — matches Spark's round() in the batch path
    BigDecimal(d).setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble
  }

  /** One vehicle's update: the micro-batch group is sorted by
    * (timestamp, event_id) — a stable sort, so the unkeyed wrapper's
    * constant event_id degrades to arrival order — and emits cleaned
    * hops. */
  private def updateVehicle(conf: SpeedConf, evict: Boolean)(
      vehicle: String, rows: Iterator[KeyedPosition],
      state: GroupState[LastObs]): Iterator[KeyedHop] = {
    if (state.hasTimedOut) { state.remove(); return Iterator.empty }
    val sorted = rows.toSeq.sortBy(p => (p.timestamp, p.event_id))
    val out = Seq.newBuilder[KeyedHop]
    var last = state.getOption
    sorted.foreach { p =>
      last.foreach { prev =>
        val tempo = p.timestamp - prev.timestamp
        if (tempo > 0 && tempo <= conf.staleGapSec) { // P2 + trap-5
          val dist = haversine(prev.py, prev.px, p.py, p.px)
          val v = dist / tempo
          if (!(v > conf.maxSpeedMs)) // P3
            out += KeyedHop(vehicle, p.event_id, p.timestamp, tempo, dist, v)
        }
      }
      last = Some(LastObs(p.timestamp, p.py, p.px))
    }
    last.foreach(state.update)
    if (evict) state.setTimeoutDuration(conf.staleGapSec * 1000)
    out.result().iterator
  }

  /** Streaming EP2 entry: readStream over the raw JSON landing zone
    * (same schema + flatten as the batch IngestPositions — one code
    * path for the transformation), yielding the typed position stream
    * the stateful EP3 consumes. New files are discovered incrementally;
    * `maxFilesPerTrigger` bounds micro-batch size. */
  def positionsFromRawZone(spark: SparkSession, path: String,
                           maxFilesPerTrigger: Int = 100): Dataset[Position] = {
    import spark.implicits._
    val raw = spark.readStream
      .schema(graft.olhovivo.Schemas.rawSnapshot)
      .option("multiLine", "true")
      .option("maxFilesPerTrigger", maxFilesPerTrigger.toString)
      .json(path)
    graft.olhovivo.IngestPositions.flatten(raw)
      .select(col("prefixo_veiculo"), col("timestamp"), col("py"), col("px"))
      .as[Position]
  }

  /** positions stream → cleaned hop stream.
    *
    * `evictIdle=true` (production) arms a processing-time timeout that
    * drops state for vehicles idle past the stale-gap bound — a gap that
    * long can never produce a hop, so eviction is free. It also makes
    * the engine schedule timeout-only micro-batches continuously, which
    * keeps `processAllAvailable()` from settling — so tests (and any
    * synchronous driver) use the default false. */
  def hopsStream(positions: Dataset[Position], conf: SpeedConf = SpeedConf(),
                 evictIdle: Boolean = false): Dataset[Hop] = {
    import positions.sparkSession.implicits._
    hopsStreamKeyed(
      positions.map(p => KeyedPosition(p.prefixo_veiculo, 0L, p.timestamp, p.py, p.px)),
      conf, evictIdle)
      .map(h => Hop(h.prefixo_veiculo, h.timestamp, h.tempo, h.distancia,
        h.velocidade_media))
  }

  /** Keyed positions stream → keyed cleaned hop stream; the hop carries
    * the CURRENT observation's event_id (lag semantics — same row
    * identity as the batch q20 output), so results are exactly
    * comparable row-for-row with the batch pipeline. */
  def hopsStreamKeyed(positions: Dataset[KeyedPosition],
                      conf: SpeedConf = SpeedConf(),
                      evictIdle: Boolean = false): Dataset[KeyedHop] = {
    import positions.sparkSession.implicits._
    val timeout =
      if (evictIdle) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    positions
      .groupByKey(_.prefixo_veiculo)
      .flatMapGroupsWithState(OutputMode.Append, timeout)(
        updateVehicle(conf, evictIdle))
  }

  /** Watermarked 30-minute tumbling aggregate over the hop stream —
    * the streaming A1+E7 (speed recomputed from sums). */
  def windowedSpeedAgg(hops: Dataset[Hop], watermarkDelay: String = "1 hour"): DataFrame =
    hops
      .withColumn("event_time", timestamp_seconds(col("timestamp")))
      .withWatermark("event_time", watermarkDelay)
      .groupBy(window(col("event_time"), "30 minutes"), col("prefixo_veiculo"))
      .agg(
        sum(col("distancia")).as("distancia"),
        sum(col("tempo")).as("tempo"),
        count(lit(1)).as("n_hops"))
      .withColumn("velocidade_media", col("distancia") / col("tempo"))
}
