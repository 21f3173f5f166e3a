package graft.olhovivo

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import graft.functions.Portable
import SpeedPipeline._

/** Unit + boundary tests for every EP3 operator (SURVEY.md §5 item 1):
  * haversine geodesics, interval labels at day-wrap, each cleaning
  * filter's boundary, the aggregate identity, and the strict-mode traps.
  */
class SpeedPipelineSpec extends SparkTestBase {
  import spark.implicits._

  private def pos(rows: (String, Long, Double, Double)*): DataFrame =
    rows.toDF("prefixo_veiculo", "timestamp", "py", "px")
      .withColumn("letreiro", lit("5015-10"))
      .withColumn("codigo_linha", lit(33887))
      .withColumn("sentido_linha", lit(2))
      .withColumn("destino_linha", lit("JD. SAO JORGE"))
      .withColumn("origem_linha", lit("METRO JABAQUARA"))
      .withColumn("acessibilidade", lit(true))

  test("haversine: zero on identical points, symmetric, known geodesic") {
    val df = Seq(
      (-23.6787125, -46.65674, -23.6787125, -46.65674), // PDF page 1 example coords
      (-23.55, -46.63, -23.55, -46.64),
      (-23.55, -46.64, -23.55, -46.63)
    ).toDF("lat1", "lon1", "lat2", "lon2")
      .select(Portable.haversineMeters($"lat1", $"lon1", $"lat2", $"lon2").as("d"))
    val Array(zero, ab, ba) = df.collect().map(_.getDouble(0))
    assert(zero == 0.0)
    assert(ab == ba)
    // 0.01° of longitude at latitude -23.55 ≈ 111194.9 * cos(23.55°) * 0.01 m
    val expected = 2 * 6371000.0 * math.Pi / 360.0 * math.cos(math.toRadians(23.55)) * 0.01
    assert(math.abs(ab - expected) / expected < 0.001, s"got $ab expected ~$expected")
  }

  test("interval label: boundaries and midnight wrap") {
    val df = Seq(0L, 1799L, 1800L, 84600L, 86399L).toDF("timestamp")
      .select($"timestamp",
        Portable.interval30Label(Portable.bucket30mStart($"timestamp")).as("intervalo"))
    val got = df.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got(0L) == "00:00-00:30")
    assert(got(1799L) == "00:00-00:30")   // 29:59 into the day: same bucket
    assert(got(1800L) == "00:30-01:00")   // boundary starts the next bucket
    assert(got(84600L) == "23:30-00:00")  // midnight wrap in the label
    assert(got(86399L) == "23:30-00:00")
  }

  test("cleaning boundaries: P1 first-obs, P2 tempo 600/601, trap-5 tempo=0, P3 speed 33") {
    // vehicle A: hops engineered around each boundary.
    val d600 = 600 * 10.0 // 10 m/s over 600 s → kept by P2 (== 600 survives)
    val df = pos(
      ("A", 1000L, -23.5500, -46.6300),            // P1: first obs of A → dropped
      ("A", 1600L, -23.5500 + mDeg(d600), -46.63), // tempo=600 → KEPT
      ("A", 2201L, -23.5500 + mDeg(d600) + mDeg(100), -46.63), // tempo=601 → dropped by P2
      ("B", 1000L, -23.5600, -46.6300),
      ("B", 1000L, -23.5601, -46.6300),            // tempo=0 (duplicate ts) → dropped (trap ⑤)
      ("C", 1000L, -23.5700, -46.6300),
      ("C", 1100L, -23.5700 + mDeg(33.0 * 100), -46.63), // speed == 33.0 → KEPT (P3 is >33)
      ("D", 1000L, -23.5800, -46.6300),
      ("D", 1100L, -23.5800 + mDeg(34.0 * 100), -46.63)  // speed ≈ 34 → dropped
    )
    val got = hops(df, SpeedConf(), orderTiebreak = Seq($"py"))
      .select($"prefixo_veiculo", $"tempo", $"velocidade_media").collect()
    val byVeh = got.groupBy(_.getString(0)).view.mapValues(_.toSeq).toMap
    assert(byVeh.keySet == Set("A", "C"), s"got ${byVeh.keySet}")
    assert(byVeh("A").map(_.getLong(1)) == Seq(600L))
    val cSpeed = byVeh("C").head.getDouble(2)
    assert(cSpeed <= 33.0 && cSpeed > 32.5, s"C speed $cSpeed")
  }

  // meters → degrees of latitude (haversine along a meridian is exactly
  // R·Δlat_rad, so meters-per-degree = 2πR/360)
  private def mDeg(m: Double): Double = m / (2 * 6371000.0 * math.Pi / 360.0)

  test("trap 5 strict: 0-time/0-distance kept with null speed (pandas NaN), 0-time/moved dropped (pandas inf)") {
    val df = pos(
      ("B", 1000L, -23.5600, -46.6300),
      ("B", 1000L, -23.5600, -46.6300),  // dup ts, dup position → pandas 0/0 = NaN → KEPT
      ("C", 1000L, -23.5700, -46.6300),
      ("C", 1000L, -23.5710, -46.6300))  // dup ts, moved → pandas d/0 = inf > 33 → dropped
    val strictRows = hops(df, SpeedConf(strictReference = true), orderTiebreak = Seq($"py"))
      .select($"prefixo_veiculo", $"velocidade_media").collect()
    assert(strictRows.map(_.getString(0)).toSeq == Seq("B"), "only the 0/0 row survives")
    assert(strictRows.head.isNullAt(1), "strict-mode 0/0 speed is null (pandas NaN)")
    // default (intended) mode drops every zero-elapsed hop
    assert(hops(df, SpeedConf(), orderTiebreak = Seq($"py")).count() == 0)
  }

  test("slow points: velocidade < 1.4 strictly") {
    val df = pos(
      ("A", 0L, -23.55, -46.63),
      ("A", 100L, -23.55 + mDeg(139.0), -46.63),  // 1.39 m/s → slow
      ("A", 200L, -23.55 + mDeg(139.0) + mDeg(140.0), -46.63) // 1.40 m/s → NOT slow
    )
    val clean = hops(df, SpeedConf(), orderTiebreak = Seq($"timestamp"))
    val slow = slowPoints(clean).select($"velocidade_media").collect().map(_.getDouble(0))
    assert(slow.length == 1 && slow.head < 1.4, s"got ${slow.toSeq}")
  }

  test("aggregate identity: velocidade_media == sum(distancia)/sum(tempo) per group") {
    val df = pos(
      ("A", 0L, -23.55, -46.63),
      ("A", 100L, -23.556, -46.63),
      ("A", 200L, -23.561, -46.63),
      ("A", 300L, -23.569, -46.63))
    val agg = SpeedPipeline.aggregate(hops(df, SpeedConf(), Seq($"timestamp")))
      .select($"distancia", $"tempo", $"velocidade_media").collect()
    agg.foreach { r =>
      assert(r.getDouble(2) == r.getDouble(0) / r.getLong(1))
    }
    // one group (one vehicle, one interval), 3 hops summed
    assert(agg.length == 1 && agg.head.getLong(1) == 300L)
  }

  test("trap 6: null group keys dropped in strict mode, kept by default") {
    val base = pos(
      ("A", 0L, -23.55, -46.63),
      ("A", 100L, -23.556, -46.63))
      .withColumn("acessibilidade", lit(null).cast("boolean"))
    val clean = hops(base, SpeedConf(), Seq($"timestamp"))
    assert(SpeedPipeline.aggregate(clean).count() == 1)                  // default: null-key group kept
    assert(SpeedPipeline.aggregate(clean, strict = true).count() == 0)   // strict: pandas drops it
  }

  test("L1 strict truncate: ordered limit keeps the first n in (vehicle, ts) order") {
    val df = pos(
      ("B", 0L, -23.55, -46.63), ("B", 10L, -23.551, -46.63),
      ("A", 0L, -23.56, -46.63), ("A", 10L, -23.561, -46.63),
      ("A", 20L, -23.562, -46.63))
    // limit 3 → A's three observations survive; B contributes nothing
    val clean = hops(df, SpeedConf(limitRows = Some(3)), Seq($"timestamp"))
    val vehicles = clean.select($"prefixo_veiculo").distinct().collect().map(_.getString(0))
    assert(vehicles.toSet == Set("A"))
  }

  test("multi-output reuse: agg and acessiveis come from the same aggregate") {
    val df = pos(
      ("A", 0L, -23.55, -46.63),
      ("A", 100L, -23.556, -46.63),
      ("A", 2000L, -23.558, -46.63))
    val (agg, slow, acess) = AverageSpeeds.compute(df, SpeedConf(), Seq($"timestamp"))
    assert(agg.columns.toSeq == AverageSpeeds.aggCols)
    assert(slow.columns.toSeq == AverageSpeeds.slowCols)
    assert(acess.columns.toSeq == AverageSpeeds.acessCols)
    assert(acess.count() == agg.count())
  }
}
