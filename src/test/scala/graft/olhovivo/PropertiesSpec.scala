package graft.olhovivo

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.functions.Haversine

/** Property-based invariants (SURVEY.md §5 item 4) via seeded scalacheck
  * generators (deterministic — no flaky CI). The haversine/bucketing
  * properties run on the plain Scala implementation (bit-identical to
  * the Catalyst expression — HaversineExpressionSpec proves it), so
  * hundreds of cases don't need a Spark job each; the pipeline
  * invariants run per generated dataset through the real operators.
  */
class PropertiesSpec extends SparkTestBase {
  import spark.implicits._

  private val params = Gen.Parameters.default
  private def samples[T](g: Gen[T], n: Int): Seq[T] =
    (0 until n).flatMap(i => g.apply(params, Seed(i.toLong)))

  private val latLonPair = for {
    a1 <- Gen.choose(-89.0, 89.0); o1 <- Gen.choose(-180.0, 180.0)
    a2 <- Gen.choose(-89.0, 89.0); o2 <- Gen.choose(-180.0, 180.0)
  } yield (a1, o1, a2, o2)

  test("haversine: symmetric, non-negative, zero on same point, ≤ half circumference") {
    samples(latLonPair, 500).foreach { case (a1, o1, a2, o2) =>
      val d = Haversine.compute(a1, o1, a2, o2)
      assert(d >= 0.0)
      assert(d == Haversine.compute(a2, o2, a1, o1))
      assert(d <= math.Pi * 6371000.0 + 1e-6)
      assert(Haversine.compute(a1, o1, a1, o1) == 0.0)
    }
  }

  test("haversine: triangle inequality on meridian triples") {
    val g = for {
      a <- Gen.choose(-89.0, 89.0); b <- Gen.choose(-89.0, 89.0)
      c <- Gen.choose(-89.0, 89.0); o <- Gen.choose(-180.0, 180.0)
    } yield (a, b, c, o)
    samples(g, 500).foreach { case (a, b, c, o) =>
      val ab = Haversine.compute(a, o, b, o)
      val bc = Haversine.compute(b, o, c, o)
      val ac = Haversine.compute(a, o, c, o)
      assert(ac <= ab + bc + 1e-6, s"triangle violated at ($a,$b,$c)")
    }
  }

  test("bucketing: every ts maps to exactly one 30-min interval containing it") {
    samples(Gen.choose(0L, 4102444800L), 1000).foreach { ts =>
      val bucket = (ts / 1800) * 1800
      assert(bucket <= ts && ts < bucket + 1800)
      assert(bucket % 1800 == 0)
    }
  }

  test("pipeline invariants: bounds, subset, agg identity, slow-point consistency") {
    val datasetGen = Gen.listOfN(60, for {
      v <- Gen.oneOf("A", "B", "C")
      t <- Gen.choose(0L, 7200L)
      dlat <- Gen.choose(-0.01, 0.01)
      dlon <- Gen.choose(-0.01, 0.01)
    } yield (v, t, -23.55 + dlat, -46.63 + dlon))
    samples(datasetGen, 5).foreach { rows =>
      val df = rows.toDF("prefixo_veiculo", "timestamp", "py", "px")
        .withColumn("letreiro", lit("L")).withColumn("codigo_linha", lit(1))
        .withColumn("sentido_linha", lit(1)).withColumn("destino_linha", lit("D"))
        .withColumn("origem_linha", lit("O")).withColumn("acessibilidade", lit(true))
        .dropDuplicates("prefixo_veiculo", "timestamp") // trap-2 tie canonicalization
      val clean = SpeedPipeline.hops(df, SpeedPipeline.SpeedConf(), Seq($"py")).cache()
      try {
        val hops = clean.select($"velocidade_media", $"tempo", $"distancia").collect()
        assert(hops.length <= rows.length)
        hops.foreach { h =>
          assert(h.getDouble(0) <= 33.0)                    // P3 bound
          assert(h.getLong(1) >= 1 && h.getLong(1) <= 600)  // P2 + trap-5 bounds
          assert(h.getDouble(2) >= 0.0)
        }
        SpeedPipeline.aggregate(clean)
          .select($"velocidade_media", $"distancia", $"tempo").collect()
          .foreach(r => assert(r.getDouble(0) == r.getDouble(1) / r.getLong(2))) // E7
        assert(SpeedPipeline.slowPoints(clean).count() ==
          hops.count(_.getDouble(0) < 1.4))
      } finally clean.unpersist()
    }
  }
}
