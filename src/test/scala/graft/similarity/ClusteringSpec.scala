package graft.similarity

import org.apache.spark.sql.functions._
import graft.olhovivo.SparkTestBase

/** Cluster-assignment semantics: exact integer distances, seed identity,
  * lowest-cid tie break, fixed-point quantization edges. */
class ClusteringSpec extends SparkTestBase {
  import spark.implicits._

  test("assign: seeds map to themselves at distance 0; others to the true nearest") {
    val corpus = Seq(
      (0L, Seq(0.0f, 0.0f)),
      (1L, Seq(1.0f, 0.0f)),
      (2L, Seq(0.1f, 0.0f)),   // near seed 0
      (3L, Seq(0.9f, 0.1f)))   // near seed 1
      .toDF("vec_id", "embedding")
    val cents = Clustering.seedCentroids(corpus, "vec_id", "embedding", 2)
    val out = Clustering.assign(corpus, "vec_id", "embedding", cents)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(out(0L) == ((0L, 0L)) && out(1L) == ((1L, 0L)))
    assert(out(2L)._1 == 0L && out(3L)._1 == 1L)
    // exact integer distance: (0.1e6)^2 = 1e10
    assert(out(2L)._2 == 10000000000L)
  }

  test("assign: equidistant vector breaks tie to the LOWEST centroid id") {
    val corpus = Seq(
      (0L, Seq(0.0f)), (1L, Seq(1.0f)), (2L, Seq(0.5f)))
      .toDF("vec_id", "embedding")
    val cents = Clustering.seedCentroids(corpus, "vec_id", "embedding", 2)
    val out = Clustering.assign(corpus, "vec_id", "embedding", cents)
      .filter($"vec_id" === 2L).head()
    assert(out.getLong(1) == 0L) // dist 0.25e12 to both → cid 0
  }

  test("adaptiveK: gate floor, corpus-proportional middle, literal-model cap") {
    assert(Clustering.adaptiveK(20) == 8)      // sf0.001
    assert(Clustering.adaptiveK(2000) == 8)    // sf0.1 — gate k unchanged
    assert(Clustering.adaptiveK(2048) == 8)    // last corpus at the floor
    assert(Clustering.adaptiveK(2049) == 9)
    assert(Clustering.adaptiveK(200000) == 782)  // the 100× scale corpus
    assert(Clustering.adaptiveK(100000000) == 4096) // cap → stored-index territory
  }

  test("fixedPoint: floor(x*1e6 + 0.5) — half-up, negative-correct") {
    val fx = Seq((1L, Seq(0.000001f, -0.0000005f, -1.25f)))
      .toDF("id", "v")
      .select(Clustering.fixedPoint($"v")).head().getSeq[Long](0)
    // 0.000001f ≈ 1.0000000e-6 → 1; -0.0000005f ≈ -5e-7 → floor(≈0.0) = 0;
    // -1.25 → floor(-1249999.5) = -1250000 (floor, not truncate)
    assert(fx == Seq(1L, 0L, -1250000L), s"got $fx")
  }
}
