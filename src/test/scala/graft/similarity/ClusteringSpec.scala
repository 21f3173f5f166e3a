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

  test("roundDiv: half-away-from-zero on both signs, exact on clean divides") {
    assert(Clustering.roundDiv(5L, 2L) == 3L)    // 2.5 → 3
    assert(Clustering.roundDiv(-5L, 2L) == -3L)  // -2.5 → -3
    assert(Clustering.roundDiv(4L, 2L) == 2L)
    assert(Clustering.roundDiv(-4L, 2L) == -2L)
    assert(Clustering.roundDiv(7L, 3L) == 2L)    // 2.33 → 2
    assert(Clustering.roundDiv(-7L, 3L) == -2L)
    assert(Clustering.roundDiv(0L, 5L) == 0L)
  }

  test("fitLloyd: two hand-checked sweeps move both centroids exactly") {
    // 1-D corpus [0, 0.2, 1.0, 1.2, 10] with k=2 seeds [0] and [0.2]:
    // sweep 1 assigns {0}|{0.2, 1.0, 1.2, 10} → means [0] and [3.1];
    // sweep 2 reassigns {0, 0.2, 1.0, 1.2}|{10} → means [0.6] and [10].
    val corpus = Seq(
      (0L, Seq(0.0f)), (1L, Seq(0.2f)), (2L, Seq(1.0f)),
      (3L, Seq(1.2f)), (4L, Seq(10.0f)))
      .toDF("vec_id", "embedding")
    val m = Clustering.fitLloyd(corpus, "vec_id", "embedding", k = 2, sweeps = 2)
    assert(m.centroids.map(_.toSeq).toSeq ==
      Seq(Seq(600000L), Seq(10000000L)), m.centroids.map(_.toSeq).toSeq)
    assert(m.sizes.toSeq == Seq(4L, 1L))
  }

  test("fitLloyd: an emptied cluster keeps its previous centroid at size 0") {
    // duplicate seeds: both k=2 seeds sit at [0], every vector ties to
    // the LOWER cid, so cluster 1 receives nothing and must retain its
    // seed centroid with size 0 while cluster 0 takes the exact mean
    // (5000000/3 → roundDiv 1666667)
    val corpus = Seq(
      (0L, Seq(0.0f)), (1L, Seq(0.0f)), (2L, Seq(5.0f)))
      .toDF("vec_id", "embedding")
    val m = Clustering.fitLloyd(corpus, "vec_id", "embedding", k = 2, sweeps = 1)
    assert(m.centroids.map(_.toSeq).toSeq == Seq(Seq(1666667L), Seq(0L)))
    assert(m.sizes.toSeq == Seq(3L, 0L))
  }

  test("fitLloyd: null vectors are excluded; sizes sum to the non-null count") {
    val corpus = Seq(
      (0L, Some(Seq(0.0f, 0.0f))), (1L, None),
      (2L, Some(Seq(1.0f, 1.0f))), (3L, Some(Seq(0.1f, 0.1f))))
      .toDF("vec_id", "embedding")
    val m = Clustering.fitLloyd(corpus, "vec_id", "embedding", k = 2, sweeps = 2)
    assert(m.sizes.sum == 3L)
  }

  test("fitLloyd model feeds SemDedup/assign directly (same fx convention)") {
    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val m = Clustering.fitLloyd(emb, "vec_id", "embedding", k = 8, sweeps = 3)
    val n = emb.count()
    assert(m.sizes.sum == n, s"sizes ${m.sizes.toSeq} must cover all $n vectors")
    // Lloyd invariant: sweep s+1's sizes are exactly the assignment
    // counts under sweep s's centroids (the fit's E-step IS assign)
    val m4 = Clustering.fitLloyd(emb, "vec_id", "embedding", k = 8, sweeps = 4)
    val counts = Clustering.assign(emb, "vec_id", "embedding", m.centroids)
      .groupBy($"cid").count().collect()
      .map(r => r.getLong(0).toInt -> r.getLong(1)).toMap
    m4.sizes.zipWithIndex.foreach { case (sz, cid) =>
      assert(counts.getOrElse(cid, 0L) == sz, s"cid $cid: $counts vs $sz")
    }
    val sem = SemDedup.semanticDedup(emb, "vec_id", "embedding",
      m.centroids, 0.35)
    assert(sem.columns.toSeq == Seq("vec_id", "cid", "kept"))
    assert(sem.count() == n)
  }
}
