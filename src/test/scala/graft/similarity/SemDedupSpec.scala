package graft.similarity

import org.apache.spark.sql.functions._
import graft.olhovivo.SparkTestBase

/** SemDeDup semantics: within-cluster scope, greedy keep-lowest-id,
  * one-hop chains, threshold boundary inclusive. */
class SemDedupSpec extends SparkTestBase {
  import spark.implicits._

  private def run(rows: Seq[(Long, Seq[Float])], k: Int, t: Double): Map[Long, (Long, Boolean)] = {
    val corpus = rows.toDF("vec_id", "embedding")
    val cents = Clustering.seedCentroids(corpus, "vec_id", "embedding", k)
    SemDedup.semanticDedup(corpus, "vec_id", "embedding", cents, t)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2)))).toMap
  }

  test("identical vectors in one cluster: lowest id survives, copies drop") {
    val out = run(Seq(
      (0L, Seq(1.0f, 0.0f)),   // seed 0
      (1L, Seq(0.0f, 1.0f)),   // seed 1 — orthogonal cluster
      (2L, Seq(1.0f, 0.0f)),   // copy of 0 → dropped
      (3L, Seq(1.0f, 0.0f))),  // copy of 0 → dropped (by 0 AND 2)
      k = 2, t = 0.9)
    assert(out(0L) == ((0L, true)))
    assert(out(1L) == ((1L, true)))
    assert(out(2L) == ((0L, false)))
    assert(out(3L) == ((0L, false)))
  }

  test("near-dups in DIFFERENT clusters are never compared") {
    // cos(10,11) = 0.96 ≥ t, but each sits nearest a different seed →
    // both kept: cluster scope bounds the pairs (the SemDeDup trade).
    // t = 0.9 keeps the seed–member pairs (cos 0.8) below threshold.
    val out = run(Seq(
      (0L, Seq(1.0f, 0.0f)),
      (1L, Seq(0.0f, 1.0f)),
      (10L, Seq(0.8f, 0.6f)),
      (11L, Seq(0.6f, 0.8f))),
      k = 2, t = 0.9)
    assert(out(10L)._1 != out(11L)._1)
    assert(out(10L)._2 && out(11L)._2)
  }

  test("one-hop chain: b and c both drop even though b itself dropped") {
    // unit-ish vectors at angles 0°, 45°, 90°: cos(a,b)=cos(b,c)≈0.707,
    // cos(a,c)=0 — with t=0.7, b drops (near a) and c drops (near b),
    // even though b did not survive. Greedy one-hop, documented.
    val r2 = math.sqrt(2.0).toFloat / 2.0f
    val out = run(Seq(
      (0L, Seq(1.0f, 0.0f)),
      (1L, Seq(r2, r2)),
      (2L, Seq(0.0f, 1.0f))),
      k = 1, t = 0.7)
    assert(out(0L)._2)
    assert(!out(1L)._2)
    assert(!out(2L)._2)
  }

  test("threshold is inclusive on the ROUNDED cosine") {
    // cos = exactly 0.5 between 0° and 60° unit vectors → rcos 0.5:
    // t=0.5 drops the higher id; t=0.5001 keeps it.
    val v60 = Seq(0.5f, math.sqrt(3.0).toFloat / 2.0f)
    val rows = Seq((0L, Seq(1.0f, 0.0f)), (1L, v60))
    assert(!run(rows, 1, 0.5)(1L)._2)
    assert(run(rows, 1, 0.5001)(1L)._2)
  }

  test("zero vector: cosine 0 to everything, always kept") {
    val out = run(Seq(
      (0L, Seq(1.0f, 0.0f)),
      (1L, Seq(0.0f, 0.0f)),
      (2L, Seq(1.0f, 0.0f))),
      k = 1, t = 0.1)
    assert(out(1L)._2)
    assert(!out(2L)._2)
  }
}
