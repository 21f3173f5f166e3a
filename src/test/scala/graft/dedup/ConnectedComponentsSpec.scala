package graft.dedup

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.olhovivo.SparkTestBase

class ConnectedComponentsSpec extends SparkTestBase {
  import spark.implicits._

  private def run(vertices: Seq[Long], pairs: Seq[(Long, Long)]): Map[Long, Long] =
    ConnectedComponents.components(
        vertices.toDF("doc_id"), "doc_id",
        pairs.toDF("id_a", "id_b"), "id_a", "id_b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  /** Union-find oracle. */
  private def oracle(vertices: Seq[Long], pairs: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map(vertices.map(v => v -> v): _*)
    def find(x: Long): Long = if (parent(x) == x) x else { val r = find(parent(x)); parent(x) = r; r }
    pairs.foreach { case (a, b) => val (ra, rb) = (find(a), find(b)); if (ra != rb) parent(ra) = rb }
    val minOfRoot = vertices.groupBy(find).map { case (r, vs) => r -> vs.min }
    vertices.map(v => v -> minOfRoot(find(v))).toMap
  }

  test("path, star, singleton, duplicate and self edges") {
    val vertices = (1L to 10L)
    // path 1-2-3-4 (worst case for naive flooding), star 7<-{8,9},
    // singleton 5,6,10; dup edge + self-loop noise
    val pairs = Seq((2L, 1L), (3L, 2L), (4L, 3L), (8L, 7L), (9L, 7L),
      (8L, 7L), (5L, 5L))
    val got = run(vertices, pairs)
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      5L -> 5L, 6L -> 6L, 7L -> 7L, 8L -> 7L, 9L -> 7L, 10L -> 10L), s"got $got")
  }

  test("long chain converges (contraction, not flooding) and matches union-find") {
    // 60-node chain: naive one-hop flooding needs 59 rounds; contraction
    // must finish well under the maxIter=50 guard
    val vertices = (1L to 60L)
    val pairs = (1L until 60L).map(i => (i + 1, i))
    val got = run(vertices, pairs)
    assert(got == vertices.map(_ -> 1L).toMap)
  }

  test("keepBest picks the highest-priority doc per cluster, lowest id on ties") {
    val vertices = (1L to 6L)
    val pairs = Seq((1L, 2L), (2L, 3L), (4L, 5L)) // clusters {1,2,3},{4,5},{6}
    val clusters = ConnectedComponents.components(
      vertices.toDF("doc_id"), "doc_id", pairs.toDF("a", "b"), "a", "b")
    // priorities: cluster1 → doc 2 wins (30); cluster4 → tie 10/10 → doc 4
    val docs = Seq((1L, 10L), (2L, 30L), (3L, 20L), (4L, 10L), (5L, 10L),
      (6L, 1L)).toDF("doc_id", "quality")
    val keep = ConnectedComponents.keepBest(clusters, docs, "doc_id", col("quality"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(keep == Map(1L -> 2L, 4L -> 4L, 6L -> 6L), s"got $keep")
  }

  test("converges identically with the durable checkpoint seam enabled") {
    val dir = java.nio.file.Files.createTempDirectory("graft-cc-ckpt").toString
    val vertices = (1L to 60L)
    val pairs = (1L until 60L).map(i => (i + 1, i))
    val local = run(vertices, pairs)
    SparkTestBase.sessionConfLock.synchronized {
      spark.conf.set(graft.Checkpoints.DirKey, dir)
      try assert(run(vertices, pairs) == local)
      finally spark.conf.unset(graft.Checkpoints.DirKey)
    }
  }

  test("random graphs match union-find oracle") {
    val gen = for {
      n     <- Gen.choose(1, 40)
      m     <- Gen.choose(0, 60)
      pairs <- Gen.listOfN(m, for {
        a <- Gen.choose(1L, n.toLong); b <- Gen.choose(1L, n.toLong)
      } yield (a, b))
    } yield ((1L to n.toLong).toSeq, pairs)
    for (seed <- 1L to 6L) {
      val (vs, ps) = gen.pureApply(Gen.Parameters.default, Seed(seed))
      assert(run(vs, ps) == oracle(vs, ps), s"seed $seed: vs=$vs ps=$ps")
    }
  }
}
