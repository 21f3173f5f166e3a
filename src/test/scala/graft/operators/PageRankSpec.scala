package graft.operators

import org.apache.spark.sql.functions._
import graft.olhovivo.SparkTestBase

/** Integer fixed-point PageRank: hand-computed sweeps, dangling-node
  * absorption, parallel-edge semantics, partitioning-independence. */
class PageRankSpec extends SparkTestBase {
  import spark.implicits._

  // 1→2, 2→1, 2→3; 3 is dangling (absorbs rank, redistributes none)
  private def triangle = Seq((1L, 2L), (2L, 1L), (2L, 3L)).toDF("src", "dst")

  test("two hand-computed sweeps (scale 1e6, damping 85/100)") {
    val r1 = PageRank.run(triangle, "src", "dst", 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // from 1: 850000→2; from 2: 425000→each of 1,3
    assert(r1 == Map(1L -> 575000L, 2L -> 1000000L, 3L -> 575000L))

    val r2 = PageRank.run(triangle, "src", "dst", 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // from 1: (85·575000) div 100 = 488750→2; from 2: 425000→each
    assert(r2 == Map(1L -> 575000L, 2L -> 638750L, 3L -> 575000L))
  }

  test("duplicate edges are parallel edges (each carries a contribution)") {
    val e = Seq((1L, 2L), (1L, 2L), (2L, 1L)).toDF("src", "dst")
    val r = PageRank.run(e, "src", "dst", 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // deg(1)=2: two contributions of (85·1e6) div 200 = 425000 to node 2
    assert(r == Map(1L -> 1000000L, 2L -> 1000000L))
  }

  test("result is independent of the checkpoint interval") {
    // k=5 crosses the default interval (4), so the default path exercises
    // an INTERMEDIATE checkpoint + the always-final one; every-round (1)
    // and never-within-budget (9) must agree bit-for-bit — the interval
    // only moves lineage truncation, never the integer math.
    val expected = PageRank.run(triangle, "src", "dst", 5, checkpointEvery = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    for (every <- Seq(2, 4, 9)) {
      val got = PageRank.run(triangle, "src", "dst", 5, checkpointEvery = every)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == expected, s"checkpointEvery=$every diverged")
    }
  }

  test("result is independent of input partitioning") {
    val base = PageRank.run(triangle, "src", "dst", 3).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val shuffled = PageRank.run(triangle.repartition(7, col("dst")),
      "src", "dst", 3).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(base == shuffled)
  }
}
