package graft

import org.apache.spark.sql.functions._

import graft.olhovivo.SparkTestBase

/** The scale-harness corpus scaffold's two documents growth laws
  * (Sharding.documents vs documentsDistinct), asserted on the CC
  * chain's TRUE input — the LSH candidate-pair frame — because the
  * published SCALE*x numbers are only meaningful if the scaffold
  * produces the growth law each mode claims. */
class ShardingSpec extends SparkTestBase {
  import spark.implicits._

  // A tiny corpus with one internal near-dup pair (docs 1 and 2 differ
  // by a trailing token) and one loner; texts are long enough to clear
  // the 3-token shingle minimum.
  private def baseDocs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog today"),
    (2L, "the quick brown fox jumps over the lazy dog tonight"),
    (3L, "completely different content about spark scale testing here now")
  ).toDF("doc_id", "text")

  private val k = 3

  test("neardup mode: base docs collide across shards (pairs grow super-linearly)") {
    val n = baseDocs.count()
    val pairs = queries.DedupOps.lshCandidatePairs(
      spark, Sharding.documents(baseDocs, k))
    // shard of a doc_id under the id-offset scheme
    val shardOf = (id: org.apache.spark.sql.Column) => floor(id / lit(n))
    val cross = pairs.filter(shardOf(col("id_a")) =!= shardOf(col("id_b"))).count()
    assert(cross > 0, "the stress mode exists to create cross-shard candidate pairs")
  }

  test("distinct mode: zero cross-shard candidate pairs; per-shard structure preserved") {
    val n = baseDocs.count()
    val pairs = queries.DedupOps.lshCandidatePairs(
      spark, Sharding.documentsDistinct(baseDocs, k)).cache()
    try {
      val shardOf = (id: org.apache.spark.sql.Column) => floor(id / lit(n))
      val cross = pairs.filter(shardOf(col("id_a")) =!= shardOf(col("id_b"))).count()
      assert(cross === 0L,
        "shard-salted tokens must zero cross-shard word-shingle overlap")
      // every shard reproduces the base corpus's internal near-dup pair:
      // token salting is injective per token, so within-shard shingle
      // EQUALITY structure is exactly the base's (hash values differ, so
      // LSH banding could in principle drop a pair probabilistically —
      // with 1-token-out-of-10 difference the signatures agree on nearly
      // every band, so all k within-shard pairs must surface).
      val withinPerShard = pairs
        .filter(shardOf(col("id_a")) === shardOf(col("id_b")))
        .groupBy(shardOf(col("id_a")).as("shard")).count()
        .collect().map(r => r.getLong(1)).toSeq
      assert(withinPerShard.size === k && withinPerShard.forall(_ === 1L),
        s"each shard should carry exactly the base corpus's one near-dup pair, got $withinPerShard")
    } finally pairs.unpersist()
  }

  test("distinct mode keeps ids and non-text columns identical to neardup mode") {
    val a = Sharding.documents(baseDocs, k).select("doc_id").orderBy("doc_id")
    val b = Sharding.documentsDistinct(baseDocs, k).select("doc_id").orderBy("doc_id")
    assert(a.collect().toSeq === b.collect().toSeq)
  }
}
