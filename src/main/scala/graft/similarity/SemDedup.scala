package graft.similarity

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Semantic deduplication — SemDeDup (Abbas et al. 2023,
  * arXiv:2303.09540): cluster the embedding space, then look for
  * near-duplicates only WITHIN each cluster, so the quadratic pair step
  * is bounded by cluster size instead of corpus size.
  *
  * Semantics (deterministic, oracle-checkable): a row is dropped iff
  * some LOWER-id row in the same cluster has rounded cosine ≥
  * `threshold` to it — the greedy keep-lowest-id rule. It is one-hop:
  * for a chain a–b, b–c (a–c below threshold), both b and c drop and a
  * survives; slightly more aggressive than connected-components
  * representative-keeping (that variant is q47/q59's machinery), and
  * matches SemDeDup's keep-one-per-epsilon-ball intent with a total
  * order (id) instead of the paper's random choice, so both engines
  * agree row-for-row.
  *
  * Scale design: centroids are a k×dim plan-literal MODEL (no join for
  * assignment); unit-normalization and assignment happen in ONE
  * map-only projection over the corpus; the self-join shuffles on cid
  * only, and each pair costs a single pre-normalized dot product (norms
  * are NOT recomputed per pair). At 100 TB, k scales with the corpus
  * (bounded mean cluster size) and the epsilon-ball drop set is a small
  * fraction, so the final marking join is AQE-broadcastable.
  *
  * Cosine is compared on the round-4 value of a dot of round-6 unit
  * vectors — the same cross-engine float discipline as q50/q51.
  */
object SemDedup {

  /** (id, cid, kept): every corpus row with its cluster and whether it
    * survives semantic dedup at `threshold`.
    *
    * The (id, cid, unit-vector) projection is cached via `scope`: it
    * feeds BOTH self-join sides and the final marking join — uncached,
    * each consumer re-pays k dot products + a normalize per row. */
  def semanticDedup(corpus: DataFrame, idCol: String, vecCol: String,
                    centroids: Array[Array[Long]], threshold: Double,
                    scope: graft.CacheScope = graft.CacheScope.unmanaged): DataFrame = {
    // one map-only pass: cluster id + unit vector per row
    val unit = Similarity.withL2Normalized(
      corpus.select(col(idCol), col(vecCol)), col(vecCol), "__n", "__uv")
    val rows = scope.cache(unit.select(col(idCol),
      Clustering.nearestCid(col(vecCol), centroids).as("cid"),
      col("__uv")))
    val a = rows.toDF("__ida", "cid", "__uva")
    val b = rows.toDF("__idb", "cid", "__uvb")
    val dropped = a.join(b, Seq("cid"))
      .filter(col("__ida") < col("__idb"))
      .filter(graft.functions.Fx.fx(Similarity.dot(col("__uva"), col("__uvb")), 4) >= threshold)
      .select(col("__idb").as(idCol)).distinct()
      .withColumn("__dup", lit(true))
    rows.join(dropped, Seq(idCol), "left")
      .select(col(idCol), col("cid"), col("__dup").isNull.as("kept"))
  }
}
