package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Cluster assignment — every vector to its nearest of k centroids (the
  * k-means E-step / semantic-grouping primitive: cluster-then-dedup,
  * topical sharding, IVF list building).
  *
  * Distances are computed in 1e-6 FIXED POINT (the Pooling/Quantize
  * convention): embeddings quantize to longs, the squared distance is a
  * pure integer sum — associative, so bit-identical under any
  * partitioning and any engine. A float distance would hang cluster
  * membership on last-ulp summation order for near-tied vectors; the
  * integer form makes assignment a hashable, oracle-checkable fact.
  * (Range: |fx| ≤ 2^21 for |x| ≤ 2, so a per-dimension difference is
  * ≤ 2^22, its square ≤ 2^44, and a 4096-dim squared distance bounds at
  * ~2^56 — inside a signed long's 2^63 with 2^7 headroom. Re-derive
  * before raising dimension count or fixed-point precision.)
  *
  * Scale design: the centroid set is a MODEL (k×dim doubles) shipped as
  * plan literals — the corpus pass is map-only, no join, no shuffle; the
  * driver collects only the k seed rows. Ties break to the lowest
  * centroid id on both engines.
  */
object Clustering {

  /** 1e-6 fixed-point quantization of a float/double vector (floor-based
    * — bit-reproducible; DuckDB mirror:
    * `list_transform(v, x -> CAST(floor(x::DOUBLE * 1000000 + 0.5) AS BIGINT))`). */
  def fixedPoint(vec: Column): Column =
    transform(vec, x => floor(x.cast("double") * lit(1e6) + lit(0.5)).cast("long"))

  /** Integer squared L2 distance to one quantized centroid literal. */
  private def sqDistFx(fx: Column, centroid: Array[Long]): Column =
    aggregate(
      zip_with(fx, lit(centroid), (a, b) => (a - b) * (a - b)),
      lit(0L), (acc, v) => acc + v)

  /** Deterministic seed centroids: the k lowest-id vectors, quantized.
    * (Driver-side model fetch — k rows, not data.) */
  def seedCentroids(corpus: DataFrame, idCol: String, vecCol: String,
                    k: Int): Array[Array[Long]] =
    corpus.select(col(idCol), fixedPoint(col(vecCol)).as("__fx"))
      .orderBy(col(idCol)).limit(k).collect()
      .map(_.getSeq[Long](1).toArray)

  /** Integer distances to every centroid, as one array column (index =
    * cluster id). The building block shared by [[assign]] and callers
    * that fold assignment into a wider map-only projection
    * ([[SemDedup]]). */
  private def distArray(vec: Column, centroids: Array[Array[Long]]): Column = {
    require(centroids.nonEmpty, "need at least one centroid")
    val fx = fixedPoint(vec)
    array(centroids.map(c => sqDistFx(fx, c)): _*)
  }

  /** Nearest-centroid id for one vector column; ties → lowest cid
    * (array_position returns the FIRST index of the minimum). */
  def nearestCid(vec: Column, centroids: Array[Array[Long]]): Column = {
    val dists = distArray(vec, centroids)
    (array_position(dists, array_min(dists)) - 1).cast("long")
  }

  /** (id, cid, dist): nearest-centroid assignment of every corpus row,
    * with the exact integer distance. `centroids` index order is the
    * cluster id; ties → lowest cid. */
  def assign(corpus: DataFrame, idCol: String, vecCol: String,
             centroids: Array[Array[Long]]): DataFrame = {
    val dists = distArray(col(vecCol), centroids)
    corpus.select(col(idCol),
        (array_position(dists, array_min(dists)) - 1).cast("long").as("cid"),
        array_min(dists).as("dist"))
  }
}
