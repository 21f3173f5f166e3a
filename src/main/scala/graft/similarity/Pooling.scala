package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Vector pooling — element-wise mean of an embedding column per group
  * (class centroids, per-source prototypes, cluster summaries).
  *
  * Determinism: a parallel float mean is order-dependent (partial sums
  * arrive in shuffle order), so elements are first quantized to 1e-6
  * fixed point (floor-based, bit-reproducible — see Quantize) and
  * accumulated as LONGS: integer addition is associative, so the sum —
  * and therefore the mean — is identical run-to-run and
  * engine-to-engine regardless of partitioning.
  *
  * Scale design: explode fans out ×dim (bounded, e.g. 64–4096) into a
  * (group, dim) hash-agg with map-side partial merge; the reassembly
  * groups dim rows per key (bounded by dim) — no windows, no sorts
  * over data, no driver-side state.
  */
object Pooling {

  /** Per-dimension mean as scalar rows (g, dim, m) — the exchange
    * format (and the oracle-checkable shape: one double per row, no
    * array cells). `dim` is 0-based, long-typed. */
  def meanCentroidByDim(df: DataFrame, groupCol: Column, vecCol: Column): DataFrame = {
    // the ONE fixed-point quantization convention (shared with cluster
    // assignment) — a precision change must hit every operator at once
    val fixed = Clustering.fixedPoint(vecCol)
    // posexplode_outer, not posexplode: the fixed-point array is
    // computed, and InferFiltersFromGenerate + pushdown would inline
    // the whole quantization into an interpreted Filter (the q41 trap)
    val exploded = df
      .select(groupCol.as("g"), fixed.as("__fx"))
      .select(col("g"), posexplode_outer(col("__fx")).as(Seq("dim", "fx")))
      .filter(col("fx").isNotNull)
    exploded
      .groupBy(col("g"), col("dim").cast("long").as("dim"))
      .agg(sum(col("fx")).as("s"), count(lit(1)).as("n"))
      // + 0.0 collapses IEEE negative zero (round(-4e-7, 4) is -0.0 in
      // DuckDB, +0.0 here — adding +0.0 yields +0.0 on both engines)
      .select(col("g"), col("dim"),
        graft.functions.Fx.fx(col("s").cast("double") / (col("n") * lit(1e6)), 4).as("m"))
  }

  /** (groupCol, centroid array<double> rounded to 4dp), dims averaged
    * independently; rows with null vectors are ignored. */
  def meanCentroid(df: DataFrame, groupCol: Column, vecCol: Column): DataFrame =
    meanCentroidByDim(df, groupCol, vecCol)
      .groupBy(col("g"))
      .agg(transform(array_sort(collect_list(struct(col("dim"), col("m")))),
        s => s.getField("m")).as("centroid"))
}
