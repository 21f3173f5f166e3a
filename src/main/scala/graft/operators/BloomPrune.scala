package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bloom-pruned semi-join — the runtime-filter pattern as a library
  * operator: build a Bloom filter over the (selective) right side's
  * join key, broadcast it, drop non-matching left rows MAP-SIDE, then
  * exact semi-join only the survivors. Output is EXACTLY a plain
  * left-semi join (Bloom false positives are removed by the final
  * exact join; a Bloom filter has no false negatives).
  *
  * Why it matters at 100 TB: a semi-join against a selective dimension
  * otherwise shuffles the ENTIRE fact table; the Bloom probe removes
  * the non-matching rows before the exchange, shrinking the shuffle to
  * ~the match rate. Spark's own InjectRuntimeFilter does this inside
  * eligible shuffle-join plans; this operator makes the same plan
  * available compositionally (e.g. above unions, ahead of
  * aggregations, or when AQE declines). Uses Spark's native
  * `bloom_filter_agg` / `might_contain` expressions (registered by
  * GraftExtensions), so the probe stays inside whole-stage codegen.
  */
object BloomPrune {

  /** Left-semi join of `left` on `leftKey ∈ right.rightKey`, Bloom-
    * pruned before the exact join. `expectedItems`/`numBits` size the
    * filter (defaults: 1M items at 8 bits/item ≈ 2% false-positive
    * rate → a ~1 MB filter).
    *
    * The filter AGGREGATION is distributed (partial merge across the
    * right side); only the finished filter binary comes to the driver —
    * `might_contain` requires a constant/scalar-subquery Bloom input,
    * so the operator plants it as a plan literal (model-sized, the
    * same posture as Ivf.fit's centroids). Building it is therefore an
    * EAGER action on `right`. */
  def semiJoin(left: DataFrame, leftKey: Column,
               right: DataFrame, rightKey: Column,
               expectedItems: Long = 1000000L,
               numBits: Long = 8000000L): DataFrame = {
    val bf = right.agg(call_function("bloom_filter_agg",
        xxhash64(rightKey), lit(expectedItems), lit(numBits)).as("bf"))
      .head().getAs[Array[Byte]](0)
    val keys = right.select(rightKey.as("__bp_k")).distinct()
    if (bf == null) { // empty right side: no filter, nothing matches
      left.join(keys, leftKey === col("__bp_k"), "left_semi")
    } else {
      left.filter(call_function("might_contain", lit(bf), xxhash64(leftKey)))
        .join(keys, leftKey === col("__bp_k"), "left_semi")
    }
  }
}
