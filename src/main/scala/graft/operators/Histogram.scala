package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Equi-width histogram for data profiling — in pure integer math so
  * every engine computes the identical binning (the cross-engine
  * contract): the caller discretizes the value to an exact integer
  * (cents, basis points, bytes), and bucket `b` of `nb` over the
  * observed range [lo, hi] is `(v − lo)·nb div (hi − lo + 1)` —
  * always in [0, nb), no float edge ambiguity, no "max lands in a
  * phantom bucket" special case.
  *
  * Scale design: the corpus pays ONE partial-merged aggregation (per
  * distinct value) plus one stats scan that Catalyst reduces to
  * partial min/max — a map-only pass shipping ONE row per partition
  * (no data shuffle; the optimizer rewrites min/max-over-groupBy to
  * min/max-over-scan, which is strictly cheaper than reusing the
  * count exchange). Binning and the final bucket roll-up then run on
  * the domain-sized value relation (distinct integers, not rows): a
  * 100 TB column with a few million distinct discretized values
  * histograms with one shuffle of a few million rows.
  */
object Histogram {

  /** @param value integer-valued column (cast internally to long).
    * @return (bucket, n) — empty buckets absent (roll up client-side
    *         or gap-fill with [[Resample.denseGrid]] if needed). */
  def equiWidth(df: DataFrame, value: Column, buckets: Int): DataFrame = {
    require(buckets >= 1, "buckets must be >= 1")
    val perVal = df.select(value.cast("long").as("__v"))
      .filter(col("__v").isNotNull)
      .groupBy(col("__v")).agg(count(lit(1)).as("__n"))
    val stats = perVal.agg(min(col("__v")).as("__lo"), max(col("__v")).as("__hi"))
    perVal.crossJoin(broadcast(stats))
      .select(call_function("div",
          (col("__v") - col("__lo")) * buckets,
          col("__hi") - col("__lo") + 1L).as("bucket"),
        col("__n"))
      .groupBy(col("bucket")).agg(sum(col("__n")).as("n"))
  }
}
