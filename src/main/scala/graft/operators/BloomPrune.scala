package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

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

  /** The single type BOTH keys are cast to before xxhash64. Hashing the
    * native types would be a silent-wrong-answer trap: INT-vs-BIGINT
    * keys are join-coercible (the exact join matches them), but
    * xxhash64(int) != xxhash64(bigint) for the same value, so the probe
    * would yield false NEGATIVES and drop matching rows. Integral pairs
    * hash as long; any numeric pair as double (values equal under the
    * join's coercion are exactly equal after the cast, so
    * no-false-negatives is preserved); anything else must match
    * exactly — coercion there (e.g. string vs int) is dialect-subtle
    * and the caller should cast explicitly. */
  // IntegralType/NumericType are sealed inside spark.sql — enumerate
  private def isIntegral(t: DataType): Boolean = t match {
    case ByteType | ShortType | IntegerType | LongType => true
    case _ => false
  }
  private def isNumeric(t: DataType): Boolean = t match {
    case FloatType | DoubleType | _: DecimalType => true
    case t => isIntegral(t)
  }

  private[graft] def commonHashType(lt: DataType, rt: DataType): DataType =
    if (lt == rt) lt
    else if (isIntegral(lt) && isIntegral(rt)) LongType
    else if (isNumeric(lt) && isNumeric(rt)) DoubleType
    else throw new IllegalArgumentException(
      s"BloomPrune.semiJoin: key types $lt vs $rt have no unambiguous " +
        "common hash type; cast the join keys explicitly")

  /** Spark's bloom_filter_agg SILENTLY Math.min-clamps its arguments to
    * spark.sql.optimizer.runtime.bloomFilter.{maxNumBits,maxNumItems}
    * (defaults 2^26 bits / 4M items) — sizing past those would hand the
    * caller a saturated filter while claiming ~1% FPR, so the auto-size
    * caps at the session's own limits instead. */
  private def confCap(spark: org.apache.spark.sql.SparkSession,
                      key: String, default: Long): Long =
    spark.conf.getOption(key).flatMap(v => scala.util.Try(v.toLong).toOption)
      .getOrElse(default)

  /** Auto-sizing from the right side's (approximate) distinct key
    * count: 10 bits/item ≈ 1% false-positive rate at the optimal hash
    * count; floored so tiny dimensions still get a working filter and
    * capped at `maxBits` (the aggregate's own clamp — past it the extra
    * bits are silently discarded anyway, and the finished filter is a
    * plan literal, so oversizing only bloats the plan). */
  private[graft] def autoBits(distinctItems: Long, maxBits: Long = 1L << 26): Long =
    math.min(math.max(distinctItems, 64L) * 10L, maxBits)

  /** Left-semi join of `left` on `leftKey ∈ right.rightKey`, Bloom-
    * pruned before the exact join. `expectedItems`/`numBits` size the
    * filter; leave them <= 0 (the default) to auto-size from a cheap
    * `approx_count_distinct` pass over the right side — one extra
    * aggregate-only job on the SELECTIVE side, paid once, which avoids
    * the two fixed-size failure modes (a 1 MB literal for a 100-row dim;
    * a saturated useless filter for a 100M-key dim).
    *
    * The filter AGGREGATION is distributed (partial merge across the
    * right side); only the finished filter binary comes to the driver —
    * `might_contain` requires a constant/scalar-subquery Bloom input,
    * so the operator plants it as a plan literal (model-sized, the
    * same posture as Ivf.fit's centroids). Building it is therefore an
    * EAGER action on `right`. */
  def semiJoin(left: DataFrame, leftKey: Column,
               right: DataFrame, rightKey: Column,
               expectedItems: Long = -1L,
               numBits: Long = -1L): DataFrame = {
    val ht = commonHashType(
      left.select(leftKey).schema.head.dataType,
      right.select(rightKey).schema.head.dataType)
    val spark = right.sparkSession
    val maxItems = confCap(spark,
      "spark.sql.optimizer.runtime.bloomFilter.maxNumItems", 4000000L)
    val maxBits = confCap(spark,
      "spark.sql.optimizer.runtime.bloomFilter.maxNumBits", 1L << 26)
    val distinct =
      if (expectedItems > 0) expectedItems
      else math.max(64L,
        right.agg(approx_count_distinct(rightKey)).head().getLong(0))
    val items = math.min(distinct, maxItems)
    val bits = if (numBits > 0) numBits else autoBits(distinct, maxBits)
    if (distinct > maxItems)
      org.slf4j.LoggerFactory.getLogger(getClass).warn(
        s"BloomPrune: right side has ~$distinct distinct keys but the " +
          s"session clamps bloom filters to $maxItems items/$maxBits bits — " +
          "expect a high false-positive rate (the join stays exact); raise " +
          "spark.sql.optimizer.runtime.bloomFilter.maxNumBits or skip the probe")
    val bf = right.agg(call_function("bloom_filter_agg",
        xxhash64(rightKey.cast(ht)), lit(items), lit(bits)).as("bf"))
      .head().getAs[Array[Byte]](0)
    val keys = right.select(rightKey.as("__bp_k")).distinct()
    if (bf == null) { // empty right side: no filter, nothing matches
      left.join(keys, leftKey === col("__bp_k"), "left_semi")
    } else {
      left.filter(call_function("might_contain",
          lit(bf), xxhash64(leftKey.cast(ht))))
        .join(keys, leftKey === col("__bp_k"), "left_semi")
    }
  }
}
