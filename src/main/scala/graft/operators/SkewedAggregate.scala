package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Two-phase salted aggregation for skewed keys: phase 1 aggregates on
  * (key, salt) — spreading a hot key across `saltBuckets` reducers —
  * phase 2 merges the partials per key.
  *
  * Use when one grouping key dominates (a viral document source, a
  * default user id): AQE's skew handling splits skewed JOIN partitions
  * but pre-AQE aggregation skew still serializes on one reducer. With a
  * re-associable aggregate (sum/count/min/max), salting makes the first
  * shuffle uniform by construction. At 100 TB this is the difference
  * between a 5-minute and a 5-hour stage when key frequency is Zipfian.
  */
object SkewedAggregate {

  /** Salted sum/count aggregation.
    * @param sums  (inputCol → outputName) columns to sum
    * @param saltBuckets salt fan-out (≈ executor count is a good default)
    */
  def saltedSumCount(df: DataFrame, keys: Seq[String],
                     sums: Map[String, String],
                     countName: String = "n",
                     saltBuckets: Int = 32): DataFrame = {
    val salted = df.withColumn("__salt",
      pmod(spark_partition_id() + monotonically_increasing_id(), lit(saltBuckets)))
    val phase1 = salted
      .groupBy((keys :+ "__salt").map(col): _*)
      .agg(
        count(lit(1)).as(s"__c"),
        sums.keys.toSeq.sorted.map(c => sum(col(c)).as(s"__s_$c")): _*)
    phase1
      .groupBy(keys.map(col): _*)
      .agg(
        sum(col("__c")).as(countName),
        sums.toSeq.sortBy(_._1).map { case (c, out) =>
          sum(col(s"__s_$c")).as(out)
        }: _*)
  }
}
