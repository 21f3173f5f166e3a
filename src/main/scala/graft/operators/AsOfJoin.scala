package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed as-of join (the operator the reference approximates with
  * sort+shift for the self-join case — SURVEY.md §2.3): for each left
  * row, the latest right row with rightTime ≤ leftTime on the same key,
  * optionally within a tolerance.
  *
  * Implementation is the union+carry-forward form: tag both inputs,
  * union, ONE hash exchange on the key, per-partition sort on
  * (time, tag), then `last(_, ignoreNulls)` carries the most recent
  * right payload forward into each left row.
  *
  * Scale rationale: |L|+|R| rows through a single shuffle — no
  * broadcast, no range explosion, no per-key driver loops; skew follows
  * the key distribution exactly like any window. This beats a
  * sort-merge-join-with-inequality (which Spark would plan as a
  * broadcast nested loop) at any interesting size.
  */
object AsOfJoin {

  /** @param rightCols right columns to carry (renamed as-is onto output)
    * @param toleranceSec max leftTime − rightTime; None = unbounded
    * @param joinType "left" keeps unmatched left rows (null right cols);
    *                 "inner" drops them. */
  def asofJoin(left: DataFrame, right: DataFrame, key: String,
               leftTime: String, rightTime: String,
               rightCols: Seq[String],
               toleranceSec: Option[Long] = None,
               joinType: String = "left"): DataFrame = {
    require(Seq("left", "inner").contains(joinType), s"unsupported joinType $joinType")
    val leftCols = left.columns.toSeq
    val l = left.select(
      col(key).as("_k"), col(leftTime).as("_t"), lit(1).as("_is_left"),
      struct(leftCols.map(col): _*).as("_lpay"),
      lit(null).cast(right.select(rightCols.map(col): _*).schema.toDDL match {
        case ddl => s"struct<$ddl>"
      }).as("_rpay"))
    val r = right.select(
      col(key).as("_k"), col(rightTime).as("_t"), lit(0).as("_is_left"),
      lit(null).cast(left.select(leftCols.map(col): _*).schema.toDDL match {
        case ddl => s"struct<$ddl>"
      }).as("_lpay"),
      struct(rightCols.map(col): _*).as("_rpay"))
    // right rows sort before left rows at equal time → a right row at
    // exactly leftTime matches (asof is ≤)
    val w = Window.partitionBy(col("_k")).orderBy(col("_t"), col("_is_left"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val carried = l.unionByName(r)
      .withColumn("_carried", last(col("_rpay"), ignoreNulls = true).over(w))
      .withColumn("_carried_t", last(when(col("_is_left") === 0, col("_t")), ignoreNulls = true).over(w))
      .filter(col("_is_left") === 1)
    val withinTol = toleranceSec match {
      case Some(tol) => when(col("_t") - col("_carried_t") <= tol, col("_carried"))
      case None      => col("_carried")
    }
    val matched = carried.withColumn("_m", withinTol)
    val base = if (joinType == "inner") matched.filter(col("_m").isNotNull) else matched
    base.select(
      leftCols.map(c => col(s"_lpay.$c").as(c)) ++
        rightCols.map(c => col(s"_m.$c").as(s"asof_$c")): _*)
  }
}
