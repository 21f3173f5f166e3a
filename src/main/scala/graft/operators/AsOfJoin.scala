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
    // right rows with null key or null time can never match (SQL join
    // semantics) — drop them before the union so the carry-forward can't
    // smuggle their payload into a left row. Left rows with null key/time
    // then land in partitions/positions where nothing is carried → they
    // come out unmatched, exactly as a join would leave them.
    val r = right
      .filter(col(key).isNotNull && col(rightTime).isNotNull)
      .select(
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

  /** The native path: plans the custom AsOfMergeJoinExec (one hash
    * exchange + sort per side, O(1)-state merge — graft.plans
    * .AsOfMergeJoin) instead of the union+window rewrite above. Needs
    * GraftExtensions' strategy on the session. Same semantics; output is
    * `left.* ++ right.*`, so column names must not collide (rename the
    * right side first — e.g. prefix `asof_`).
    *
    * Time columns must be integral epochs (LongType) on both sides;
    * `tolerance` is in the same units. */
  def asofMergeJoin(left: DataFrame, right: DataFrame,
                    leftKeys: Seq[String], rightKeys: Seq[String],
                    leftTime: String, rightTime: String,
                    tolerance: Option[Long] = None,
                    joinType: String = "left"): DataFrame = {
    import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute}
    import org.apache.spark.sql.catalyst.plans.logical.Project
    import org.apache.spark.sql.graftbridge.GraftPlanBridge
    import org.apache.spark.sql.types.LongType
    require(Seq("left", "inner").contains(joinType), s"unsupported joinType $joinType")
    require(leftKeys.length == rightKeys.length && leftKeys.nonEmpty,
      "need matching non-empty key lists")
    val overlap = left.columns.toSet intersect right.columns.toSet
    require(overlap.isEmpty,
      s"output would carry ambiguous names ${overlap.mkString(", ")} — rename the right side")

    val lPlan = GraftPlanBridge.analyzed(left)
    val rPlan0 = GraftPlanBridge.analyzed(right)
    // self-join safety: re-alias the right side when attribute ids collide
    val rPlan =
      if (lPlan.outputSet.intersect(rPlan0.outputSet).isEmpty) rPlan0
      else Project(rPlan0.output.map(a => Alias(a, a.name)()), rPlan0)

    def attr(plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan,
             name: String): Attribute =
      plan.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(
          s"column $name not in [${plan.output.map(_.name).mkString(", ")}]"))
    val lt = attr(lPlan, leftTime); val rt = attr(rPlan, rightTime)
    require(lt.dataType == LongType && rt.dataType == LongType,
      s"time columns must be LongType epochs, got ${lt.dataType}/${rt.dataType}")

    GraftPlanBridge.ofRows(left.sparkSession,
      graft.plans.AsOfJoinNode(lPlan, rPlan,
        leftKeys.map(attr(lPlan, _)), rightKeys.map(attr(rPlan, _)),
        lt, rt, tolerance, isInner = joinType == "inner"))
  }
}
