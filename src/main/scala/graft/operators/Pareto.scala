package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Pareto-frontier selection over two criteria — the curation primitive
  * "keep documents not dominated on (length, quality)": a row is dropped
  * iff some other row in its group is >= on both axes and strictly
  * greater on at least one.
  *
  * Shape: the naive formulation is a per-group self-join (all-pairs —
  * O(n²) per group, a scale-killer on a 100 TB corpus). This instead
  * uses the classic sort-and-scan reduction: order the group by `x`;
  * a row is dominated iff the max `y` among STRICTLY larger `x` reaches
  * its own `y`, or the max `y` among EQUAL `x` strictly exceeds it.
  * Both maxes are RANGE-frame window aggregates sharing one
  * partitioning and one sort, so the whole operator costs a single hash
  * exchange + per-group sort (spillable, no group materialized in
  * memory) — the same cost class as any ranking window.
  *
  * `x` must be integer-typed: the strict ">" frame is expressed as
  * `RANGE BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING`, exact only on
  * integers (offset frames on doubles would make "strictly larger" a
  * float-epsilon question).
  */
object Pareto {

  /** Rows of `df` on the Pareto frontier of (`x` max, `y` max) within
    * each `group`. Ties on both axes are mutually non-dominating (no
    * strict axis) and are all kept. Null `x`/`y` rows are dropped first:
    * dominance is undefined on missing criteria. */
  def frontier(df: DataFrame, group: Column, x: Column, y: Column): DataFrame = {
    val byX      = Window.partitionBy(group).orderBy(x.asc)
    val largerX  = byX.rangeBetween(1, Window.unboundedFollowing)
    val sameX    = byX.rangeBetween(Window.currentRow, Window.currentRow)
    // collision-free scratch names: an input that already carries a
    // column with the bare name would be silently overwritten and then
    // dropped from the output
    def fresh(base: String): String =
      Iterator.from(0).map(i => if (i == 0) base else s"$base$i")
        .find(n => !df.columns.contains(n)).get
    val yMaxLarger = fresh("_y_max_larger_x")
    val yMaxSame   = fresh("_y_max_same_x")
    df.where(x.isNotNull && y.isNotNull)
      .withColumn(yMaxLarger, max(y).over(largerX))
      .withColumn(yMaxSame, max(y).over(sameX))
      .where(
        (col(yMaxLarger).isNull || col(yMaxLarger) < y) &&
          !(col(yMaxSame) > y))
      .drop(yMaxLarger, yMaxSame)
  }
}
