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

  /** `buckets` sentinel: derive the bucket count from cluster
    * parallelism and the (approximate) group cardinality. */
  val AutoBuckets: Int = 0

  /** Rows of `df` on the Pareto frontier of (`x` max, `y` max) within
    * each `group`. Ties on both axes are mutually non-dominating (no
    * strict axis) and are all kept. Null or NaN `x`/`y` rows are
    * dropped first: dominance is undefined on missing criteria, and a
    * NaN criterion is a missing criterion (NaN also breaks the wide
    * form's width_bucket map — it returns NULL — so filtering keeps the
    * two forms bit-identical instead of silently diverging on it).
    *
    * `buckets` > 1 selects the TWO-PHASE form for coarse group keys: a
    * group-partitioned window parallelizes at most |groups|-way (the
    * 30× scale run measured exactly this — 5 language groups pinned
    * q116 to 5 cores, SCALE30_r08.json), so the wide form splits each
    * group into `buckets` x-ranges (equal-width over the group's x
    * span — a deterministic, monotone, same-x-same-bucket map), runs
    * the same two windows per (group, bucket), and resolves
    * cross-bucket dominance through a |groups|×|buckets|-row bucket-max
    * summary joined back broadcast: every x in a higher bucket is
    * strictly larger, so a row is cross-bucket dominated iff the
    * suffix max of later buckets' y reaches its y. Bit-identical
    * results to the narrow form (ParetoSpec property) at
    * groups×buckets-way parallelism.
    *
    * The default ([[AutoBuckets]]) derives `buckets` as
    * `clamp(defaultParallelism / approxGroups)` so callers get the
    * coarse-group parallelism fix without knowing the 30× lesson:
    * plenty of distinct groups → 1 (the narrow single-exchange form);
    * few coarse groups → enough buckets to fill the cluster. The group
    * cardinality comes from one column-pruned approx_count_distinct
    * pass over the input; a caller whose upstream is expensive to
    * recompute should pass `buckets` explicitly (or a caching `scope`). */
  def frontier(df: DataFrame, group: Column, x: Column, y: Column,
               buckets: Int = AutoBuckets,
               scope: graft.CacheScope = graft.CacheScope.unmanaged): DataFrame = {
    require(buckets >= 0, s"buckets must be >= 0 (0 = auto), got $buckets")
    val b = if (buckets != AutoBuckets) buckets else {
      val par = math.max(1, df.sparkSession.sparkContext.defaultParallelism)
      val groups = math.max(1L,
        df.agg(approx_count_distinct(group)).head().getLong(0))
      math.max(1L, math.min(par.toLong, (par + groups - 1) / groups)).toInt
    }
    if (b == 1) frontierNarrow(df, group, x, y)
    else frontierWide(df, group, x, y, b, scope)
  }

  /** Null-or-NaN-criterion filter shared by both forms (NaN compares
    * via the double cast, a no-op on integer axes). */
  private def valid(x: Column, y: Column): Column =
    x.isNotNull && y.isNotNull && !x.cast("double").isNaN && !y.cast("double").isNaN

  private def fresh(df: DataFrame, base: String): String =
    Iterator.from(0).map(i => if (i == 0) base else s"$base$i")
      .find(n => !df.columns.contains(n)).get

  private def frontierWide(df: DataFrame, group: Column, x: Column, y: Column,
                           buckets: Int, scope: graft.CacheScope): DataFrame = {
    val gN = fresh(df, "_pareto_g"); val xN = fresh(df, "_pareto_x")
    val yN = fresh(df, "_pareto_y"); val bN = fresh(df, "_pareto_b")
    val loN = fresh(df, "_pareto_lo"); val hiN = fresh(df, "_pareto_hi")
    val inLargerN = fresh(df, "_pareto_in_larger")
    val inSameN = fresh(df, "_pareto_in_same")
    val bmaxN = fresh(df, "_pareto_bmax"); val sfxN = fresh(df, "_pareto_sfx")
    val gR = fresh(df, "_pareto_gr")
    val in = df.where(valid(x, y))
      .withColumn(gN, group).withColumn(xN, x).withColumn(yN, y)
    // per-group x span: |groups| rows — the model, not the data
    val ranges = in.groupBy(col(gN))
      .agg(min(col(xN)).as(loN), max(col(xN)).as(hiN))
      .withColumnRenamed(gN, gR)
    // NULL-SAFE group join: the narrow form's window keeps a NULL group
    // as its own partition (and so does the oracle's PARTITION BY), so
    // an inner EqualTo join here would silently drop those rows and
    // break the bit-identical contract — <=> preserves them
    // width_bucket over [lo, hi+1) maps x ∈ [lo, hi] to 1..buckets;
    // the double cast is monotone and value-deterministic, so equal x
    // always shares a bucket and higher buckets hold strictly larger x
    // cached (scope): bucketed feeds the window stage AND the bucket-max
    // summary — uncached, the whole upstream (including a potentially
    // expensive y expression) would execute twice
    val bucketed = scope.cache(
      in.join(broadcast(ranges), col(gN) <=> col(gR))
        .withColumn(bN, width_bucket(col(xN).cast("double"),
          col(loN).cast("double"), col(hiN).cast("double") + 1d, lit(buckets)))
        .drop(gR, loN, hiN))
    // phase 1: the narrow form's two windows, per (group, bucket)
    val byX     = Window.partitionBy(col(gN), col(bN)).orderBy(col(xN).asc)
    val largerX = byX.rangeBetween(1, Window.unboundedFollowing)
    val sameX   = byX.rangeBetween(Window.currentRow, Window.currentRow)
    val staged = bucketed
      .withColumn(inLargerN, max(col(yN)).over(largerX))
      .withColumn(inSameN, max(col(yN)).over(sameX))
    // phase 2: cross-bucket suffix max of per-bucket y maxes (tiny);
    // the join back is null-safe on the group for the same reason as
    // the ranges join (bucket ids are never null — x is filtered)
    val bR = fresh(df, "_pareto_br")
    val bmax = bucketed.groupBy(col(gN), col(bN)).agg(max(col(yN)).as(bmaxN))
    val suffix = bmax.withColumn(sfxN,
        max(col(bmaxN)).over(Window.partitionBy(col(gN)).orderBy(col(bN).asc)
          .rowsBetween(1, Window.unboundedFollowing)))
      .select(col(gN).as(gR), col(bN).as(bR), col(sfxN))
    staged.join(broadcast(suffix),
        col(gN) <=> col(gR) && col(bN) === col(bR))
      .where(
        (col(inLargerN).isNull || col(inLargerN) < col(yN)) &&
          !(col(inSameN) > col(yN)) &&
          (col(sfxN).isNull || col(sfxN) < col(yN)))
      .select(df.columns.map(col).toSeq: _*)
  }

  private def frontierNarrow(df: DataFrame, group: Column, x: Column, y: Column): DataFrame = {
    val byX      = Window.partitionBy(group).orderBy(x.asc)
    val largerX  = byX.rangeBetween(1, Window.unboundedFollowing)
    val sameX    = byX.rangeBetween(Window.currentRow, Window.currentRow)
    // collision-free scratch names: an input that already carries a
    // column with the bare name would be silently overwritten and then
    // dropped from the output
    val yMaxLarger = fresh(df, "_y_max_larger_x")
    val yMaxSame   = fresh(df, "_y_max_same_x")
    df.where(valid(x, y))
      .withColumn(yMaxLarger, max(y).over(largerX))
      .withColumn(yMaxSame, max(y).over(sameX))
      .where(
        (col(yMaxLarger).isNull || col(yMaxLarger) < y) &&
          !(col(yMaxSame) > y))
      .drop(yMaxLarger, yMaxSame)
  }
}
