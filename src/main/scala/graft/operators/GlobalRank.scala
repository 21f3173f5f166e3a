package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact GLOBAL ranking without a global sort — the curriculum-ordering
  * primitive: "rank every document in the corpus by difficulty" cannot
  * afford `row_number() OVER (ORDER BY score)` at 100 TB, because a
  * partition-less window collapses the whole corpus into ONE task (a
  * single-machine sort of 100 TB). When the score is a bounded-domain
  * integer (quality basis points, token counts, any discretized
  * signal), the rank decomposes exactly:
  *
  *   rank(row) = |rows with smaller score|  +  rank within its score
  *
  * The first term is a per-score-value count aggregation (domain-sized,
  * partial-merged) with a running sum over the TINY distinct-value
  * relation; the second is a window partitioned BY score value — a
  * normal hash-partitioned, spillable window. No stage ever sees more
  * than one score-value's rows in one task.
  *
  * Scale design: one map-side-combined aggregation over the corpus +
  * one broadcast of the domain-sized offset table + one hash-window
  * exchange. The offset table's own running sum IS a partition-less
  * window, but over ≤ |score domain| rows (thousands), not the corpus.
  * Skew bound: the largest single score-value's row set must fit a
  * window sort spill — the same bound as any per-group window; salt the
  * tiebreak stage if a degenerate domain (e.g. one constant) is
  * expected.
  */
object GlobalRank {

  /** @param tiebreak unique column making the global order total
    *                 (score asc, tiebreak asc — both engines agree).
    * @return input + `out` = exact 1-based global rank. */
  def globalRank(df: DataFrame, score: Column, tiebreak: Column,
                 out: String = "global_rank"): DataFrame = {
    val withScore = df.withColumn("__gr_s", score.cast("long"))
    // domain-sized: one row per distinct score value
    val offsets = withScore.groupBy(col("__gr_s")).agg(count(lit(1)).as("__gr_n"))
      .withColumn("__gr_off",
        coalesce(sum(col("__gr_n")).over(
          Window.orderBy(col("__gr_s"))
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("__gr_s"), col("__gr_off"))
    val within = Window.partitionBy(col("__gr_s")).orderBy(tiebreak.asc)
    withScore
      .join(broadcast(offsets), Seq("__gr_s"))
      .withColumn(out, col("__gr_off") + row_number().over(within))
      .drop("__gr_s", "__gr_off")
  }
}
