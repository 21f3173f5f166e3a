package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Per-group quota cap — keep the best `n` rows of every group (the
  * "domain cap" curation stage: bound any single web domain's share of a
  * training corpus; also top-n-per-key reporting).
  *
  * Scale design: the rank-then-filter shape is deliberately the one
  * Spark's optimizer rewrites into `WindowGroupLimit` — each map task
  * pre-truncates to its local top-n PER GROUP before the exchange
  * (InferWindowGroupLimit + WindowGroupLimitExec, Spark 3.5+), so the
  * shuffle carries at most n·partitions rows per group instead of the
  * whole group. A skewed domain with 10^9 pages costs each mapper only n
  * rows of shuffle. PlanAuditSpec asserts the rewrite fires.
  */
object QuotaCap {

  /** Keep `n` rows per group, best-first by `order` (row_number ranking:
    * deterministic iff `order` is a total order within a group — include
    * a unique tiebreak column). */
  def capPerGroup(df: DataFrame, groupCols: Seq[String],
                  order: Seq[Column], n: Int): DataFrame = {
    require(n > 0, "cap must be positive")
    require(!df.columns.contains("__rn"),
      "input already has a __rn column — it would be silently destroyed")
    df.withColumn("__rn", row_number().over(
        Window.partitionBy(groupCols.map(col): _*).orderBy(order: _*)))
      .filter(col("__rn") <= n)
      .drop("__rn")
  }
}
