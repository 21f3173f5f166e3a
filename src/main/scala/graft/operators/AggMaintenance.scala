package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental aggregate maintenance — keep a grouped aggregate fresh
  * by merging per-batch PARTIALS instead of recomputing over history
  * (algebraic materialized-view maintenance: daily rollups over a
  * 100 TB event log where each refresh may only touch the new day).
  *
  * The state table carries decomposable components per key —
  * (n, sum, min, max) — from which the presentation aggregates
  * (count, sum, avg, min, max) derive. Merging two states is the same
  * keyed aggregation as building one: counts/sums add, min/max fold —
  * exactly the map-side partial / reduce-side final split Spark plans
  * internally, lifted to a PERSISTENT seam. One partial-agg'd shuffle
  * per refresh, over batch ∪ state (≈ |keys| + |batch| rows, not
  * |history|).
  */
object AggMaintenance {

  /** Build the aggregate STATE of one batch: per key, the decomposable
    * components of `valueCol`. */
  def state(batch: DataFrame, keys: Seq[String], valueCol: String): DataFrame = {
    require(keys.nonEmpty, "keys required")
    batch.groupBy(keys.map(col): _*).agg(
      count(col(valueCol)).as("agg_n"),
      sum(col(valueCol)).as("agg_sum"),
      min(col(valueCol)).as("agg_min"),
      max(col(valueCol)).as("agg_max"))
  }

  /** Merge any number of state tables (the refresh step): components
    * re-aggregate associatively. */
  def merge(states: Seq[DataFrame], keys: Seq[String]): DataFrame = {
    require(states.nonEmpty, "no states")
    states.reduce(_ unionByName _)
      .groupBy(keys.map(col): _*).agg(
        sum(col("agg_n")).as("agg_n"),
        sum(col("agg_sum")).as("agg_sum"),
        min(col("agg_min")).as("agg_min"),
        max(col("agg_max")).as("agg_max"))
  }

  /** Presentation view over a state: the user-facing aggregates,
    * including the non-trivially-derived mean. */
  def present(state: DataFrame, keys: Seq[String],
              roundTo: Int = 2): DataFrame =
    state.select(keys.map(col) ++ Seq(
      col("agg_n").as("n"),
      graft.functions.Fx.fx(col("agg_sum").cast("double"), roundTo).as("sum_value"),
      graft.functions.Fx.fx(col("agg_sum").cast("double") / col("agg_n"), roundTo).as("avg_value"),
      col("agg_min").as("min_value"),
      col("agg_max").as("max_value")): _*)
}
