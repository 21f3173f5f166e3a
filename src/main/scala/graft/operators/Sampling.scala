package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Portable

/** Deterministic corpus sampling for training-data mixes — the two
  * primitives a "N docs / M tokens per source" recipe needs. Both order
  * each stratum by a salted content hash: a reproducible pseudo-random
  * shuffle that is a pure row function (same result on any cluster,
  * any partitioning — unlike rand()-based sampling), and changing the
  * salt redraws the sample.
  *
  * Scale: one hash-partition window per call — the same single-shuffle
  * shape as any per-group top-k; no global sort, no driver state.
  */
object Sampling {

  private def order(hashKey: Column, salt: String, tiebreak: Column) =
    Seq(Portable.h60(concat(hashKey, lit(salt))), tiebreak)

  /** First `n` rows per stratum in salted-hash order.
    * @param tiebreak any unique column — makes the order total when
    *                 hash keys collide (duplicate content). */
  def stratifiedSample(df: DataFrame, strata: Column, hashKey: Column,
                       tiebreak: Column, n: Int, salt: String = "",
                       out: String = "sample_rank"): DataFrame = {
    val w = Window.partitionBy(strata).orderBy(order(hashKey, salt, tiebreak): _*)
    df.withColumn(out, row_number().over(w)).filter(col(out) <= n)
  }

  /** Rows per stratum, in salted-hash order, until the running token
    * count exceeds `budget` (inclusive boundary: a doc whose tokens
    * make the cumulative total exactly `budget` is kept). */
  def tokenBudgetSample(df: DataFrame, strata: Column, hashKey: Column,
                        tiebreak: Column, tokens: Column, budget: Long,
                        salt: String = "",
                        out: String = "cum_tokens"): DataFrame = {
    val w = Window.partitionBy(strata).orderBy(order(hashKey, salt, tiebreak): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn(out, sum(tokens).over(w)).filter(col(out) <= budget)
  }
}
