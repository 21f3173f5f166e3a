package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Batch sessionization (gaps-and-islands): a new session starts when
  * the gap since the previous event on the same key exceeds `gapSec`.
  * One hash exchange on the key + per-partition sort; the running sum
  * of session-start flags assigns dense per-key session indexes.
  * (The streaming twin lives in graft.streaming — state instead of
  * windows.) */
object Sessionize {

  /** Adds `session_id` (0-based per key). `orderTiebreak` pins ordering
    * under equal timestamps for deterministic tests/oracles. */
  def withSessionId(df: DataFrame, key: String, time: String,
                    gapSec: Long, orderTiebreak: Seq[Column] = Nil): DataFrame = {
    val w = Window.partitionBy(col(key)).orderBy(col(time) +: orderTiebreak: _*)
    val flag = when(
      lag(col(time), 1).over(w).isNull ||
        col(time) - lag(col(time), 1).over(w) > gapSec, 1L).otherwise(0L)
    df.withColumn("session_id",
      sum(flag).over(w.rowsBetween(Window.unboundedPreceding, 0)) - 1)
  }

  /** Per-session stats: event count, bounds, value sum. */
  def sessionStats(df: DataFrame, key: String, time: String, gapSec: Long,
                   valueCol: String, orderTiebreak: Seq[Column] = Nil): DataFrame =
    withSessionId(df, key, time, gapSec, orderTiebreak)
      .groupBy(col(key), col("session_id"))
      .agg(
        count(lit(1)).as("n_events"),
        min(col(time)).as("start_time"),
        max(col(time)).as("end_time"),
        graft.functions.Fx.fx(sum(col(valueCol)), 2).as("sum_value"))
}
