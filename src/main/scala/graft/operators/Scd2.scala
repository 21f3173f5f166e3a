package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SCD-2 intervalization — collapse a keyed change stream into validity
  * intervals `[valid_from, valid_to)` per attribute value (the "history
  * table" transform: dimension tracking, config audit trails, state
  * timelines). The open current interval carries a null `valid_to`.
  *
  * Consecutive observations with the SAME attribute value are compressed
  * into one interval (only change points survive), so the output size is
  * the number of transitions, not the number of observations.
  *
  * Scale design: two window passes over the SAME (key, order) window spec
  * — Catalyst plans ONE hash exchange + sort and evaluates the second
  * Window (the post-filter `lead`) on the already-partitioned, already-
  * sorted stream without re-shuffling (EnsureRequirements sees the
  * child's hashpartitioning satisfies the second window's requirement).
  * State per group is O(1) (lag/lead of one row). No self-join, no
  * driver-side timeline assembly.
  */
object Scd2 {

  /** `df` is an observation stream: one row per (entity, time) carrying
    * the attribute's current value. Emits (keys, attr, valid_from,
    * valid_to?) with half-open intervals ordered by `orderCol`.
    *
    * Null attribute values are treated as a value (a null-to-X transition
    * is a change point): `<=>`-equality in the compression filter.
    *
    * `tiebreak` columns extend the window ordering when `orderCol`
    * alone is not a total order within a key — same-timestamp
    * observations with different values would otherwise make the
    * change-point set (and any cross-engine compare) nondeterministic. */
  def intervalize(df: DataFrame, keys: Seq[String], orderCol: String,
                  attr: String, validFrom: String = "valid_from",
                  validTo: String = "valid_to",
                  tiebreak: Seq[String] = Nil): DataFrame = {
    require(keys.nonEmpty, "keys required")
    val keyCols: Seq[Column] = keys.map(col)
    val w = Window.partitionBy(keyCols: _*)
      .orderBy(col(orderCol) +: tiebreak.map(col): _*)
    df.select(keyCols ++ Seq(col(orderCol)) ++ tiebreak.map(col) :+ col(attr): _*)
      // change points: first observation, or value differs from previous
      // (null-safe: null==null compresses, null->X is a transition).
      // Both computed as window COLUMNS first — a window function can't
      // sit inside a Filter condition — then filtered; same window spec,
      // so still one exchange + sort.
      .withColumn("__prev", lag(col(attr), 1).over(w))
      .withColumn("__first", row_number().over(w) === 1)
      .filter(col("__first") || !(col("__prev") <=> col(attr)))
      .withColumn(validTo, lead(col(orderCol), 1).over(w))
      .withColumnRenamed(orderCol, validFrom)
      .drop("__prev" +: "__first" +: tiebreak: _*)
      .select(keyCols ++ Seq(col(attr), col(validFrom), col(validTo)): _*)
  }
}
