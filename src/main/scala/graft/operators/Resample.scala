package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series regularization — densify a keyed bucket series onto a
  * complete grid (every step between each key's first and last
  * observation) and fill the gaps (telemetry dashboards, feature
  * windows, anything that must distinguish "no events" from "no row").
  *
  * Scale design: the grid is generated per key from that key's own
  * [min, max] span (one aggregation), so a quiet key costs its own span
  * only — no global calendar cross join. The generator is an exploded
  * `sequence` (codegen); the join back to observations is a
  * co-partitioned equi-join on (key, bucket); forward fill is one
  * running-frame window per key. Three key-partitioned exchanges total,
  * no driver state.
  */
object Resample {

  /** One row per (key, bucket) for every `step`-spaced bucket between
    * the key's min and max observed `bucketCol` (inclusive).
    *
    * PRECONDITION (checked): within each key, every observed bucket is
    * congruent to the key's minimum mod `step` — i.e. the input is
    * already bucketized on this step (the normal upstream is a
    * `bucket30mStart`-style floor). An off-grid bucket would otherwise
    * silently miss the generated grid and its row would VANISH from the
    * gap-filled join — data loss, not an error — so misalignment throws
    * here instead. The check rides the same aggregation as the span
    * (zero extra shuffles). */
  def denseGrid(df: DataFrame, keys: Seq[String], bucketCol: String,
                step: Long): DataFrame = {
    require(keys.nonEmpty && step > 0)
    val spans = df.groupBy(keys.map(col): _*)
      .agg(min(col(bucketCol)).as("__lo"), max(col(bucketCol)).as("__hi"),
        countDistinct(pmod(col(bucketCol), lit(step))).as("__phases"))
    // the check stays INSIDE the plan (assert_true gating the sequence
    // expression — no eager job, and unprunable because the grid
    // depends on it); fires per misaligned key at execution time
    val guardedSeq = when(
      assert_true(col("__phases") <= 1,
        lit(s"denseGrid: observed buckets are not aligned to step=$step " +
          "— bucketize upstream first")).isNull,
      sequence(col("__lo"), col("__hi"), lit(step)))
    spans.select(keys.map(col) :+
      explode_outer(guardedSeq).as(bucketCol): _*)
  }

  /** Forward-fill `cols` along `orderCol` within each key: nulls take
    * the latest preceding non-null value (the first rows of a key stay
    * null until one exists). */
  def forwardFill(df: DataFrame, keys: Seq[String], orderCol: String,
                  cols: Seq[String]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cols.foldLeft(df)((d, c) =>
      d.withColumn(c, last(col(c), ignoreNulls = true).over(w)))
  }

  /** The composed resample: aggregate per (key, bucket) upstream, then
    * `gapFill` densifies and fills — count-like columns coalesce to
    * zero (`zeroFill`), level-like columns carry forward (`ffill`,
    * emitted as `<col>_ffill` next to the zero-filled original). */
  def gapFill(observed: DataFrame, keys: Seq[String], bucketCol: String,
              step: Long, zeroFill: Map[String, Column],
              ffill: Seq[String]): DataFrame = {
    val grid = denseGrid(observed, keys, bucketCol, step)
    val joined = grid.join(observed, keys :+ bucketCol, "left")
    val filled = forwardFill(
      ffill.foldLeft(joined)((d, c) => d.withColumn(s"${c}_ffill", col(c))),
      keys, bucketCol, ffill.map(c => s"${c}_ffill"))
    zeroFill.foldLeft(filled) { case (d, (c, z)) =>
      d.withColumn(c, coalesce(col(c), z))
    }
  }
}
