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
    * the key's min and max observed `bucketCol` (inclusive). */
  def denseGrid(df: DataFrame, keys: Seq[String], bucketCol: String,
                step: Long): DataFrame = {
    require(keys.nonEmpty && step > 0)
    df.groupBy(keys.map(col): _*)
      .agg(min(col(bucketCol)).as("__lo"), max(col(bucketCol)).as("__hi"))
      .select(keys.map(col) :+
        explode_outer(sequence(col("__lo"), col("__hi"), lit(step))).as(bucketCol): _*)
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
