package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order clustered layout — write a table sorted along a space-filling
  * curve over several columns so parquet min/max statistics prune
  * multi-dimensional box predicates (the technique behind Delta/Iceberg
  * `OPTIMIZE ZORDER BY`). A single-column sort clusters only its leading
  * column: a filter on the second dimension reads every file. Bit
  * interleaving gives every clustered column locality, so a box
  * predicate on ANY subset of them skips most files.
  *
  * Scale design: one stats pass (min/max per column — a single global
  * aggregate collecting 2·k doubles, the model not the data), then a
  * map-only z-value expression (pure shifts/masks — codegen), a range
  * repartition on the z-value (the one shuffle any clustering write
  * needs; range bounds come from Spark's reservoir sample), and a
  * within-partition sort. File count is explicit — this doubles as the
  * compaction knob at the 100 TB layer.
  */
object ZOrder {

  /** Quantize a numeric column to an unsigned `bits`-bit integer rank
    * within [mn, mx] (degenerate ranges collapse to 0). */
  private def quantize(c: Column, mn: Double, mx: Double, bits: Int): Column = {
    val span = mx - mn
    if (span <= 0) lit(0L)
    else {
      val scaled = floor((c.cast("double") - lit(mn)) / lit(span) * lit((1L << bits) - 1).cast("double"))
      // nulls rank 0 EXPLICITLY: least/greatest SKIP nulls, so an
      // unguarded null would clamp to the MAX rank and pollute the
      // top corner of the curve with full-range rows
      greatest(lit(0L), least(lit((1L << bits) - 1),
        coalesce(scaled.cast("long"), lit(0L))))
    }
  }

  /** Bit-interleaved z-value of k quantized dimensions (dimension d
    * contributes bit i at output position i·k + d — lowest bits first,
    * so nearby points in every dimension get nearby z-values). */
  def zValue(cols: Seq[Column], mins: Seq[Double], maxs: Seq[Double],
             bits: Int = 16): Column = {
    val k = cols.length
    require(k >= 1 && k * bits <= 62, s"k*bits must fit a long, got $k*$bits")
    val qs = cols.indices.map(d => quantize(cols(d), mins(d), maxs(d), bits))
    (for (i <- 0 until bits; d <- 0 until k)
      yield shiftleft(shiftright(qs(d), i) % 2, i * k + d))
      .reduce(_ + _)
  }

  /** Write `df` to `path` as `numFiles` parquet files clustered on the
    * z-curve over `clusterCols` (one stats scan + one clustered write;
    * rows with null cluster values land at the curve's origin). */
  def writeZOrdered(df: DataFrame, path: String, clusterCols: Seq[String],
                    numFiles: Int, bits: Int = 16): Unit = {
    require(clusterCols.nonEmpty && numFiles >= 1)
    val statsRow = df.select(
      clusterCols.flatMap(c =>
        Seq(min(col(c)).cast("double"), max(col(c)).cast("double"))): _*).head()
    // empty input / all-null column → null min/max: degrade to a
    // degenerate [0,0] span (quantize collapses to 0 — a plain write),
    // instead of an NPE out of Row.getDouble
    def at(i: Int): Double = if (statsRow.isNullAt(i)) 0.0 else statsRow.getDouble(i)
    val mins = clusterCols.indices.map(i => at(2 * i))
    val maxs = clusterCols.indices.map(i => at(2 * i + 1))
    val z = zValue(clusterCols.map(col), mins, maxs, bits)
    df.withColumn("__z", z)
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode("overwrite").parquet(path)
  }
}
