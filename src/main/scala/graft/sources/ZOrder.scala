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
  * Ranks are QUANTILE-based (range-rank quantization — the Delta/Iceberg
  * approach), not linear min/max: on a skewed column (the norm at web
  * scale — one heavy-hitter and a long tail out to 10⁹) linear
  * quantization collapses most of the mass into a single rank and
  * pruning on that dimension degrades to nothing, while quantile ranks
  * spread the mass evenly by construction (ZOrderSpec demonstrates the
  * skewed case where linear fails to prune). The linear [[zValue]] stays
  * for uniform grids whose exact interleave matters.
  *
  * Scale design: one stats pass (approx_percentile boundaries per
  * column — a single global sketch aggregate collecting k·(2^bits − 1)
  * doubles, the model not the data), then a map-only z-value expression
  * (an O(log B) codegen binary search per dimension + pure shifts/masks
  * — see [[graft.functions.QuantileRank]]), a range repartition on the
  * z-value (the one shuffle any clustering write needs; range bounds
  * come from Spark's reservoir sample), and a within-partition sort.
  * File count is explicit — this doubles as the compaction knob at the
  * 100 TB layer.
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

  /** Bit-interleave k rank columns (each already in [0, 2^bits)):
    * dimension d contributes bit i at output position i·k + d — lowest
    * bits first, so nearby points in every dimension get nearby
    * z-values. */
  private def interleave(qs: Seq[Column], bits: Int): Column = {
    val k = qs.length
    (for (i <- 0 until bits; d <- 0 until k)
      yield shiftleft(shiftright(qs(d), i) % 2, i * k + d))
      .reduce(_ + _)
  }

  /** Bit-interleaved z-value of k LINEARLY quantized dimensions. Right
    * for uniform grids where the exact interleave matters; use the
    * quantile path ([[quantileBounds]] + [[zValueQuantile]] or
    * [[writeZOrdered]]) for real data, which is rarely uniform. */
  def zValue(cols: Seq[Column], mins: Seq[Double], maxs: Seq[Double],
             bits: Int = 16): Column = {
    val k = cols.length
    require(k >= 1 && k * bits <= 62, s"k*bits must fit a long, got $k*$bits")
    interleave(cols.indices.map(d => quantize(cols(d), mins(d), maxs(d), bits)), bits)
  }

  /** Fit per-column quantile boundaries for `bits`-bit ranks: ONE global
    * sketch aggregate computing 2^bits − 1 approx_percentile boundaries
    * per column (the model, not the data). Boundaries are deduped —
    * a heavy-hitter value spanning many quantiles collapses to one
    * boundary, so its rank holds exactly one value and the remaining
    * ranks spread over the tail. An empty/all-null column yields no
    * boundaries (every row ranks 0 — a plain write). */
  def quantileBounds(df: DataFrame, clusterCols: Seq[String],
                     bits: Int = 8, accuracy: Int = 10000): Seq[Array[Double]] = {
    require(clusterCols.nonEmpty && bits >= 1 && bits <= 16)
    val b = (1 << bits) - 1
    val pcts = array((1 to b).map(i => lit(i.toDouble / (1 << bits))): _*)
    val row = df.select(clusterCols.map(c =>
      percentile_approx(col(c).cast("double"), pcts, lit(accuracy))): _*).head()
    clusterCols.indices.map { i =>
      if (row.isNullAt(i)) Array.emptyDoubleArray
      else row.getSeq[Double](i).distinct.sorted.toArray
    }
  }

  /** Bit-interleaved z-value over quantile ranks (fitted boundary model
    * as plan literals; codegen binary search per dimension). Null
    * dimensions rank at the curve origin. Requires GraftExtensions on
    * the session (`quantile_rank` is an extension function). */
  def zValueQuantile(cols: Seq[Column], bounds: Seq[Array[Double]],
                     bits: Int = 8): Column = {
    val k = cols.length
    require(k >= 1 && k == bounds.length && k * bits <= 62,
      s"k*bits must fit a long, got $k*$bits")
    require(bounds.forall(_.length < (1 << bits)),
      s"boundary count must fit $bits-bit ranks")
    val qs = cols.indices.map { d =>
      coalesce(
        call_function("quantile_rank", cols(d).cast("double"),
          typedlit(bounds(d).toSeq)),
        lit(0L))
    }
    interleave(qs, bits)
  }

  /** Write `df` to `path` as `numFiles` parquet files clustered on the
    * z-curve over `clusterCols` (one quantile-stats scan + one clustered
    * write; rows with null cluster values land at the curve's origin). */
  def writeZOrdered(df: DataFrame, path: String, clusterCols: Seq[String],
                    numFiles: Int, bits: Int = 8): Unit = {
    require(clusterCols.nonEmpty && numFiles >= 1)
    val z = zValueQuantile(clusterCols.map(col),
      quantileBounds(df, clusterCols, bits), bits)
    df.withColumn("__z", z)
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode("overwrite").parquet(path)
  }
}
