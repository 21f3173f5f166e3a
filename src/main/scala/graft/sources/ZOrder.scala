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

  /** Per-dimension fitted boundary model (sorted, deduped). */
  sealed trait DimBounds { def size: Int }
  final case class NumericBounds(values: Array[Double]) extends DimBounds {
    def size: Int = values.length
  }
  final case class StringBounds(values: Array[String]) extends DimBounds {
    def size: Int = values.length
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

  /** String-column boundary fit: approx_percentile has no string form,
    * so boundaries come from a deterministic reservoir sample — the
    * same technique Spark's own RangePartitioner (and therefore
    * repartitionByRange) uses for its range bounds. ALL string columns
    * share ONE sample pass (column-pruned to just them): at the 100 TB
    * layer a boundary fit must not cost a scan per dimension. Each
    * column's values are then sorted driver-side in UTF8 byte order and
    * evenly-spaced values become its boundaries: ≤ 2^bits − 1 strings
    * per column, the model not the data. Skew-robust the same way the
    * numeric fit is — a heavy-hitter occupies many sample slots but
    * dedupes to ONE boundary. Nulls are dropped per column AFTER the
    * row sample (not via a joint na.drop, which would bias one column's
    * marginal by another's null pattern); a mostly-null column simply
    * fits from a smaller sample. */
  def stringQuantileBounds(df: DataFrame, colNames: Seq[String], bits: Int = 8,
                           sampleSize: Int = 65536): Seq[Array[String]] = {
    require(bits >= 1 && bits <= 16)
    require(colNames.nonEmpty)
    val b = (1 << bits) - 1
    val rows = df.select(colNames.map(c => col(c).cast("string")): _*)
      .rdd.takeSample(withReplacement = false, sampleSize, seed = 42L)
    colNames.indices.map { i =>
      val sample = rows.collect { case r if !r.isNullAt(i) => r.getString(i) }
      if (sample.isEmpty) Array.empty[String]
      else {
        // UTF8String binary order == the unsigned-byte order of the
        // UTF-8 encoding; JVM String.compareTo orders by UTF-16 char,
        // which diverges on supplementary characters — sort in the
        // encoded-byte order so boundary order matches the
        // expression's comparisons
        val sorted = sample
          .map(org.apache.spark.unsafe.types.UTF8String.fromString).sorted
        // j always sweeps the FULL quantile grid 1/(b+1) … b/(b+1):
        // capping j at sorted.length − 1 would truncate the quantile
        // RANGE for samples smaller than 2^bits (a 100-row sample's
        // boundaries would all sit in its bottom 39%, collapsing the
        // upper tail into one rank); duplicates from a small sample
        // dedupe below, and b·len/(b+1) < len keeps the index in range
        (1 to b)
          .map(j => sorted((j.toLong * sorted.length / (b + 1)).toInt).toString)
          .distinct.toArray
      }
    }
  }

  /** Schema-dispatched boundary fit: numeric columns through the ONE
    * approx_percentile pass, string columns through the ONE shared
    * sampled range fit — two stats passes total, independent of the
    * number of cluster dimensions. */
  def fitBounds(df: DataFrame, clusterCols: Seq[String],
                bits: Int = 8): Seq[DimBounds] = {
    val types = clusterCols.map(c => df.schema(c).dataType)
    val numericCols = clusterCols.zip(types).collect {
      case (c, t) if t != org.apache.spark.sql.types.StringType => c
    }
    val stringCols = clusterCols.zip(types).collect {
      case (c, org.apache.spark.sql.types.StringType) => c
    }
    val numeric: Map[String, Array[Double]] =
      if (numericCols.isEmpty) Map.empty
      else numericCols.zip(quantileBounds(df, numericCols, bits)).toMap
    val strings: Map[String, Array[String]] =
      if (stringCols.isEmpty) Map.empty
      else stringCols.zip(stringQuantileBounds(df, stringCols, bits)).toMap
    clusterCols.zip(types).map {
      case (c, org.apache.spark.sql.types.StringType) => StringBounds(strings(c))
      case (c, _) => NumericBounds(numeric(c))
    }
  }

  /** Bit-interleaved z-value over quantile ranks (fitted boundary model
    * as plan literals; codegen binary search per dimension). Null
    * dimensions rank at the curve origin. Requires GraftExtensions on
    * the session (`quantile_rank` is an extension function). */
  def zValueQuantile(cols: Seq[Column], bounds: Seq[Array[Double]],
                     bits: Int = 8): Column =
    zValueTyped(cols, bounds.map(NumericBounds(_)), bits)

  /** As [[zValueQuantile]], with per-dimension numeric OR string
    * boundary models.
    *
    * Ranks are STRETCHED over the full 2^bits range by an integer
    * factor ⌊(2^bits − 1)/B⌋ when a dimension fits fewer than 2^bits − 1
    * distinct boundaries (B): heavy-hitter dedup can leave a dimension
    * with only a handful of ranks, and unstretched those occupy only
    * the LOW bits — the dimension's high interleave bits sit constant
    * at 0, the curve degenerates to a sort on the other dimensions, and
    * pruning on this one dies (observed: an equality probe on a 90%-
    * skewed string column hit 16/16 files unstretched, ≤ n/2 stretched).
    * Integer multiplication by a plan literal preserves rank order and
    * stays in codegen. */
  def zValueTyped(cols: Seq[Column], bounds: Seq[DimBounds],
                  bits: Int = 8): Column = {
    val k = cols.length
    require(k >= 1 && k == bounds.length && k * bits <= 62,
      s"k*bits must fit a long, got $k*$bits")
    require(bounds.forall(_.size < (1 << bits)),
      s"boundary count must fit $bits-bit ranks")
    val qs = cols.indices.map { d =>
      val ranked = bounds(d) match {
        case NumericBounds(b) =>
          call_function("quantile_rank", cols(d).cast("double"), typedlit(b.toSeq))
        case StringBounds(b) =>
          call_function("quantile_rank", cols(d).cast("string"), typedlit(b.toSeq))
      }
      // B ≤ 2^bits − 1 (required above) → stretch ≥ 1; max scaled rank
      // B·stretch ≤ 2^bits − 1 stays inside the interleave width
      val stretch = ((1 << bits) - 1) / math.max(1, bounds(d).size)
      coalesce(ranked * lit(stretch.toLong), lit(0L))
    }
    interleave(qs, bits)
  }

  /** Write `df` to `path` as `numFiles` parquet files clustered on the
    * z-curve over `clusterCols` — numeric AND string dimensions (one
    * quantile-stats scan, plus one shared sampled scan if any dimension
    * is a string; one clustered write; rows with null cluster values
    * land at the curve's origin). */
  def writeZOrdered(df: DataFrame, path: String, clusterCols: Seq[String],
                    numFiles: Int, bits: Int = 8,
                    bounds: Option[Seq[DimBounds]] = None): Unit = {
    require(clusterCols.nonEmpty && numFiles >= 1)
    // callers that already fitted the boundary model (a probe timing the
    // fit separately, a harness reusing one fit across writes) pass it
    // here — otherwise the write would silently pay the stats passes a
    // second time
    val z = zValueTyped(clusterCols.map(col),
      bounds.getOrElse(fitBounds(df, clusterCols, bits)), bits)
    df.withColumn("__z", z)
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode("overwrite").parquet(path)
  }
}
