package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Cross-source score calibration — the step a data recipe needs before
  * comparing quality scores ACROSS sources: raw scores are only
  * comparable within a source (a web crawl's median differs from a
  * books corpus's), so each score is replaced by its rank position
  * within the source, in integer basis points. A "keep the top 30% of
  * every source" filter is then one predicate on the calibrated value,
  * uniform across sources by construction.
  *
  * calib_bp = (rank−1)·10000 div (n−1) — percent_rank in integer basis
  * points (0 for the lowest row, 10000 for the highest, 0 for a
  * singleton group), with a caller-supplied unique tiebreak making the
  * rank (and therefore the result) deterministic on any engine and any
  * partitioning. The bucket column coarsens to `buckets` equal bands,
  * top value clamped into the last band.
  *
  * Scale design: ONE hash exchange on the group key; both window
  * functions (row_number and the partition count) share the partition
  * spec, so they fuse onto the same sort — no second shuffle, no
  * global sort. Group cardinality is irrelevant (per-source windows);
  * a pathologically large single source is the same skew story as any
  * per-group window and is bounded by the sort spill path.
  */
object Calibrate {

  val ScaleBp = 10000L

  def rankCalibrate(df: DataFrame, group: Column, score: Column,
                    tiebreak: Column, buckets: Int = 10,
                    out: String = "calib_bp",
                    bucketOut: String = "bucket"): DataFrame = {
    require(buckets >= 1 && ScaleBp % buckets == 0,
      s"buckets must divide $ScaleBp")
    val ordered = Window.partitionBy(group).orderBy(score.asc, tiebreak.asc)
    val whole = Window.partitionBy(group)
    val calib = call_function("div",
      (row_number().over(ordered).cast("long") - 1L) * ScaleBp,
      greatest(count(lit(1)).over(whole) - 1L, lit(1L)))
    df.withColumn(out, calib)
      .withColumn(bucketOut,
        least(call_function("div", col(out), lit(ScaleBp / buckets)),
          lit(buckets - 1L)))
  }
}
