package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.Portable

/** Deterministic dataset splitting for training pipelines: each row's
  * split is a pure function of a stable key (content hash mod 10000
  * against cumulative fraction thresholds), so the same document lands
  * in the same split on every run, every cluster, any partitioning —
  * unlike randomSplit, which is seed- AND partitioning-dependent.
  * Map-only; no shuffle; reproducible in SQL for the oracle gate.
  */
object DataSplit {

  val Buckets = 10000L

  /** @param fractions ordered (name → fraction); fractions must sum to
    *                  ≤ 1; any remainder falls into the last split. */
  def splitColumn(key: Column, fractions: Seq[(String, Double)]): Column = {
    require(fractions.nonEmpty && fractions.map(_._2).sum <= 1.0 + 1e-9)
    val bucket = Portable.h60(key) % Buckets
    val thresholds = fractions.scanLeft(0.0)(_ + _._2).tail
      .map(f => math.round(f * Buckets))
    fractions.init.zip(thresholds.init).foldRight(
      lit(fractions.last._1): Column) { case (((name, _), upper), rest) =>
      when(bucket < upper, lit(name)).otherwise(rest)
    }
  }

  def withSplit(df: DataFrame, key: Column,
                fractions: Seq[(String, Double)],
                out: String = "split"): DataFrame =
    df.withColumn(out, splitColumn(key, fractions))
}
