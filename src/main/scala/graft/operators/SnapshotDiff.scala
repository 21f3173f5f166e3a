package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Snapshot diff — dataset versioning's core primitive: given two keyed
  * snapshots of a table (yesterday's crawl and today's), classify every
  * key as `added` / `removed` / `changed` / `unchanged` by comparing a
  * content fingerprint. This is what an incremental pipeline consumes
  * (process only added ∪ changed), what an audit trail records, and the
  * input to a CDC-style publish of a batch-recomputed table.
  *
  * Change detection compares a caller-supplied FINGERPRINT column
  * (e.g. Portable.h60 of the payload), not the payload itself — at
  * 100 TB the diff then moves (key, 8-byte hash) pairs through the
  * shuffle instead of documents.
  *
  * Scale design: ONE full-outer hash join on the key (both sides
  * shuffle once on the same key — co-partitioned merge). If both
  * snapshots are stored bucketed by key (sources/IO bucketed layout,
  * the q103 economics), even that exchange disappears. No windows, no
  * driver state, no collect.
  */
object SnapshotDiff {

  /** @return one row per key in either snapshot:
    *         (key, fp_old, fp_new, status). */
  def diff(oldSnap: DataFrame, newSnap: DataFrame,
           key: String, fingerprint: Column): DataFrame = {
    val a = oldSnap.select(col(key), fingerprint.as("fp_old"))
    val b = newSnap.select(col(key), fingerprint.as("fp_new"))
    a.join(b, Seq(key), "full_outer")
      .withColumn("status",
        when(col("fp_old").isNull, lit("added"))
          .when(col("fp_new").isNull, lit("removed"))
          .when(col("fp_old") =!= col("fp_new"), lit("changed"))
          .otherwise(lit("unchanged")))
  }

  /** The incremental-consumer view: keys whose content must be
    * (re)processed — added or changed. */
  def changedKeys(oldSnap: DataFrame, newSnap: DataFrame,
                  key: String, fingerprint: Column): DataFrame =
    diff(oldSnap, newSnap, key, fingerprint)
      .filter(col("status").isin("added", "changed"))
      .select(col(key), col("status"))
}
