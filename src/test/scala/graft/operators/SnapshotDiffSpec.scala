package graft.operators

import org.apache.spark.sql.functions._
import graft.olhovivo.SparkTestBase

/** Snapshot diff: all four statuses, fingerprint-only comparison,
  * incremental-consumer view. */
class SnapshotDiffSpec extends SparkTestBase {
  import spark.implicits._

  private def snaps = (
    Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "payload"),
    Seq((2L, "b"), (3L, "C"), (4L, "d")).toDF("id", "payload"))

  test("added / removed / changed / unchanged") {
    val (oldS, newS) = snaps
    val out = SnapshotDiff.diff(oldS, newS, "id",
        graft.functions.Portable.h60(col("payload")))
      .collect().map(r => r.getLong(0) -> r.getString(3)).toMap
    assert(out == Map(1L -> "removed", 2L -> "unchanged",
      3L -> "changed", 4L -> "added"))
  }

  test("changedKeys: only added ∪ changed survive") {
    val (oldS, newS) = snaps
    val keys = SnapshotDiff.changedKeys(oldS, newS, "id",
        graft.functions.Portable.h60(col("payload")))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(keys == Set((3L, "changed"), (4L, "added")))
  }

  test("shuffle payload is (key, hash): diff output carries no payload column") {
    val (oldS, newS) = snaps
    val cols = SnapshotDiff.diff(oldS, newS, "id",
      graft.functions.Portable.h60(col("payload"))).columns.toSeq
    assert(cols == Seq("id", "fp_old", "fp_new", "status"))
  }
}
