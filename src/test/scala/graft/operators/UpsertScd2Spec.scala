package graft.operators

import org.apache.spark.sql.functions._
import graft.olhovivo.SparkTestBase

/** Semantics of the snapshot-maintenance operators: latest-wins upsert
  * (insert/update/version order), SCD-2 intervalization (compression,
  * null transitions, open interval), and the per-group quota cap. */
class UpsertScd2Spec extends SparkTestBase {
  import spark.implicits._

  test("latestWins: inserts new keys, updates only on newer version, struct tiebreak") {
    val snapshot = Seq(("a", 10L, 1L, "old-a"), ("b", 10L, 1L, "old-b"))
      .toDF("k", "v", "seq", "payload")
    val updates = Seq(
      ("a", 11L, 1L, "new-a"),   // newer version → updates
      ("b", 9L, 99L, "stale-b"), // older version → ignored (v dominates seq)
      ("c", 5L, 1L, "new-c"))    // new key → inserts
      .toDF("k", "v", "seq", "payload")
    val out = Upsert.latestWins(snapshot, updates, Seq("k"), Seq("v", "seq"))
      .collect().map(r => r.getString(0) -> r.getString(3)).toMap
    assert(out == Map("a" -> "new-a", "b" -> "old-b", "c" -> "new-c"))
  }

  test("latestWins: second version column breaks first-column ties") {
    val snapshot = Seq(("a", 10L, 1L, "first")).toDF("k", "v", "seq", "payload")
    val updates = Seq(("a", 10L, 2L, "second")).toDF("k", "v", "seq", "payload")
    val out = Upsert.latestWins(snapshot, updates, Seq("k"), Seq("v", "seq"))
    assert(out.head().getString(3) == "second")
  }

  test("compact: one row per key from a multi-revision stream") {
    val changes = Seq(("a", 1L, 0L, "x"), ("a", 3L, 0L, "z"), ("a", 2L, 0L, "y"))
      .toDF("k", "v", "seq", "payload")
    val out = Upsert.compact(changes, Seq("k"), Seq("v", "seq"))
    assert(out.count() == 1 && out.head().getString(3) == "z")
  }

  test("intervalize: compresses runs, half-open intervals, null valid_to on current") {
    val obs = Seq(
      ("u", 10L, "A"), ("u", 20L, "A"),   // run compresses → one interval from 10
      ("u", 30L, "B"),
      ("u", 40L, "A"),                    // A again: NEW interval (not merged with first)
      ("w", 5L, "X"))
      .toDF("k", "t", "attr")
    val out = Scd2.intervalize(obs, Seq("k"), "t", "attr")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        Option(r.get(3)).map(_.asInstanceOf[Long]))).toSet
    assert(out == Set(
      ("u", "A", 10L, Some(30L)),
      ("u", "B", 30L, Some(40L)),
      ("u", "A", 40L, None),
      ("w", "X", 5L, None)), s"got $out")
  }

  test("intervalize: null attribute values are first-class states") {
    val obs = Seq(
      ("u", 1L, Some("A")), ("u", 2L, None), ("u", 3L, None), ("u", 4L, Some("A")))
      .toDF("k", "t", "attr")
    val out = Scd2.intervalize(obs, Seq("k"), "t", "attr")
      .collect().map(r => (Option(r.get(1)).map(_.toString), r.getLong(2))).toSet
    // null run compresses to ONE interval [2,4); null→A is a transition
    assert(out == Set((Some("A"), 1L), (None, 2L), (Some("A"), 4L)), s"got $out")
  }

  test("capPerGroup: cap bites only over-quota groups, best-first order") {
    val df = Seq(
      ("g1", 1L, 30), ("g1", 2L, 20), ("g1", 3L, 10),
      ("g2", 4L, 5))
      .toDF("g", "id", "score")
    val out = QuotaCap.capPerGroup(df, Seq("g"), Seq($"score".desc, $"id"), 2)
      .select($"id").collect().map(_.getLong(0)).toSet
    assert(out == Set(1L, 2L, 4L)) // g1 keeps its 2 best, g2 untouched
  }

  test("plan: latestWins is ONE shuffle with map-side partial aggregation") {
    val snapshot = Seq(("a", 1L, 1L, "x")).toDF("k", "v", "seq", "payload")
    val updates = Seq(("a", 2L, 1L, "y")).toDF("k", "v", "seq", "payload")
    val p = Upsert.latestWins(snapshot, updates, Seq("k"), Seq("v", "seq"))
      .queryExecution.executedPlan.toString
    assert(p.sliding("Exchange hashpartitioning".length)
      .count(_ == "Exchange hashpartitioning") == 1, s"expected 1 shuffle:\n$p")
    assert(p.contains("partial_max_by") || p.contains("partial_maxby")
      || p.contains("Partial"), s"no partial aggregation:\n$p")
  }

  test("plan: intervalize runs both window passes on ONE exchange") {
    val obs = Seq(("u", 10L, "A"), ("u", 20L, "B")).toDF("k", "t", "attr")
    val p = Scd2.intervalize(obs, Seq("k"), "t", "attr")
      .queryExecution.executedPlan.toString
    assert(p.sliding("Exchange hashpartitioning".length)
      .count(_ == "Exchange hashpartitioning") == 1, s"expected 1 shuffle:\n$p")
  }
}
