package graft.operators

import org.apache.spark.sql.functions._
import graft.olhovivo.SparkTestBase

/** Expectations semantics: null predicates count as violations, the
  * audit is exact, quarantine splits cleanly with sorted tags. */
class ExpectationsSpec extends SparkTestBase {
  import spark.implicits._
  import Expectations.{annotate, audit, quarantine, Rule}

  private val df = Seq(
    (1L, Some(10), "ok"),
    (2L, Some(99), "ok"),     // range violation
    (3L, None, "ok"),         // null pred → violation (3VL guarded)
    (4L, Some(5), null))      // name violation
    .toDF("id", "qty", "name")

  private val rules = Seq(
    Rule("qty_small", $"qty" <= 50),
    Rule("name_set", $"name".isNotNull))

  test("audit: exact counts, nulls are violations, one row per rule") {
    val a = audit(df, rules).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(a == Map("qty_small" -> ((2L, 4L)), "name_set" -> ((1L, 4L))))
  }

  test("annotate + quarantine: sorted tags, clean split") {
    val tags = annotate(df, rules).collect()
      .map(r => r.getLong(0) -> r.getSeq[String](3)).toMap
    assert(tags(1L) == Seq() && tags(2L) == Seq("qty_small"))
    assert(tags(3L) == Seq("qty_small") && tags(4L) == Seq("name_set"))
    val (clean, bad) = quarantine(df, rules)
    assert(clean.select($"id").collect().map(_.getLong(0)).toSeq == Seq(1L))
    assert(bad.count() == 3 && bad.columns.contains("violations"))
  }

  test("audit of an all-clean frame reports zeros, not empty output") {
    val a = audit(Seq((1L, 1)).toDF("id", "x"), Seq(Rule("pos", $"x" > 0)))
      .head()
    assert(a.getString(0) == "pos" && a.getLong(1) == 0L && a.getLong(2) == 1L)
  }
}
