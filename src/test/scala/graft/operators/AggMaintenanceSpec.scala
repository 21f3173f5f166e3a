package graft.operators

import org.apache.spark.sql.functions._
import graft.olhovivo.SparkTestBase

/** Incremental aggregate maintenance: merging batch states equals the
  * one-shot aggregate, refreshes compose, presentation derives. */
class AggMaintenanceSpec extends SparkTestBase {
  import spark.implicits._
  import AggMaintenance._

  private val rows = Seq(
    ("a", 10L), ("a", 20L), ("a", -5L), ("b", 7L), ("b", 7L), ("c", 0L))
  private def df(r: Seq[(String, Long)]) = r.toDF("k", "v")

  private def snap(d: org.apache.spark.sql.DataFrame) =
    d.collect().map(r => r.getString(0) ->
      ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap

  test("merge of split batches ≡ state of the whole (any split)") {
    val whole = snap(state(df(rows), Seq("k"), "v"))
    for (cut <- 1 until rows.length) {
      val (l, r) = rows.splitAt(cut)
      val merged = snap(merge(
        Seq(state(df(l), Seq("k"), "v"), state(df(r), Seq("k"), "v")), Seq("k")))
      assert(merged == whole, s"cut=$cut")
    }
  }

  test("components are right: n/sum/min/max per key") {
    val s = snap(state(df(rows), Seq("k"), "v"))
    assert(s("a") == ((3L, 25L, -5L, 20L)))
    assert(s("b") == ((2L, 14L, 7L, 7L)))
    assert(s("c") == ((1L, 0L, 0L, 0L)))
  }

  test("refresh composes: adding a batch to a merged state ≡ rebuild") {
    val s0 = state(df(rows.take(3)), Seq("k"), "v")
    val s1 = state(df(rows.slice(3, 5)), Seq("k"), "v")
    val s2 = state(df(rows.drop(5)), Seq("k"), "v")
    val stepwise = merge(Seq(merge(Seq(s0, s1), Seq("k")), s2), Seq("k"))
    assert(snap(stepwise) == snap(state(df(rows), Seq("k"), "v")))
  }

  test("present derives avg from components") {
    val p = present(state(df(rows), Seq("k"), "v"), Seq("k"))
      .filter($"k" === "a").head()
    assert(p.getLong(1) == 3L && p.getDouble(2) == 25.0)
    assert(p.getDouble(3) == 8.33) // 25/3 rounded
  }
}
