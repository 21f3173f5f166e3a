package graft.operators

import org.apache.spark.sql.functions._
import graft.olhovivo.SparkTestBase

/** Gap-fill semantics: per-key span grids, zero-fill vs forward-fill,
  * leading nulls preserved until a value exists. */
class ResampleSpec extends SparkTestBase {
  import spark.implicits._

  test("denseGrid: every step in each key's own span, inclusive ends") {
    val obs = Seq(("a", 0L), ("a", 30L), ("b", 100L)).toDF("k", "b")
    val grid = Resample.denseGrid(obs, Seq("k"), "b", 10L)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(grid == Set(("a", 0L), ("a", 10L), ("a", 20L), ("a", 30L), ("b", 100L)))
  }

  test("gapFill: counts zero-fill, levels carry forward, leading gap stays null") {
    val obs = Seq(
      ("a", 10L, 2L, Some(5.0)),
      ("a", 40L, 1L, None),       // observed bucket with NULL level
      ("b", 0L, 1L, Some(7.0)))
      .toDF("k", "b", "n", "v")
    val out = Resample.gapFill(obs, Seq("k"), "b", 10L,
        zeroFill = Map("n" -> lit(0L), "v" -> lit(0.0)), ffill = Seq("v"))
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(2), r.getDouble(3), Option(r.get(4))))).toMap
    assert(out(("a", 10L)) == ((2L, 5.0, Some(5.0))))
    assert(out(("a", 20L)) == ((0L, 0.0, Some(5.0)))) // gap: n zero, v carried
    assert(out(("a", 30L)) == ((0L, 0.0, Some(5.0))))
    // observed-but-null level: n kept, zero-filled v 0.0, ffill keeps 5.0
    assert(out(("a", 40L)) == ((1L, 0.0, Some(5.0))))
    assert(out(("b", 0L)) == ((1L, 7.0, Some(7.0))))
  }

  test("forwardFill: leading nulls stay null until the first value") {
    val df = Seq(("a", 1L, None), ("a", 2L, Some(9.0)), ("a", 3L, None))
      .toDF("k", "b", "v")
    val out = Resample.forwardFill(df, Seq("k"), "b", Seq("v"))
      .collect().map(r => r.getLong(1) -> Option(r.get(2))).toMap
    assert(out(1L).isEmpty && out(2L).contains(9.0) && out(3L).contains(9.0))
  }
}
