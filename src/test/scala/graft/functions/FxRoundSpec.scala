package graft.functions

import org.apache.spark.sql.functions._
import graft.olhovivo.SparkTestBase

/** FxRound (the native codegen form of Fx.fx) — edge semantics must be
  * bit-identical to the composed Column form it replaced, which in turn
  * mirrors Fx.fxSql's DuckDB arithmetic. */
class FxRoundSpec extends SparkTestBase {

  /** The original five-reference Column composition, kept here as the
    * semantic oracle for the single-eval expression. */
  private def composed(c: org.apache.spark.sql.Column, d: Int) = {
    val p = math.pow(10, d)
    val m = when(c < 0, lit(-1L)).otherwise(lit(1L)) *
      floor(abs(c) * p + lit(0.5))
    when(isnan(c) || c === lit(Double.PositiveInfinity) ||
      c === lit(Double.NegativeInfinity), c)
      .otherwise(m / lit(p))
  }

  test("fx_round matches the composed form bit-for-bit on edge inputs") {
    import spark.implicits._
    val xs = Seq(
      0.0, -0.0, 1.0, -1.0, 0.004, -0.004, 0.006, -0.006,
      2.675, -2.675, 49.19125, 0.125, -0.125, 1e-12, -1e-12,
      123456.78901, -123456.78901, 0.005, -0.005, 0.015, -0.015,
      Double.NaN, Double.PositiveInfinity, Double.NegativeInfinity,
      Double.MinPositiveValue, -Double.MinPositiveValue)
    val df = xs.toDF("x")
    for (d <- Seq(0, 2, 4, 6)) {
      val rows = df.select(col("x"), Fx.fx(col("x"), d).as("fx"),
        composed(col("x"), d).as("ref")).collect()
      rows.foreach { r =>
        val a = java.lang.Double.doubleToRawLongBits(r.getDouble(1))
        val b = java.lang.Double.doubleToRawLongBits(r.getDouble(2))
        assert(a == b, s"d=$d x=${r.getDouble(0)}: fx=${r.getDouble(1)} ref=${r.getDouble(2)}")
      }
    }
  }

  test("fx_round: null in, null out; -0.0 never produced; int input coerces") {
    import spark.implicits._
    val r = Seq[Option[Double]](None, Some(-0.004))
      .toDF("x").select(Fx.fx(col("x"), 2).as("fx")).collect()
    assert(r(0).isNullAt(0))
    assert(java.lang.Double.doubleToRawLongBits(r(1).getDouble(0)) == 0L,
      "tiny negative must present as +0.0, not -0.0")
    val i = Seq(7).toDF("n").select(Fx.fx(col("n"), 2).as("fx")).head()
    assert(i.getDouble(0) == 7.0)
  }

  test("fx_round evaluates its child exactly once in the plan") {
    // non-foldable input (range), or constant folding erases the plan
    val df = spark.range(4).select(
      transform(sequence(lit(1L), lit(4L)), i => (i + col("id")).cast("float")).as("a"),
      transform(sequence(lit(1L), lit(4L)), i => (i * 2 + col("id")).cast("float")).as("b"))
      .select(Fx.fx(graft.similarity.Similarity.cosine(col("a"), col("b")), 4).as("rcos"))
    // cosine's own composition carries 5 dot_product references
    // (`when(d===0,0).otherwise(dot/d)` names d twice plus the a·a/b·b
    // under the sqrts) — the same 5 the r9 round() plans had. The
    // COMPOSED fx form referenced the whole cosine five times, i.e. 25
    // dot_product nodes and the measured q51/q52/q128 regression; the
    // expression form must stay at cosine's own 5.
    val plan = df.queryExecution.optimizedPlan.toString
    val n = "dot_product".r.findAllIn(plan).length
    assert(n == 5, s"expected cosine's own 5 dot_product nodes, got $n in:\n$plan")
  }
}
