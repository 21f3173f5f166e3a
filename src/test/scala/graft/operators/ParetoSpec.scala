package graft.operators

import org.apache.spark.sql.functions._
import graft.olhovivo.SparkTestBase

/** Pareto.frontier semantics (dominance on two integer axes) and plan
  * shape (single hash exchange, no self-join). */
class ParetoSpec extends SparkTestBase {

  import spark.implicits._

  // (group, id, x, y)
  private def df(rows: (String, Int, Int, Int)*) =
    rows.toDF("g", "id", "x", "y")

  private def frontierIds(rows: (String, Int, Int, Int)*): Set[Int] =
    Pareto.frontier(df(rows: _*), col("g"), col("x"), col("y"), buckets = 1)
      .select("id").as[Int].collect().toSet

  test("strict dominance on either axis drops the dominated row") {
    // (3,3) dominates (2,2) [strict both], (3,2) [strict y], (2,3) [strict x]
    assert(frontierIds(
      ("a", 1, 3, 3), ("a", 2, 2, 2), ("a", 3, 3, 2), ("a", 4, 2, 3)) ===
      Set(1))
  }

  test("incomparable points all stay on the frontier") {
    // classic staircase: each trades x for y
    assert(frontierIds(
      ("a", 1, 1, 9), ("a", 2, 5, 5), ("a", 3, 9, 1)) === Set(1, 2, 3))
  }

  test("exact ties on both axes are mutually non-dominating — all kept") {
    assert(frontierIds(
      ("a", 1, 4, 4), ("a", 2, 4, 4), ("a", 3, 1, 1)) === Set(1, 2))
  }

  test("equal x, differing y: only the max-y row survives that column") {
    assert(frontierIds(
      ("a", 1, 4, 7), ("a", 2, 4, 6), ("a", 3, 5, 1)) === Set(1, 3))
  }

  test("groups are independent; null criteria rows are dropped") {
    val in = Seq(
      ("a", 1, Some(3), Some(3)), ("a", 2, Some(2), Some(2)),
      ("b", 3, Some(2), Some(2)),
      ("b", 4, None, Some(9)), ("b", 5, Some(9), None))
      .toDF("g", "id", "x", "y")
    val got = Pareto.frontier(in, col("g"), col("x"), col("y"), buckets = 1)
      .select("id").as[Int].collect().toSet
    assert(got === Set(1, 3))
  }

  test("matches a brute-force dominance check on a generated grid") {
    val rows = for {
      i <- 0 until 60
    } yield ("g" + (i % 3), i, (i * 7919) % 23, (i * 104729) % 19)
    val expected = rows.filter { case (g, _, x, y) =>
      !rows.exists { case (g2, _, x2, y2) =>
        g2 == g && x2 >= x && y2 >= y && (x2 > x || y2 > y)
      }
    }.map(_._2).toSet
    assert(frontierIds(rows: _*) === expected)
  }

  test("two-phase bucketed form is bit-identical to the narrow form") {
    // adversarial grid: duplicate points, x-ties spanning would-be
    // bucket boundaries, per-group x spans of different widths, a
    // single-x group (every row lands in one bucket), negative values
    val rows = (for (i <- 0 until 400) yield
      ("g" + (i % 4), i, ((i * 7919) % 29) - 7, ((i * 104729) % 23) - 3)) ++
      Seq(("gsame", 1000, 5, 9), ("gsame", 1001, 5, 9), ("gsame", 1002, 5, 3))
    val in = rows.toDF("g", "id", "x", "y")
    val narrow = Pareto.frontier(in, col("g"), col("x"), col("y"), buckets = 1)
      .select("id").as[Int].collect().toSet
    for (buckets <- Seq(2, 7, 32, 1000)) {
      val wide = Pareto.frontier(in, col("g"), col("x"), col("y"), buckets)
        .select("id").as[Int].collect().toSet
      assert(wide === narrow, s"buckets=$buckets diverged from narrow")
    }
  }

  test("NULL group is its own partition in BOTH forms (wide joins are null-safe)") {
    // the narrow window (and the oracle's PARTITION BY) keep NULL-group
    // rows as a partition of their own; the wide form's group joins
    // must be null-safe or those rows silently vanish
    val in = Seq(
      (Some("a"), 1, 3, 3), (Some("a"), 2, 2, 2),
      (None, 3, 5, 5), (None, 4, 4, 4), (None, 5, 5, 5))
      .toDF("g", "id", "x", "y")
    val narrow = Pareto.frontier(in, col("g"), col("x"), col("y"), buckets = 1)
      .select("id").as[Int].collect().toSet
    assert(narrow === Set(1, 3, 5))
    for (buckets <- Seq(2, 3, 16)) {
      val wide = Pareto.frontier(in, col("g"), col("x"), col("y"), buckets)
        .select("id").as[Int].collect().toSet
      assert(wide === narrow, s"buckets=$buckets dropped NULL-group rows")
    }
  }

  test("wide form: output columns and rows match the input schema contract") {
    val in = df(("a", 1, 3, 3), ("a", 2, 2, 2), ("b", 3, 1, 1))
    val out = Pareto.frontier(in, col("g"), col("x"), col("y"), buckets = 4)
    assert(out.columns.toSeq === in.columns.toSeq)
    assert(out.select("id").as[Int].collect().toSet === Set(1, 3))
  }

  test("plan: ONE hash exchange, no join node (narrow form)") {
    val plan = Pareto.frontier(
      df(("a", 1, 1, 1), ("a", 2, 2, 2)), col("g"), col("x"), col("y"),
      buckets = 1)
      .queryExecution.executedPlan.toString
    assert(countOf(plan, "Exchange hashpartitioning") === 1, plan)
    assert(!plan.contains("Join"), plan)
  }

  test("NaN criteria rows are dropped identically in BOTH forms") {
    // NaN x breaks width_bucket (returns NULL) — without the up-front
    // filter the wide form would silently drop those rows while the
    // narrow form's window kept them (NaN sorts above every double)
    val nan = Double.NaN
    val in = Seq(
      ("a", 1, 3.0, 3.0), ("a", 2, 2.0, 2.0),
      ("a", 3, nan, 9.0), ("a", 4, 9.0, nan),
      ("b", 5, 1.0, 1.0), ("b", 6, nan, nan))
      .toDF("g", "id", "x", "y")
    val narrow = Pareto.frontier(in, col("g"), col("x"), col("y"), buckets = 1)
      .select("id").as[Int].collect().toSet
    assert(narrow === Set(1, 5))
    for (buckets <- Seq(2, 8)) {
      val wide = Pareto.frontier(in, col("g"), col("x"), col("y"), buckets)
        .select("id").as[Int].collect().toSet
      assert(wide === narrow, s"buckets=$buckets diverged on NaN rows")
    }
  }

  test("auto mode (default) matches explicit forms and picks buckets from parallelism/groups") {
    val rows = (for (i <- 0 until 200) yield
      ("g" + (i % 2), i, ((i * 7919) % 29) - 7, ((i * 104729) % 23) - 3))
    val in = rows.toDF("g", "id", "x", "y")
    val narrow = Pareto.frontier(in, col("g"), col("x"), col("y"), buckets = 1)
      .select("id").as[Int].collect().toSet
    val auto = Pareto.frontier(in, col("g"), col("x"), col("y"))
      .select("id").as[Int].collect().toSet
    assert(auto === narrow)
    // 2 coarse groups on a multi-core session must select the wide form
    // (the whole point of the heuristic); with many distinct groups the
    // heuristic must fall back to the narrow single-exchange plan
    if (spark.sparkContext.defaultParallelism >= 4) {
      val plan = Pareto.frontier(in, col("g"), col("x"), col("y"))
        .queryExecution.executedPlan.toString
      assert(plan.contains("Join"), s"expected wide form for 2 groups:\n$plan")
    }
    val manyGroups = rows.map { case (_, id, x, y) => ("g" + id, id, x, y) }
      .toDF("g", "id", "x", "y")
    val planMany = Pareto.frontier(manyGroups, col("g"), col("x"), col("y"))
      .queryExecution.executedPlan.toString
    assert(!planMany.contains("Join"), s"expected narrow form for 200 groups:\n$planMany")
    spark.catalog.clearCache() // auto-wide cached via the default unmanaged scope
  }
}
