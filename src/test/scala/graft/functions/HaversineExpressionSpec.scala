package graft.functions

import org.apache.spark.sql.functions._
import graft.olhovivo.SparkTestBase

/** The native Haversine expression must be bit-identical to the
  * composed-builtin form, work from SQL after registration, and stay
  * inside whole-stage codegen. */
class HaversineExpressionSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val pts = Seq(
    (-23.6787125, -46.65674, -23.5505, -46.6333), // PDF example coords
    (-23.55, -46.63, -23.55, -46.64),
    (0.0, 0.0, 0.0, 180.0),                        // antipodal-ish
    (89.9, 10.0, -89.9, 10.0)
  ).toDF("lat1", "lon1", "lat2", "lon2")

  test("expression == composed builtin form, bit for bit") {
    GraftExtensions.register(spark)
    val both = pts.select(
      Haversine.haversineM($"lat1", $"lon1", $"lat2", $"lon2").as("native"),
      Portable.haversineMeters($"lat1", $"lon1", $"lat2", $"lon2").as("composed"))
    both.collect().foreach { r =>
      assert(r.getDouble(0) == r.getDouble(1),
        s"native ${r.getDouble(0)} != composed ${r.getDouble(1)}")
    }
  }

  test("SQL surface: haversine_m callable after extension registration") {
    GraftExtensions.register(spark)
    pts.createOrReplaceTempView("pts")
    val d = spark.sql(
      "SELECT haversine_m(lat1, lon1, lat2, lon2) AS d FROM pts WHERE lat1 = -23.55")
      .collect().head.getDouble(0)
    // 0.01° lon at -23.55° ≈ 1019.3 m
    assert(math.abs(d - 1019.3) < 1.0, s"got $d")
    // null propagation (nullIntolerant)
    val n = spark.sql("SELECT haversine_m(CAST(NULL AS DOUBLE), 0.0, 1.0, 1.0) AS d")
      .collect().head
    assert(n.isNullAt(0))
  }

  test("stays inside whole-stage codegen") {
    GraftExtensions.register(spark)
    // parquet-backed input so the projection can't constant-fold away
    val li = graft.Tables.lineitem(spark, "/root/testdata/sf0.001")
      .select(($"l_quantity" / 10).as("lat1"), ($"l_discount" * 100).as("lon1"),
        ($"l_tax" * 100).as("lat2"), ($"l_extendedprice" / 1000).as("lon2"))
    val df = li.select(Haversine.haversineM($"lat1", $"lon1", $"lat2", $"lon2").as("d"))
    val plan = df.queryExecution.executedPlan.toString
    // `*(n)` prefixes mark operators inside a WholeStageCodegen stage
    assert(plan.matches("(?s).*\\*\\(\\d+\\) Project \\[haversine_m.*"),
      s"haversine projection fell out of codegen:\n$plan")
    assert(df.count() > 0)
  }

  test("register is idempotent across both install paths") {
    // SparkTestBase builds with .withExtensions AND calls register():
    // the strategy/rule must not be installed a second time through the
    // experimental seam, and repeated register() calls must not stack.
    GraftExtensions.register(spark)
    GraftExtensions.register(spark)
    assert(spark.experimental.extraStrategies.count(_ == graft.plans.AsOfJoinStrategy) +
      (if (spark.sessionState.planner.strategies.contains(graft.plans.AsOfJoinStrategy)) 1 else 0) <= 2)
    assert(spark.experimental.extraStrategies.count(_ == graft.plans.AsOfJoinStrategy) <= 1,
      "register() stacked duplicate strategies")
    assert(spark.experimental.extraOptimizations.count(_ == graft.plans.HaversineBoundingBox) <= 1,
      "register() stacked duplicate optimizer rules")
  }
}
