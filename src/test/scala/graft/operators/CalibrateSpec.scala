package graft.operators

import org.apache.spark.sql.functions._
import graft.olhovivo.SparkTestBase

/** Rank-based cross-source calibration: integer percent_rank basis
  * points, deterministic tiebreaks, bucket clamping, one exchange. */
class CalibrateSpec extends SparkTestBase {
  import spark.implicits._

  test("calib_bp spans 0..10000 per group; top bucket clamps to 9") {
    val df = Seq(("a", 10L, 1L), ("a", 20L, 2L), ("a", 30L, 3L),
                 ("b", 99L, 4L)).toDF("src", "score", "id")
    val out = Calibrate.rankCalibrate(df, col("src"), col("score"), col("id"))
      .collect().map(r => r.getLong(2) -> ((r.getLong(3), r.getLong(4)))).toMap
    assert(out(1L) == ((0L, 0L)))
    assert(out(2L) == ((5000L, 5L)))
    assert(out(3L) == ((10000L, 9L))) // 10000 div 1000 = 10 → clamped
    assert(out(4L) == ((0L, 0L)))     // singleton group → rank floor
  }

  test("equal scores: tiebreak orders deterministically") {
    val df = Seq(("a", 7L, 2L), ("a", 7L, 1L)).toDF("src", "score", "id")
    val out = Calibrate.rankCalibrate(df, col("src"), col("score"), col("id"))
      .collect().map(r => r.getLong(2) -> r.getLong(3)).toMap
    assert(out(1L) == 0L && out(2L) == 10000L)
  }

  test("plan: both window functions share ONE exchange") {
    val df = Seq(("a", 1L, 1L)).toDF("src", "score", "id")
    val plan = Calibrate.rankCalibrate(df, col("src"), col("score"), col("id"))
      .queryExecution.executedPlan.toString
    assert(countOf(plan, "Exchange") == 1, plan)
  }
}
