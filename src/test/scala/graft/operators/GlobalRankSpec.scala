package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.olhovivo.SparkTestBase

/** Global rank via domain-offset decomposition: equals the naive
  * global window, ranks are a permutation of 1..n, broadcast plan. */
class GlobalRankSpec extends SparkTestBase {
  import spark.implicits._

  private def sample = Seq(
    (1L, 30L), (2L, 10L), (3L, 30L), (4L, 20L), (5L, 10L), (6L, 30L))
    .toDF("id", "score")

  test("matches the naive partition-less window") {
    val got = GlobalRank.globalRank(sample, col("score"), col("id"))
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val naive = sample
      .withColumn("r", row_number().over(
        Window.orderBy(col("score"), col("id"))))
      .collect().map(r => r.getLong(0) -> r.getInt(2).toLong).toMap
    assert(got == naive)
    assert(got.values.toSeq.sorted == (1L to 6L))
  }

  test("skewed domain: one dominant value still ranks correctly") {
    val df = (1L to 100L).map(i => (i, if (i <= 90) 5L else i))
      .toDF("id", "score")
    val got = GlobalRank.globalRank(df, col("score"), col("id"))
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(got(1L) == 1L && got(90L) == 90L)   // within-value tiebreak order
    assert(got(91L) == 91L && got(100L) == 100L)
    assert(got.values.toSeq.sorted == (1L to 100L))
  }

  test("plan: offsets broadcast; corpus window partitions by score value") {
    val plan = GlobalRank.globalRank(sample, col("score"), col("id"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") ||
      plan.contains("BroadcastNestedLoopJoin"), plan)
    // the corpus-side window must be hash-partitioned (by __gr_s), never
    // a SinglePartition sort of the whole input
    assert(countOf(plan, "Window") >= 2, plan)
  }
}
