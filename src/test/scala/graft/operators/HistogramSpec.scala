package graft.operators

import org.apache.spark.sql.functions._
import graft.olhovivo.SparkTestBase

/** Integer equi-width histogram: exact bin edges, degenerate ranges,
  * negative domains, single-corpus-pass plan (reused exchange). */
class HistogramSpec extends SparkTestBase {
  import spark.implicits._

  test("0..9 into 2 buckets: [0,4]→0, [5,9]→1") {
    val df = (0L to 9L).toDF("v")
    val out = Histogram.equiWidth(df, col("v"), 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(0L -> 5L, 1L -> 5L))
  }

  test("constant column: everything in bucket 0") {
    val df = Seq(7L, 7L, 7L).toDF("v")
    val out = Histogram.equiWidth(df, col("v"), 10)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(0L -> 3L))
  }

  test("negative domain; max never lands in a phantom bucket") {
    val df = Seq(-10L, -1L, 0L, 9L).toDF("v")
    val out = Histogram.equiWidth(df, col("v"), 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // range [-10, 9], width 20, 4 buckets of 5: -10→0, -1→1, 0→2, 9→3
    assert(out == Map(0L -> 1L, 1L -> 1L, 2L -> 1L, 3L -> 1L))
    assert(out.keys.max < 4)
  }

  test("nulls are excluded") {
    val df = Seq(Some(1L), None, Some(2L)).toDF("v")
    val n = Histogram.equiWidth(df, col("v"), 2)
      .agg(sum("n")).collect().head.getLong(0)
    assert(n == 2L)
  }

  test("plan: only domain-sized shuffles; stats are partial-merged (1 row/partition)") {
    val df = (0L to 99L).toDF("v")
    val plan = Histogram.equiWidth(df, col("v"), 5)
      .queryExecution.executedPlan.toString
    // exactly two hash exchanges: per-value counts + bucket roll-up —
    // both domain-sized; the stats side ships only partial min/max rows
    assert(countOf(plan, "Exchange hashpartitioning") == 2, plan)
    assert(plan.contains("partial_min") && plan.contains("partial_max"), plan)
    assert(plan.contains("BroadcastNestedLoopJoin") ||
      plan.contains("BroadcastExchange"), plan)
  }
}
