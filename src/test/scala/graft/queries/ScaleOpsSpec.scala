package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables
import graft.olhovivo.SparkTestBase

/** Gate-entry coverage for the physical-layout techniques (q103/q104):
  * results match their layout-independent twins, and the plans carry
  * the properties the 100 TB story depends on (zero-exchange bucketed
  * chain; bounded broadcast sketch model). */
class ScaleOpsSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"

  test("q103: bucketed join+agg matches the plain join, with a zero-exchange plan") {
    // force the shuffle-join path (sf0.001 would broadcast, correctly)
    // so the bucketing benefit is what the plan shows
    val (p, rows) = SparkTestBase.sessionConfLock.synchronized {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try {
        val df = ScaleOps.q103BucketedJoin(spark, dir)
        (df.queryExecution.executedPlan.toString, df.collect())
      } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    }
    assert(!p.contains("Exchange hashpartitioning"),
      s"bucketed join/agg chain must be exchange-free:\n$p")
    assert(p.contains("Bucketed: true"), s"scan not bucket-aware:\n$p")

    val plain = Tables.lineitem(spark, dir)
      .join(Tables.orders(spark, dir).filter(col("o_orderpriority") === "1-URGENT"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderkey"), col("o_orderdate"))
      .agg(
        round(sum(col("l_extendedprice").cast("decimal(18,4)") *
          (lit(1).cast("decimal(18,4)") - col("l_discount").cast("decimal(18,4)"))), 2)
          .cast("double").as("revenue"),
        count(lit(1)).as("n_items"))
      .collect()
    assert(rows.nonEmpty)
    assert(rows.map(r => (r.get(0), r.get(1)) -> (r.get(2), r.get(3))).toMap ==
      plain.map(r => (r.get(0), r.get(1)) -> (r.get(2), r.get(3))).toMap)
  }

  test("q104: count-min estimates honor the error bound for every key") {
    val out = ScaleOps.q104CountMin(spark, dir).collect()
    val exact = Tables.lineitem(spark, dir)
      .groupBy(col("l_suppkey")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.get(0) -> r.getLong(1)).toMap
    assert(out.length == exact.size, "one verified row per distinct key")
    out.foreach { r =>
      assert(r.getLong(1) == exact(r.get(0)), s"exact count mismatch for key ${r.get(0)}")
      assert(r.getBoolean(2), s"sketch outside its error bound for key ${r.get(0)}")
    }
  }

  test("q104 plan: bounded sketch broadcasts; corpus pays exactly two scans") {
    // static planner: the ReuseExchange rule's dedup of the n_total
    // branch is deterministic in the printed plan, where AQE's runtime
    // stage-reuse (same effect) prints stage bodies unstably
    val p = SparkTestBase.sessionConfLock.synchronized {
      val saved = spark.conf.getOption("spark.sql.adaptive.enabled")
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      try ScaleOps.q104CountMin(spark, dir).queryExecution.executedPlan.toString
      finally saved match {
        case Some(v) => spark.conf.set("spark.sql.adaptive.enabled", v)
        case None    => spark.conf.unset("spark.sql.adaptive.enabled")
      }
    }
    assert(p.contains("BroadcastExchange"), s"sketch model should broadcast:\n$p")
    // sketch cell agg + exact key agg read the corpus; n_total is a
    // re-aggregate of the exact counts whose shuffle is a ReusedExchange
    // (not a third scan), and the post-join min-groupBy reuses the exact
    // agg's hash partitioning (l_suppkey ⊆ group keys)
    assert(countOf(p, "FileScan parquet") == 2,
      s"expected exactly two corpus scans:\n$p")
    assert(p.contains("ReusedExchange"),
      s"n_total should reuse the exact-counts shuffle:\n$p")
  }

}
