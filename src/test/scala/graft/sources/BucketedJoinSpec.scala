package graft.sources

import org.apache.spark.sql.functions._

import graft.olhovivo.SparkTestBase

/** The 100 TB co-location story, asserted as a plan property: tables
  * bucketed on the join key join WITHOUT any exchange — the scan's
  * bucketing satisfies the join's ClusteredDistribution, so at scale
  * the nightly "big fact ⋈ big fact" carries zero shuffle I/O. Same
  * mechanism keeps the native as-of exec exchange-free on bucketed
  * inputs (its requiredChildDistribution is declared, not forced).
  */
class BucketedJoinSpec extends SparkTestBase {

  test("bucketed fact-fact join plans with zero exchanges") {
    val dir = "/root/testdata/sf0.001"
    val wh = scratchDir("bucketed").toString
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      graft.Tables.orders(spark, dir)
        .write.bucketBy(4, "o_custkey").sortBy("o_custkey")
        .option("path", s"$wh/orders_b").mode("overwrite")
        .saveAsTable("orders_b")
      graft.Tables.customer(spark, dir)
        .write.bucketBy(4, "c_custkey").sortBy("c_custkey")
        .option("path", s"$wh/customer_b").mode("overwrite")
        .saveAsTable("customer_b")
      val joined = spark.table("orders_b")
        .join(spark.table("customer_b"),
          col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment")).agg(count(lit(1)).as("n"))
      val p = joined.queryExecution.executedPlan.toString
      assert(!p.contains("Exchange hashpartitioning(o_custkey") &&
        !p.contains("Exchange hashpartitioning(c_custkey"),
        s"bucketed join must not shuffle its inputs:\n$p")
      assert(p.contains("SortMergeJoin"), s"expected a sort-merge join:\n$p")
      assert(p.contains("SelectedBucketsCount"), s"bucket pruning metadata missing:\n$p")
      assert(joined.collect().map(_.getLong(1)).sum > 0)
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS customer_b")
    }
  }

  test("bucketed inputs make the native as-of join exchange-free") {
    import spark.implicits._
    val wh = scratchDir("bucketed-asof").toString
    try {
      Seq(("a", 10L, 1.0), ("a", 20L, 2.0), ("b", 15L, 3.0))
        .toDF("k", "t", "x")
        .write.bucketBy(4, "k").sortBy("k", "t")
        .option("path", s"$wh/asof_l").mode("overwrite").saveAsTable("asof_l")
      Seq(("a", 5L, 100L), ("a", 12L, 200L), ("b", 15L, 300L))
        .toDF("rk", "rt", "rid")
        .write.bucketBy(4, "rk").sortBy("rk", "rt")
        .option("path", s"$wh/asof_r").mode("overwrite").saveAsTable("asof_r")
      val joined = graft.operators.AsOfJoin.asofMergeJoin(
        spark.table("asof_l"), spark.table("asof_r"),
        leftKeys = Seq("k"), rightKeys = Seq("rk"),
        leftTime = "t", rightTime = "rt")
      val p = joined.queryExecution.executedPlan.toString
      assert(p.contains("AsOfMergeJoin"), s"native exec missing:\n$p")
      assert(!p.contains("Exchange hashpartitioning"),
        s"bucketing must satisfy the as-of distribution requirement:\n$p")
      val got = joined.select($"t", $"rid").collect()
        .map(r => r.getLong(0) -> Option(r.get(1))).toMap
      assert(got == Map(10L -> Some(100L), 20L -> Some(200L), 15L -> Some(300L)),
        s"got $got")
    } finally {
      spark.sql("DROP TABLE IF EXISTS asof_l")
      spark.sql("DROP TABLE IF EXISTS asof_r")
    }
  }
}
