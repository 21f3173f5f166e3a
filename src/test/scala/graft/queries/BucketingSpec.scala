package graft.queries


import org.apache.spark.sql.functions._
import graft.olhovivo.SparkTestBase
import graft.Tables

/** Bucketing: the storage-level half of the 100 TB join story. Fact
  * tables bucketed on the join key join WITHOUT any exchange — the
  * shuffle is paid once at write time, then every downstream join/agg
  * on that key is exchange-free. */
class BucketingSpec extends SparkTestBase {

  test("bucketed lineitem ⋈ orders: zero shuffles in the join plan") {
    // tables land in ./spark-warehouse (gitignored, inside the repo);
    // a fresh in-memory catalog won't know about leftover dirs, so clear
    // both the catalog entries and the physical locations
    spark.sql("DROP TABLE IF EXISTS li_b")
    spark.sql("DROP TABLE IF EXISTS ord_b")
    for (t <- Seq("li_b", "ord_b"))
      graft.TempArtifacts.deleteRecursively(new java.io.File(s"spark-warehouse/$t"))

    val dir = "/root/testdata/sf0.001"
    Tables.lineitem(spark, dir).write
      .bucketBy(4, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("li_b")
    Tables.orders(spark, dir).write
      .bucketBy(4, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("ord_b")

    // the sf0.001 tables would broadcast (correctly!) — force the
    // shuffle-join path so the bucketing benefit itself is observable
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val (plan, joinedRows) =
      try {
        val j = spark.table("li_b")
          .join(spark.table("ord_b"), col("l_orderkey") === col("o_orderkey"))
          .groupBy(col("o_orderpriority"))
          .agg(round(sum(col("l_extendedprice")), 2).as("rev"))
        (j.queryExecution.executedPlan.toString, j.collect())
      } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")

    assert(!plan.contains("Exchange hashpartitioning(l_orderkey") &&
      !plan.contains("Exchange hashpartitioning(o_orderkey"),
      s"bucketed join still shuffles on the join key:\n$plan")
    assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"),
      s"expected a co-located join:\n$plan")
    assert(plan.contains("Bucketed: true"), s"scan not bucket-aware:\n$plan")

    // correctness unchanged vs the unbucketed plan
    val plain = Tables.lineitem(spark, dir)
      .join(Tables.orders(spark, dir), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(round(sum(col("l_extendedprice")), 2).as("rev"))
    assert(joinedRows.map(r => r.getString(0) -> r.getDouble(1)).toMap ==
      plain.collect().map(r => r.getString(0) -> r.getDouble(1)).toMap)
  }
}
