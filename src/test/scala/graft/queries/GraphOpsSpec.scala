package graft.queries

import org.apache.spark.sql.functions._
import graft.olhovivo.SparkTestBase

/** q110's edge build: the per-order hub cap bounds a single key's
  * quadratic fan-out, and is a no-op on the real testdata (items/order
  * far below the cap), so the oracle-gated edge set is unchanged. */
class GraphOpsSpec extends SparkTestBase {
  import spark.implicits._

  test("a synthetic hub order's fan-out is capped at MaxItemsPerOrder, deterministically") {
    val cap = GraphOps.MaxItemsPerOrder
    // one hub order with 500 items, one normal order with 3
    val li = ((1 to 500).map(p => (1L, p.toLong)) ++
      Seq((2L, 7L), (2L, 8L), (2L, 9L))).toDF("k", "l_partkey")
    val capped = GraphOps.cappedItems(li)
    val hub = capped.filter(col("k") === 1L)
      .select(col("l_partkey")).collect().map(_.getLong(0)).sorted
    // exactly the cap many survive, and they are the LOWEST part keys
    // (the deterministic, oracle-mirrorable choice)
    assert(hub.length == cap)
    assert(hub.toSeq == (1 to cap).map(_.toLong))
    assert(capped.filter(col("k") === 2L).count() == 3)
    // the self-join over the capped items is bounded by C·(C−1) per key
    val pairs = capped.as("a").join(capped.as("b"), "k")
      .filter(col("a.l_partkey") =!= col("b.l_partkey"))
    assert(pairs.filter(col("k") === 1L).count() == cap.toLong * (cap - 1))
  }

  test("the cap is a no-op on the testdata edge set (items/order below the cap)") {
    val dir = "/root/testdata/sf0.001"
    val li = graft.Tables.lineitem(spark, dir)
      .select(col("l_orderkey").as("k"), col("l_partkey")).distinct()
    val maxItems = li.groupBy(col("k")).count().agg(max(col("count")))
      .head().getLong(0)
    assert(maxItems <= GraphOps.MaxItemsPerOrder,
      s"testdata grew past the cap ($maxItems); the no-op claim needs re-checking")
    val uncapped = li.as("a").join(li.as("b"), "k")
      .filter(col("a.l_partkey") =!= col("b.l_partkey"))
      .select(col("a.l_partkey").as("src"), col("b.l_partkey").as("dst"))
      .distinct()
    val capped = GraphOps.coEdges(spark, dir)
    assert(capped.count() == uncapped.count())
    assert(capped.except(uncapped).isEmpty && uncapped.except(capped).isEmpty)
  }
}
