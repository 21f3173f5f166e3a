package graft.operators

import org.apache.spark.sql.functions._

import graft.olhovivo.SparkTestBase
import graft.Tables

class BloomPruneSpec extends SparkTestBase {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("equals a plain left-semi join on real tables") {
    val li = Tables.lineitem(spark, dir)
    val sel = Tables.orders(spark, dir).filter(col("o_totalprice") > 150000.0)
    val bloom = BloomPrune.semiJoin(li, col("l_orderkey"), sel, col("o_orderkey"))
      .groupBy(col("l_orderkey")).count()
    val plain = li.join(sel, col("l_orderkey") === col("o_orderkey"), "left_semi")
      .groupBy(col("l_orderkey")).count()
    val b = bloom.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val p = plain.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(b == p && p.nonEmpty)
  }

  test("an undersized filter (high false-positive rate) is still exact") {
    val left = (1L to 2000L).map(i => (i, i % 7)).toDF("k", "v")
    val right = (1L to 2000L).filter(_ % 13 == 0).map(Tuple1(_)).toDF("rk")
    // 64 bits for ~150 keys → most probes collide; the exact join must
    // still remove every false positive
    val got = BloomPrune.semiJoin(left, col("k"), right, col("rk"),
        expectedItems = 150L, numBits = 64L)
      .select(col("k")).collect().map(_.getLong(0)).toSet
    assert(got == (1L to 2000L).filter(_ % 13 == 0).toSet)
  }

  test("empty right side prunes everything") {
    val left = (1L to 50L).map(Tuple1(_)).toDF("k")
    val right = Seq.empty[Tuple1[Long]].toDF("rk")
    assert(BloomPrune.semiJoin(left, col("k"), right, col("rk")).isEmpty)
  }
}
