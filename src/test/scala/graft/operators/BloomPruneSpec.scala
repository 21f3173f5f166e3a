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

  test("join-coercible INT vs BIGINT keys lose no matches") {
    // regression: hashing the native types made xxhash64(int) differ
    // from xxhash64(bigint) for equal values — every probe missed and
    // matching rows were silently dropped
    val left = (1 to 500).map(i => (i, s"v$i")).toDF("k", "v") // k: INT
    val right = (1L to 500L).filter(_ % 5 == 0).map(Tuple1(_)).toDF("rk") // rk: BIGINT
    val got = BloomPrune.semiJoin(left, col("k"), right, col("rk"))
      .select(col("k")).collect().map(_.getInt(0)).toSet
    assert(got == (1 to 500).filter(_ % 5 == 0).toSet)
  }

  test("INT vs DOUBLE keys hash through the numeric common type") {
    val left = (1 to 100).map(Tuple1(_)).toDF("k") // INT
    val right = Seq(10.0, 20.0, 30.5).map(Tuple1(_)).toDF("rk") // DOUBLE
    val got = BloomPrune.semiJoin(left, col("k"), right, col("rk"))
      .select(col("k")).collect().map(_.getInt(0)).toSet
    assert(got == Set(10, 20)) // 30.5 matches no int under join coercion
  }

  test("incompatible key types are rejected, not silently mis-hashed") {
    val left = Seq("1", "2").map(Tuple1(_)).toDF("k")
    val right = Seq(1L, 2L).map(Tuple1(_)).toDF("rk")
    intercept[IllegalArgumentException] {
      BloomPrune.semiJoin(left, col("k"), right, col("rk"))
    }
  }

  test("auto-sizing tracks the right side's distinct-key scale") {
    // 100-row dim → near the 64-item floor, a ~KB filter;
    // 200k-key dim → ~2M bits; both far from the old fixed 8M bits
    assert(BloomPrune.autoBits(100L) == 1000L)
    assert(BloomPrune.autoBits(200000L) == 2000000L)
    assert(BloomPrune.autoBits(10L) == 640L) // floor
    // default cap = 2^26, matching Spark's own runtime-bloom-filter
    // maxNumBits default (67108864) — see BloomPrune.scala's clamp note
    assert(BloomPrune.autoBits(1L << 40) == (1L << 26))
  }

  test("auto-sized filter stays exact at two right-side scales") {
    val left = (1L to 5000L).map(Tuple1(_)).toDF("k")
    for (n <- Seq(20L, 2000L)) {
      val right = (1L to n).map(i => Tuple1(i * 2)).toDF("rk")
      val got = BloomPrune.semiJoin(left, col("k"), right, col("rk"))
        .select(col("k")).collect().map(_.getLong(0)).toSet
      assert(got == (1L to n).map(_ * 2).filter(_ <= 5000L).toSet)
    }
  }
}
