package graft.operators

import org.apache.spark.sql.functions._

import graft.olhovivo.SparkTestBase
import graft.Tables

class SaltedJoinSpec extends SparkTestBase {
  import spark.implicits._

  test("equals the plain inner join on real tables (multiplicities included)") {
    val li = Tables.lineitem(spark, "/root/testdata/sf0.001")
    val part = Tables.part(spark, "/root/testdata/sf0.001")
    def agg(df: org.apache.spark.sql.DataFrame) =
      df.groupBy(col("p_brand"))
        .agg(round(sum(col("l_extendedprice")), 2).as("r"), count(lit(1)).as("n"))
        .collect().map(r => r.getString(0) -> ((r.getDouble(1), r.getLong(2)))).toMap
    val salted = agg(SaltedJoin.inner(li, col("l_partkey"), part, col("p_partkey"),
      struct(col("l_orderkey"), col("l_linenumber")), salts = 8))
    val plain = agg(li.join(part, col("l_partkey") === col("p_partkey")))
    assert(salted == plain && plain.nonEmpty)
  }

  test("extreme skew: one hot key, duplicate dim-side rows preserved") {
    // 1000 facts on ONE key + a dim with a duplicate entry for it —
    // each fact row must match BOTH dim copies (2000 output rows)
    val fact = (1L to 1000L).map(i => (42L, i)).toDF("k", "row_id")
    val dim = Seq((42L, "a"), (42L, "b"), (7L, "c")).toDF("dk", "v")
    val out = SaltedJoin.inner(fact, col("k"), dim, col("dk"),
      saltSource = col("row_id"), salts = 4)
    assert(out.count() == 2000)
    assert(out.select(col("v")).distinct().collect().map(_.getString(0)).toSet
      == Set("a", "b"))
  }

  test("the join keys on (key, salt): plan shuffles, does not broadcast") {
    val fact = (1L to 100L).map(i => (i % 5, i)).toDF("k", "row_id")
    val dim = (0L to 4L).map(i => (i, s"v$i")).toDF("dk", "v")
    val p = SaltedJoin.inner(fact, col("k"), dim, col("dk"),
        saltSource = col("row_id"), salts = 4)
      .queryExecution.executedPlan.toString
    assert(p.contains("__sj_salt"), s"salt missing from join keys:\n$p")
    assert(!p.contains("BroadcastHashJoin"), s"must not broadcast:\n$p")
  }

  test("a preexisting __sj_salt column is rejected, not silently clobbered") {
    val fact = Seq((1L, 2L, 9L)).toDF("k", "row_id", "__sj_salt")
    val dim = Seq((1L, "a")).toDF("dk", "v")
    intercept[IllegalArgumentException] {
      SaltedJoin.inner(fact, col("k"), dim, col("dk"), col("row_id"), 4)
    }
    intercept[IllegalArgumentException] {
      SaltedJoin.inner(dim.select(col("dk").as("k"), col("dk").as("row_id")),
        col("k"), fact.select(col("k").as("dk"), col("__sj_salt")),
        col("dk"), col("row_id"), 4)
    }
  }
}
