package graft.similarity

import org.apache.spark.sql.functions._

import graft.olhovivo.SparkTestBase

class PoolingSpec extends SparkTestBase {
  import spark.implicits._

  private def centroids(df: org.apache.spark.sql.DataFrame) =
    Pooling.meanCentroid(df, col("g"), col("vec"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap

  test("hand-computed per-group element-wise mean") {
    val df = Seq(
      (0L, Array(1.0f, 2.0f)),
      (0L, Array(3.0f, 4.0f)),
      (1L, Array(-1.0f, 0.5f))
    ).toDF("g", "vec")
    val got = centroids(df)
    assert(got == Map(0L -> Seq(2.0, 3.0), 1L -> Seq(-1.0, 0.5)), s"got $got")
  }

  test("mean is partitioning-independent (exact fixed-point accumulation)") {
    val rows = (1 to 997).map(i => (i.toLong % 3, Array(1.0f / i, -0.37f * i)))
    val one = centroids(rows.toDF("g", "vec").repartition(1))
    val many = centroids(rows.toDF("g", "vec").repartition(17))
    assert(one == many)
  }

  test("null vectors are ignored; all-null group is absent") {
    val df = Seq(
      (0L, Some(Array(2.0f, 6.0f))),
      (0L, None),
      (1L, None)
    ).toDF("g", "vec")
    assert(centroids(df) == Map(0L -> Seq(2.0, 6.0)))
  }
}
