package graft.similarity

import org.apache.spark.sql.functions._

import graft.olhovivo.SparkTestBase

class NormalizeSpec extends SparkTestBase {
  import spark.implicits._

  private def run(rows: Seq[(Long, Array[Float])]) =
    Similarity.withL2Normalized(rows.toDF("vec_id", "vec"), col("vec"), "n", "unit")
      .collect()
      .map(r => r.getLong(0) -> ((r.getDouble(2), r.getSeq[Double](3))))
      .toMap

  test("3-4-5 triangle normalizes exactly; zero vector passes through") {
    val got = run(Seq(1L -> Array(3.0f, 4.0f), 2L -> Array(0.0f, 0.0f)))
    assert(got(1L) == ((5.0, Seq(0.6, 0.8))), s"got ${got(1L)}")
    assert(got(2L) == ((0.0, Seq(0.0, 0.0))))
  }

  test("unit vectors on real embeddings have norm 1 within rounding") {
    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val renormed = Similarity.withL2Normalized(emb, col("embedding"), "n", "unit")
      .withColumn("unit_norm", Similarity.norm(col("unit")))
    val off = renormed.filter(abs(col("unit_norm") - 1.0) > 1e-4).count()
    assert(off == 0, s"$off vectors with unit norm far from 1")
  }

  test("no negative zero in output components") {
    val got = run(Seq(1L -> Array(-1e-7f, 1.0f)))
    val unit = got(1L)._2
    assert(unit.head == 0.0 &&
      java.lang.Double.doubleToRawLongBits(unit.head) == 0L,
      s"expected +0.0, got ${unit.head}")
  }
}
