package graft.similarity

import org.apache.spark.sql.functions._
import graft.olhovivo.SparkTestBase

/** Sign-matrix random projection: deterministic matrix, integer
  * coordinates, null propagation, shuffle-free plan. */
class RandomProjectionSpec extends SparkTestBase {
  import spark.implicits._

  test("sign matrix is deterministic, ±1, and salt-sensitive") {
    val m1 = RandomProjection.signMatrix(16, 4)
    val m2 = RandomProjection.signMatrix(16, 4)
    assert(m1.map(_.toSeq).toSeq == m2.map(_.toSeq).toSeq)
    assert(m1.flatten.forall(v => v == 1 || v == -1))
    assert(m1.flatten.contains(1) && m1.flatten.contains(-1))
    val salted = RandomProjection.signMatrix(16, 4, salt = "other")
    assert(m1.map(_.toSeq).toSeq != salted.map(_.toSeq).toSeq)
  }

  test("coordinate: signed integer sum over quantized thousandths") {
    val df = Seq((1L, Seq(1.0f, -2.0f))).toDF("id", "v")
    val out = df.select(
      RandomProjection.coordinate(
        RandomProjection.quantize(col("v")), Array(1, -1)).as("p"))
      .collect().head.getLong(0)
    assert(out == 1000L + 2000L)
  }

  test("quantize rounds half-up on both signs") {
    val df = Seq((1L, Seq(0.0014f, -0.0014f, 0.002f))).toDF("id", "v")
    val q = df.select(RandomProjection.quantize(col("v")).as("q"))
      .collect().head.getSeq[Long](0)
    assert(q == Seq(1L, -1L, 2L)) // floor(x·1000 + 0.5)
  }

  test("projection plan is map-only (no exchange)") {
    val df = Seq((1L, Seq(1.0f, 2.0f))).toDF("id", "v")
    val signs = RandomProjection.signMatrix(2, 3)
    val plan = df.select(col("id") +: signs.zipWithIndex.map { case (row, j) =>
        RandomProjection.coordinate(
          RandomProjection.quantize(col("v")), row).as(s"p$j")
      }.toSeq: _*)
      .queryExecution.executedPlan.toString
    assert(countOf(plan, "Exchange") == 0, plan)
  }
}
