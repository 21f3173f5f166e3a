package graft.similarity

import org.apache.spark.sql.functions._

import graft.olhovivo.SparkTestBase

class QuantizeSpec extends SparkTestBase {
  import spark.implicits._

  test("codes bounded to [-127,127]; zero vector is all-zero codes with scale 1") {
    val df = Seq(
      (1L, Array(0.5f, -1.0f, 0.25f)),
      (2L, Array(0.0f, 0.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    val q = Quantize.withInt8(df).collect()
      .map(r => r.getLong(0) -> ((r.getSeq[Long](3), r.getDouble(2)))).toMap
    assert(q(1L)._1 == Seq(64L, -127L, 32L), s"got ${q(1L)}")
    assert(q(2L)._1 == Seq(0L, 0L, 0L) && q(2L)._2 == 1.0)
    q.values.foreach { case (codes, _) =>
      assert(codes.forall(c => c >= -127 && c <= 127)) }
  }

  test("dequantized dot stays within the analytic error bound of the true dot") {
    // per-element code error ≤ 0.5/scale = 0.5·max|x|/127, so
    // |dot − qdot/(sa·sb)| ≤ n·ma·mb·(1/127 + 1/(4·127²))
    val rng = new scala.util.Random(7)
    for (_ <- 1 to 8) {
      val n = 1 + rng.nextInt(64)
      val a = Array.fill(n)((rng.nextFloat() - 0.5f) * 20.0f)
      val b = Array.fill(n)((rng.nextFloat() - 0.5f) * 20.0f)
      val row = Quantize.withInt8(
          Quantize.withInt8(Seq((a, b)).toDF("embedding", "other"))
            .withColumnRenamed("qvec", "qa").withColumnRenamed("qscale", "sa"),
          vecCol = "other", qCol = "qb", sCol = "sb")
        .select(Quantize.quantizedDot(col("qa"), col("qb")).as("qdot"),
          col("sa"), col("sb"))
        .head()
      val adot = row.getLong(0).toDouble / (row.getDouble(1) * row.getDouble(2))
      val exact = a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum
      val (ma, mb) = (a.map(math.abs(_).toDouble).max, b.map(math.abs(_).toDouble).max)
      val bound = n * ma * mb * (1.0 / 127 + 1.0 / (4 * 127 * 127)) + 1e-9
      assert(math.abs(adot - exact) <= bound,
        s"n=$n err=${math.abs(adot - exact)} bound=$bound")
    }
  }

  test("quantized top-k recalls the exact top-k on real embeddings") {
    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val queries = emb.filter($"vec_id" < 20)
    def topSets(df: org.apache.spark.sql.DataFrame) = df
      .select($"query_id", $"corpus_id").collect()
      .groupBy(_.getLong(0)).map { case (k, rs) => k -> rs.map(_.getLong(1)).toSet }
    val exact = topSets(Similarity.bruteForceTopK(queries, emb, 5))
    val quant = topSets(Quantize.quantizedTopK(queries, emb, 5))
    val recalls = exact.map { case (k, ex) =>
      (ex & quant.getOrElse(k, Set.empty)).size.toDouble / ex.size }
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.8, s"mean recall@5 too low: $mean")
  }
}
