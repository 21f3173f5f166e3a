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
