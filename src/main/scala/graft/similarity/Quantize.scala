package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Symmetric int8 embedding quantization — the memory/IO lever for
  * ANN at scale: 4× smaller vectors than float32, integer dot products,
  * with per-vector scales for dequantized scoring. At 100 TB of
  * embeddings this is the difference between a corpus that fits in
  * cluster memory and one that doesn't; rescoring the top candidates
  * against the float vectors (q50's exact path) recovers full fidelity.
  *
  * Codes are floor(x·scale + 0.5), NOT round(): half-up vs half-even
  * rounding differs across engines, while floor of an identical double
  * is deterministic everywhere — the codes (and therefore every
  * downstream integer dot product) are bit-reproducible, which is what
  * lets the DuckDB oracle check the quantized search exactly.
  */
object Quantize {

  /** Adds `sCol` (scale = 127/max|x|, 1.0 for zero vectors) and `qCol`
    * (codes in [−127, 127], LongType for overflow-free dots). */
  def withInt8(df: DataFrame, vecCol: String = "embedding",
               qCol: String = "qvec", sCol: String = "qscale"): DataFrame = {
    val maxAbs = array_max(transform(col(vecCol), x => abs(x.cast("double"))))
    df.withColumn(sCol, when(maxAbs === 0.0, lit(1.0)).otherwise(lit(127.0) / maxAbs))
      .withColumn(qCol, transform(col(vecCol),
        x => floor(x.cast("double") * col(sCol) + lit(0.5)).cast("long")))
  }

  /** Exact integer dot of two code vectors (|q| ≤ 127, so any realistic
    * dim stays far from Long overflow). */
  def quantizedDot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, _ * _), lit(0L), _ + _)

  /** Top-k by dequantized inner product qdot/(s_q·s_c): quantize both
    * sides, broadcast the (small) query side, integer-dot the corpus,
    * rank per query (score desc, corpus_id asc). `qdot` in the output is
    * the exact integer score; `adot` the dequantized approximation. */
  def quantizedTopK(queries: DataFrame, corpus: DataFrame, k: Int): DataFrame = {
    val q = withInt8(queries)
      .select(col("vec_id").as("query_id"), col("qvec").as("qq"), col("qscale").as("sq"))
    val c = withInt8(corpus)
      .select(col("vec_id").as("corpus_id"), col("qvec").as("qc"), col("qscale").as("sc"))
    val scored = c.join(broadcast(q), col("query_id") =!= col("corpus_id"))
      .withColumn("qdot", quantizedDot(col("qq"), col("qc")))
      .withColumn("adot", col("qdot").cast("double") / (col("sq") * col("sc")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("adot").desc, col("corpus_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank").cast("long").as("rank"),
        // + 0.0 normalizes −0.0 (IEEE: −0.0 + 0.0 = +0.0): a tiny
        // negative dot rounds to −0.0 in DuckDB but +0.0 via Spark's
        // BigDecimal round — the oracle applies the same normalization
        col("corpus_id"), col("qdot"), graft.functions.Fx.fx(col("adot"), 4).as("adot"))
  }
}
