package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus mixing weights — the "sampling temperature" step of a
  * pretraining data recipe: high-resource sources are down-weighted by
  * exponentiating their token share with α < 1 before normalizing, so
  * the mixture is flatter than natural frequency.
  *
  * α is fixed at 1/2 and computed as an INTEGER square root
  * (floor(sqrt(n))): sqrt of a non-negative integer is correctly
  * rounded IEEE, so the floor is the same on every engine, and all
  * downstream shares/allocations are integer arithmetic — the gate
  * compares exactly, with no float-sum ordering hazard. (A general-α
  * pow() weight would differ across engines in the last ulp and make
  * normalized shares unverifiable.)
  *
  * Scale design: one partial-merged aggregation over the corpus (per
  * source), then a broadcast 1-row total joined back — the same
  * tiny-stats pattern as TF-IDF/BM25. Source cardinality is small by
  * definition; nothing else shuffles.
  */
object Mixing {

  /** Per-source mixing table: document/token counts, temperature
    * weight in basis points, and the share of `budgetTokens` allocated
    * to the source. Weights use α=1/2 (see object note); shares floor,
    * so Σ alloc ≤ budget (the standard leave-remainder posture). */
  def sourceWeights(docs: DataFrame, sourceCol: Column, nTokensCol: Column,
                    budgetTokens: Long): DataFrame = {
    val perSource = docs
      .select(sourceCol.as("source"), nTokensCol.cast("long").as("n"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n")).as("n_tokens"))
      .withColumn("isq", floor(sqrt(col("n_tokens").cast("double"))).cast("long"))
    val total = perSource.agg(sum(col("isq")).as("isq_total"))
    perSource.crossJoin(broadcast(total))
      .select(col("source"), col("n_docs"), col("n_tokens"),
        expr("10000 * isq div isq_total").as("weight_bp"),
        expr(s"$budgetTokens * isq div isq_total").as("alloc_tokens"))
  }

  /** EXECUTE the mixture: deterministically sample each source down to
    * (approximately) its allocated token share. Per source the keep
    * rate is `alloc/n_tokens` in basis points (capped at 100%); a doc
    * survives iff `h60(hashKey ∥ salt) mod 10000 < rate` — pure
    * content-hash selection, so the sample is reproducible across
    * runs, engines, and partitionings (same posture as DataSplit).
    *
    * Scale design: the rate table is source-cardinality rows broadcast
    * onto a map-only filter — the corpus is never shuffled. */
  def sampleToBudget(docs: DataFrame, idCol: String, sourceCol: Column,
                     nTokensCol: Column, budgetTokens: Long,
                     hashKey: Column, salt: String): DataFrame = {
    // zero-token source: the div is null (÷0) and Spark's least() SKIPS
    // nulls — least(10000, null) = 10000 would keep EVERY doc of a
    // source allocated nothing; DuckDB ÷0 errors outright. Guard the
    // rate to 0 explicitly on both engines.
    val rates = sourceWeights(docs, sourceCol, nTokensCol, budgetTokens)
      .select(col("source"),
        when(col("n_tokens") > 0,
          least(lit(10000L), expr("10000 * alloc_tokens div n_tokens")))
          .otherwise(lit(0L)).as("rate_bp"))
    docs.select(col(idCol), sourceCol.as("source"),
        graft.functions.Portable.h60(concat(hashKey, lit(salt))).as("__h"))
      .join(broadcast(rates), Seq("source"))
      .filter(pmod(col("__h"), lit(10000L)) < col("rate_bp"))
      .select(col(idCol), col("source"), col("rate_bp"))
  }
}
