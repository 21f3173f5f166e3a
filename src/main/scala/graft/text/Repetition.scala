package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Portable

/** Repetition quality filters — the Gopher/RefinedWeb family: heavily
  * repetitive documents (boilerplate, generation loops, listings) are
  * flagged by the mass of their most frequent n-gram and the mass of
  * all repeated n-grams. Complements the length/punct/stopword score
  * (TextAnalysis.qualityScore), which is blind to repetition.
  *
  * Ratios are integer BASIS POINTS via truncating division on
  * non-negative longs (the q32 lesson: derived doubles from small-int
  * ratios land exactly on .5 rounding boundaries and Spark/DuckDB
  * disagree; `div` here equals `//` there, exactly).
  *
  * Scale design: grams travel as h60 longs; both aggregations are
  * hash-aggs with map-side partial merge keyed on (doc, gram) then
  * doc — no windows, no sorts, no driver-side state.
  */
object Repetition {

  /** Per-document repetition metrics over word n-grams:
    * (id, n_ngrams, top_ngram_bp, dup_ngram_bp). Documents with fewer
    * than n tokens have no grams and are absent. */
  def metrics(df: DataFrame, idCol: String, textCol: Column, n: Int): DataFrame = {
    // stage the gram array, explode_outer + null-filter ABOVE the
    // generate (plain explode on a computed array lets
    // InferFiltersFromGenerate inline the tokenize into an interpreted
    // Filter — the q41 trap)
    val grams = df
      .select(col(idCol).as("id"), graft.dedup.Dedup.shingles(textCol, n).as("__rg"))
      .select(col("id"), explode_outer(col("__rg")).as("g"))
      .filter(col("g").isNotNull)
      .select(col("id"), Portable.h60(col("g")).as("h"))
    val counts = grams.groupBy(col("id"), col("h")).agg(count(lit(1)).as("c"))
    counts.groupBy(col("id")).agg(
        sum(col("c")).as("tot"),
        max(col("c")).as("maxc"),
        sum(when(col("c") > 1, col("c")).otherwise(lit(0L))).as("dupc"))
      .select(col("id"),
        col("tot").as("n_ngrams"),
        call_function("div", lit(10000L) * col("maxc"), col("tot")).as("top_ngram_bp"),
        call_function("div", lit(10000L) * col("dupc"), col("tot")).as("dup_ngram_bp"))
  }
}
