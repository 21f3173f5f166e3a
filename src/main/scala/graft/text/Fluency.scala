package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.Portable

/** Corpus-frequency fluency scoring — the statistical language-model
  * quality filter: documents whose n-grams are common in the corpus
  * read as fluent; documents of rare/garbled n-grams score low (the
  * cheap in-corpus stand-in for KenLM-perplexity filtering, with the
  * same pipeline shape: train counts on the corpus, score each doc).
  *
  * Scores are integer-exact by construction: the per-doc score is the
  * mean corpus frequency of its bigrams in BASIS POINTS — a truncating
  * integer division of exact longs (the Repetition.scala convention),
  * so the cross-engine compare needs no tolerance and no float
  * rounding sits on a .5 boundary anywhere.
  *
  * Scale design: one pass builds hashed bigram postings (map-only
  * explode), one aggregation builds the frequency model, one
  * co-partitioned equi-join (both sides hash-partitioned by the same
  * bigram key) scores; the bigram table is bounded by observed vocab²,
  * not corpus size. The staged posting set is cached within the call —
  * both the model and the scoring consume it.
  */
object Fluency {

  /** Hashed bigrams of `text` (60-bit, DuckDB-reproducible):
    * h60 over the 2-gram shingles. Reuses Dedup.shingles, which guards
    * short docs with an EMPTY array — no descending-sequence crash for
    * 0/1-token inputs, and no HOF re-evaluation inside a pushed-down
    * Filter (the q41 trap): the guard lives inside the expression. */
  def bigramHashes(text: Column): Column =
    transform(graft.dedup.Dedup.shingles(text, 2), s => Portable.h60(s))

  /** (id, n_bigrams, fluency_bp): mean corpus bigram frequency per doc
    * in basis points. Docs with fewer than two tokens have no bigrams
    * and are absent. */
  def scoreByCorpusFrequency(df: DataFrame, idCol: String,
                             text: Column): DataFrame = {
    val scope = graft.CacheScope.scoped()
    val staged = scope.cache(
      df.select(col(idCol), explode_outer(bigramHashes(text)).as("bg"))
        // short docs: empty bigram array → one null row from the outer
        // explode; dropped on the generator OUTPUT (scalar filter —
        // nothing tokenizing gets inlined below the Generate)
        .filter(col("bg").isNotNull))
    val freq = staged.groupBy(col("bg")).agg(count(lit(1)).as("df"))
    scope.materializeAndRelease(
      staged.join(freq, Seq("bg"))
        .groupBy(col(idCol))
        .agg(count(lit(1)).as("n_bigrams"), sum(col("df")).as("__s"))
        .select(col(idCol), col("n_bigrams"),
          expr("(10000 * __s) div n_bigrams").as("fluency_bp")))
  }
}
