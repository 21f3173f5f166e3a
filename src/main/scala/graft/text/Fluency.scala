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
  * MEAN CORPUS FREQUENCY of its bigrams — a sum of exact longs over an
  * exact count — so the cross-engine compare needs no tolerance.
  *
  * Scale design: one pass builds hashed bigram postings (map-only
  * explode), one aggregation builds the frequency model, one
  * co-partitioned equi-join (both sides hash-partitioned by the same
  * bigram key) scores; the bigram table is bounded by observed vocab²,
  * not corpus size. The staged posting set is cached within the call —
  * both the model and the scoring consume it.
  */
object Fluency {

  private def bigramsOf(toks: Column): Column =
    transform(sequence(lit(1), size(toks) - 1),
      i => Portable.h60(concat_ws(" ",
        element_at(toks, i), element_at(toks, i + 1))))

  /** Hashed bigrams of `text` (60-bit, DuckDB-reproducible):
    * h60(tok[i] || ' ' || tok[i+1]). */
  def bigramHashes(text: Column): Column = bigramsOf(Portable.tokens(text))

  /** (id, n_bigrams, fluency): mean corpus bigram frequency per doc.
    * Docs with fewer than two tokens have no bigrams and are absent. */
  def scoreByCorpusFrequency(df: DataFrame, idCol: String,
                             text: Column): DataFrame = {
    val scope = graft.CacheScope.scoped()
    val staged = scope.cache(
      df.select(col(idCol), Portable.tokens(text).as("__t"))
        .filter(size(col("__t")) >= 2)
        .select(col(idCol), explode_outer(bigramsOf(col("__t"))).as("bg")))
    val freq = staged.groupBy(col("bg")).agg(count(lit(1)).as("df"))
    scope.materializeAndRelease(
      staged.join(freq, Seq("bg"))
        .groupBy(col(idCol))
        .agg(count(lit(1)).as("n_bigrams"),
          round(sum(col("df")) / count(lit(1)), 4).as("fluency")))
  }
}
