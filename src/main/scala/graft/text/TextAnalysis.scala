package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import graft.functions.Portable

/** Text-analysis operators for large-scale training-data pipelines:
  * token statistics, heuristic language ID, quality scoring, and document
  * fingerprinting. Everything is a composed built-in Column expression —
  * per-row, no shuffle, fully inside whole-stage codegen — so each
  * operator scales embarrassingly (map-only) to 100 TB of documents.
  */
object TextAnalysis {

  /** Whitespace tokens (empty strings filtered — Portable.tokens). */
  def tokens(text: Column): Column = Portable.tokens(text)

  def tokenCount(text: Column): Column = size(tokens(text))

  /** Distinct-token (type) count. */
  def typeCount(text: Column): Column = size(array_distinct(tokens(text)))

  /** A BPE-ish subword-count estimate from a regex segmentation:
    * word-internal splits every 4 chars approximate byte-pair merges
    * (tokens ≈ ceil(len/4) per word, the common ~4-chars-per-token
    * heuristic for BPE vocabularies). Pure arithmetic on both engines. */
  def bpeTokenEstimate(text: Column): Column =
    aggregate(tokens(text), lit(0L),
      (acc, t) => acc + ceil(length(t).cast("double") / 4.0).cast("long"))

  /** Small per-language stopword inventories (function words frequent in
    * each language). Heuristic language ID scores each language by
    * distinct stopword hits in the token set — the classic cheap n-gram/
    * stopword LID. */
  val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "for", "on", "with"),
    "es" -> Seq("el", "la", "de", "y", "que", "en", "un", "una", "por", "con"),
    "de" -> Seq("der", "die", "das", "und", "ist", "von", "mit", "ein", "für", "auf"))

  /** Distinct stopword hits for one language. */
  def stopwordHits(text: Column, lang: String): Column =
    size(array_intersect(tokens(text), lit(stopwords(lang).toArray)))

  /** Argmax language by stopword hits; ties break by language code order
    * (en < es < de per the CASE chain); zero hits → "und" (undetermined). */
  def langId(text: Column): Column = {
    val en = stopwordHits(text, "en")
    val es = stopwordHits(text, "es")
    val de = stopwordHits(text, "de")
    when(greatest(en, es, de) === 0, lit("und"))
      .when(en >= es && en >= de, lit("en"))
      .when(es >= de, lit("es"))
      .otherwise(lit("de"))
  }

  /** Multiplicity-counting stopword hits across all languages (quality
    * signal: function-word density). */
  def anyStopwordHits(text: Column): Column = {
    val all = stopwords.values.flatten.toSeq.distinct.sorted
    size(filter(tokens(text), t => t.isInCollection(all)))
  }

  /** Punctuation character count (fixed class, identical regex on both
    * engines). */
  def punctCount(text: Column): Column =
    length(text) - length(regexp_replace(text, "[.,!?;:]", ""))

  /** Quality score in BASIS POINTS (0..10000) — rewards stopword
    * density and moderate token length, penalizes punctuation soup;
    * weights are arbitrary but fixed, since the operator's value is the
    * *shape* (cheap per-row features → one score → filter), which is
    * how corpus filtering runs at scale. Pure integer arithmetic:
    * 5000·stopRatio + 3000·min(nTok/20, 1) + 2000·(1 − punctRatio),
    * each ratio floor-divided after scaling. Integer math, not a
    * rounded double: the weighted ratio of small integers lands exactly
    * on .5-rounding boundaries (e.g. 0.53375) that Spark (HALF_UP) and
    * other engines resolve differently — found as a real cross-engine
    * mismatch at sf0.1. All operands are non-negative, so SQL `div`
    * (truncating) equals floor division on both engines. */
  def qualityScore(text: Column): Column = {
    val nTok = tokenCount(text).cast("long")
    val stopBp = call_function("div",
      anyStopwordHits(text).cast("long") * 5000L, greatest(nTok, lit(1L)))
    val lenBp = least(nTok * 150L, lit(3000L))
    val punctBp = lit(2000L) - call_function("div",
      punctCount(text).cast("long") * 2000L,
      greatest(length(text).cast("long"), lit(1L)))
    stopBp + lenBp + punctBp
  }

  /** Canonical-text fingerprint: 60-bit md5 of lowercased,
    * whitespace-collapsed text. Equal fingerprints ⇒ exact duplicates
    * modulo case/whitespace — the cheapest dedup key. */
  def fingerprint(text: Column): Column =
    Portable.h60(trim(regexp_replace(lower(text), "\\s+", " ")))
}
