package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** EXACT substring-level dedup — the Lee et al. (ACL 2022) modality:
  * remove every ≥ n-token span that appears VERBATIM in another
  * document, keeping one canonical copy. The winnowing path
  * ([[SpanDedup]]) is approximate by design (it samples ~2/(w+1) of the
  * k-grams, so sub-guarantee-length duplicates can slip); a pretraining
  * pipeline runs both — winnowing for cheap broad sweeps, exact-span for
  * the contamination-critical passes. Their reference implementation is
  * a suffix array over the concatenated corpus on one big machine; the
  * Spark shape below reaches the same removal set with relations only:
  *
  *   1. map-only: every token n-gram occurrence as (doc, s, e, h) —
  *      `token_ngrams` ([[graft.functions.TokenNgrams]]), one O(L)
  *      codegen'd pass, fixed-width output rows (NO gram text yet);
  *   2. hash-df prefilter: one aggregation keyed h over distinct
  *      (h, doc) counts document frequency; only hashes seen in ≥ 2
  *      documents survive — so the shuffle that carries actual gram
  *      TEXT is bounded by the duplicated slice, not the corpus;
  *   3. verify-and-emit: candidate occurrences re-attach their
  *      document's text, cut the verbatim gram, and group by
  *      (h, gram) — a hash bucket whose members differ as strings
  *      splits here, so collisions cannot cause a false removal. The
  *      lowest doc id per verbatim gram keeps its copy (q121's
  *      canonical-copy rule); every other occurrence marks its
  *      interval [s, e] for excision;
  *   4. interval islands + reassembly: shared with SpanDedup
  *      (mergeIntervals / assembleClean) — overlapping/adjacent spans
  *      merge (consecutive duplicated grams coalesce into ONE maximal
  *      span, which is exactly Lee et al.'s "longest repeated
  *      substring" behavior at token granularity), and the kept
  *      segments fold back into clean_text with provenance counts.
  *
  * Never all-pairs: no gram joins grams — membership and keeper come
  * from aggregations, occurrences re-join only their own (h, gram)
  * verdict. A corpus-boilerplate gram (huge df) costs its occurrence
  * list, linear in its actual repetition, and needs no df cap because
  * the deliverable REMOVES it everywhere but one doc — the same
  * cap-free argument as SpanDedup.removeSharedSpans.
  */
object ExactSpanDedup {

  /** Gate-corpus gram width. Lee et al. use 50 tokens against web text;
    * the testdata documents run 30–90 tokens, so 5 keeps the removal
    * set non-trivial (71 of 500 sf0.01 docs carry a shared 5-gram)
    * while the semantics stay the paper's. Parameterized for real
    * corpora. */
  val N = 5

  /** (id, s, e, h): every token n-gram occurrence. Map-only; no text.
    * explode_outer + null-drop on the generator OUTPUT, not a bare
    * explode — InferFiltersFromGenerate would otherwise re-inline the
    * whole token_ngrams pass into an interpreted pushed-down Filter
    * (the q41 trap). */
  def grams(docs: DataFrame, idCol: String, textCol: Column, n: Int = N): DataFrame =
    docs.select(col(idCol),
        call_function("token_ngrams", textCol, lit(n)).as("__gs"))
      .select(col(idCol), explode_outer(col("__gs")).as("__g"))
      .filter(col("__g").isNotNull)
      .select(col(idCol), col("__g.s").as("s"), col("__g.e").as("e"),
        col("__g.h").as("h"))

  /** (id, clean_text, n_spans, chars_removed): each document with every
    * cross-document verbatim n-token span excised (lowest-id holder
    * keeps its copy), intervals merged, remainder reassembled — the
    * exact-substring twin of [[SpanDedup.removeSharedSpans]], same
    * output contract. */
  def removeSharedSpans(docs: DataFrame, idCol: String, textCol: Column,
                        n: Int = N,
                        scope: graft.CacheScope = graft.CacheScope.unmanaged): DataFrame = {
    // cached: feeds the df prefilter AND the occurrence re-join
    val g = scope.cache(grams(docs, idCol, textCol, n))
    // stage 2 — fixed-width (h, id) rows only; map-side partial
    // aggregation collapses each document's repeats before the exchange
    val cand = g.select(col("h"), col(idCol)).distinct()
      .groupBy(col("h")).agg(count(lit(1)).as("__dfh"))
      .filter(col("__dfh") >= 2)
      .select(col("h"))
    // stage 3 — gram text exists only for candidate occurrences
    val occ = g.join(cand, Seq("h"), "left_semi")
      .join(docs.select(col(idCol), textCol.as("__text")), Seq(idCol))
      .select(col(idCol), col("s"), col("e"), col("h"),
        substr(col("__text"), col("s") + lit(1),
          col("e") - col("s") + lit(1)).as("__gram"))
    val own = occ.select(col(idCol), col("h"), col("__gram")).distinct()
      .groupBy(col("h"), col("__gram"))
      .agg(min(col(idCol)).as("__keeper"), count(lit(1)).as("__df"))
      .filter(col("__df") >= 2)
    val rm = occ.join(own, Seq("h", "__gram"))
      .filter(col(idCol) =!= col("__keeper"))
      .select(col(idCol), col("s").cast("int").as("s"), col("e").cast("int").as("e"))
      .distinct()
    SpanDedup.assembleClean(docs, idCol, textCol,
      SpanDedup.mergeIntervals(rm, idCol))
  }

  /** (id, clean_text, n_spans, chars_removed): EXACT span-level
    * DECONTAMINATION — excise from `docs` every n-token span that
    * appears VERBATIM anywhere in `refDocs` (the held-out benchmark
    * set). The exact twin of [[SpanDedup.removeSpansMatching]] (which
    * detects via winnow sampling and so can miss sub-guarantee-length
    * quotes), and the modality Lee et al. run against evaluation sets:
    * a quoted benchmark sentence is removed from the training document
    * with zero false negatives at ≥ n tokens, while the document's
    * clean 99% survives (q39's whole-doc drop does not).
    *
    * Scale shape: the reference side collapses to DISTINCT gram hashes
    * (bounded by the benchmark's vocabulary, not its size) before
    * touching the corpus; corpus grams carry no text into the hash
    * membership join, and only hash-matched occurrences re-attach text
    * for the verbatim string check against the reference's own verified
    * gram strings — collisions cannot excise an innocent span. */
  def removeSpansMatching(docs: DataFrame, idCol: String, textCol: Column,
                          refDocs: DataFrame, refTextCol: Column,
                          n: Int = N,
                          scope: graft.CacheScope = graft.CacheScope.unmanaged): DataFrame = {
    val g = scope.cache(grams(docs, idCol, textCol, n))
    // reference grams WITH their verbatim strings: vocabulary-bounded
    // (distinct), so the verify join's build side is the benchmark's
    // gram vocabulary
    val ref = refDocs
      .select(refTextCol.as("__rt"),
        call_function("token_ngrams", refTextCol, lit(n)).as("__gs"))
      .select(col("__rt"), explode_outer(col("__gs")).as("__g"))
      .filter(col("__g").isNotNull)
      .select(col("__g.h").as("h"),
        substr(col("__rt"), col("__g.s") + lit(1),
          col("__g.e") - col("__g.s") + lit(1)).as("__gram"))
      .distinct()
    val occ = g.join(ref.select(col("h")).distinct(), Seq("h"), "left_semi")
      .join(docs.select(col(idCol), textCol.as("__text")), Seq(idCol))
      .select(col(idCol), col("s"), col("e"), col("h"),
        substr(col("__text"), col("s") + lit(1),
          col("e") - col("s") + lit(1)).as("__gram"))
    val rm = occ.join(ref, Seq("h", "__gram"))
      .select(col(idCol), col("s").cast("int").as("s"), col("e").cast("int").as("e"))
      .distinct()
    SpanDedup.assembleClean(docs, idCol, textCol,
      SpanDedup.mergeIntervals(rm, idCol))
  }
}
