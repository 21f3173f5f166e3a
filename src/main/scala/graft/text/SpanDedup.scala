package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Span-level duplicate detection via winnowing fingerprints
  * (functions.WinnowFingerprints — Schleimer et al., SIGMOD 2003):
  * documents sharing any run of ≥ w + k − 1 code points are guaranteed
  * a common fingerprint hash, so cross-document SPAN duplication (the
  * boilerplate / quoted-text / template case that whole-doc hashing
  * q33 and shingle-set MinHash q40–q47 both blur) becomes an equi-join
  * on fingerprint hash.
  *
  * Scale shape: fingerprinting is map-only (one O(L) codegen'd pass per
  * document, sketch density ~2/(w+1)); the pair step is an equi-join on
  * hash with a document-frequency cap — a fingerprint present in more
  * than `maxDf` documents is corpus boilerplate whose d² pair
  * contribution would dominate (the same df-cap discipline as the
  * jaccard join), so it is dropped BEFORE the join, keeping every
  * bucket bounded. One aggregation keyed (doc_a, doc_b) counts common
  * fingerprints.
  */
object SpanDedup {

  val K = 16 // k-gram length (code points)
  val W = 8  // winnow window → guaranteed detection at ≥ 23 code points

  /** (id, p, h): the winnowing fingerprints of every document.
    * Map-only. */
  def fingerprints(docs: DataFrame, idCol: String, textCol: Column,
                   k: Int = K, w: Int = W): DataFrame =
    docs.select(col(idCol), call_function("winnow_fp", textCol, lit(k), lit(w)).as("__fps"))
      // posexplode_outer, not posexplode: __fps is computed, and
      // InferFiltersFromGenerate would re-inline the whole winnow pass
      // into an interpreted Filter (the q41 trap); no doc here is short
      // enough to fingerprint to an empty array, but outer is also the
      // honest semantics if one were
      .select(col(idCol), explode_outer(col("__fps")).as("__fp"))
      .filter(col("__fp").isNotNull)
      .select(col(idCol), col("__fp.p").as("p"), col("__fp.h").as("h"))

  /** (id, n_fp, n_shared, dup_bp): per-document span-duplication score —
    * of the document's distinct fingerprint hashes (`n_fp`), how many
    * occur in at least one OTHER document (`n_shared`), as truncated
    * basis points (`dup_bp` = n_shared·10⁴ / n_fp — integer math, exact
    * cross-engine). The filterable form of span dedup (drop docs above
    * a duplication threshold, C4-style) and — unlike the pair query —
    * fully LINEAR: document frequency per hash is one aggregation, no
    * self-join, so no df cap is needed and boilerplate counts as the
    * duplication it is. Documents too short to fingerprint (< w + k − 1
    * code points) have no rows here.
    *
    * Plan shape: ONE exchange keys h (the df aggregation; the join of
    * fingerprints to their df re-uses that partitioning), one exchange
    * keys the per-document rollup. */
  def spanDupStats(docs: DataFrame, idCol: String, textCol: Column,
                   k: Int = K, w: Int = W,
                   scope: graft.CacheScope = graft.CacheScope.unmanaged): DataFrame = {
    val fph = scope.cache(
      fingerprints(docs, idCol, textCol, k, w).select(col(idCol), col("h")).distinct())
    val df = fph.groupBy(col("h")).agg(count(lit(1)).as("__df"))
    fph.join(df, Seq("h"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_fp"),
        sum(when(col("__df") >= 2, 1L).otherwise(0L)).as("n_shared"))
      // integral DIV, not `/`: long division through doubles can round
      // a just-below-integer quotient up before the floor
      .withColumn("dup_bp", expr("n_shared * 10000 DIV n_fp"))
  }

  /** (id, clean_text, n_spans, chars_removed): the pipeline
    * DELIVERABLE of span dedup — each document with its duplicated
    * runs excised and the remainder reassembled (the RefinedWeb/CCNet
    * last mile), plus removal provenance.
    *
    * Semantics (deterministic, oracle-mirrored): a fingerprint hash
    * shared by ≥ 2 documents keeps its copy only in the LOWEST-id
    * holder (the canonical-copy rule); in every other document each
    * occurrence marks its k-gram interval [p, p+k−1] for removal.
    * Overlapping or adjacent intervals merge into maximal spans
    * (sort-and-scan islands — one window pass, no self-join);
    * reassembly is a per-document fold over the sorted spans
    * concatenating the kept segments.
    *
    * Scale shape: fingerprinting is the same map-only pass; the
    * keeper/df table is one aggregation on h; interval merging and
    * reassembly are per-document window/fold work — no pair join at
    * all, so no df cap is needed (a corpus-boilerplate hash just
    * removes its span everywhere but one doc, which is precisely the
    * deliverable's job). */
  def removeSharedSpans(docs: DataFrame, idCol: String, textCol: Column,
                        k: Int = K, w: Int = W,
                        scope: graft.CacheScope = graft.CacheScope.unmanaged): DataFrame = {
    // every selected (doc, position, hash) — position multiplicity
    // matters here (each occurrence covers its own interval), unlike
    // the pair query's (doc, h) distinct
    val fp = scope.cache(
      fingerprints(docs, idCol, textCol, k, w).distinct())
    val own = fp.select(col(idCol), col("h")).distinct()
      .groupBy(col("h"))
      .agg(min(col(idCol)).as("__keeper"), count(lit(1)).as("__df"))
      .filter(col("__df") >= 2)
    val rm = fp.join(own, Seq("h"))
      .filter(col(idCol) =!= col("__keeper"))
      .select(col(idCol), col("p").cast("int").as("s"),
        (col("p") + lit(k - 1)).cast("int").as("e"))
      .distinct()
    assembleClean(docs, idCol, textCol, mergeIntervals(rm, idCol))
  }

  /** (id, clean_text, n_spans, chars_removed): span-level
    * DECONTAMINATION — excise from `docs` every winnow-fingerprint span
    * whose hash occurs anywhere in `refDocs` (the held-out benchmark
    * set), keeping the rest of the document. Whole-doc decontamination
    * (q39's flag-and-drop) throws away a 50 KB document over one quoted
    * benchmark sentence; span excision keeps the clean 99%.
    *
    * Same interval/merge/reassembly machinery as
    * [[removeSharedSpans]], but the removal trigger is membership in
    * the reference hash set (no keeper rule — corpus docs never "own" a
    * benchmark span), and the reference side collapses to a DISTINCT
    * hash set before the join, so the join's build side is bounded by
    * the benchmark's fingerprint vocabulary, not its size. */
  def removeSpansMatching(docs: DataFrame, idCol: String, textCol: Column,
                          refDocs: DataFrame, refTextCol: Column,
                          k: Int = K, w: Int = W,
                          scope: graft.CacheScope = graft.CacheScope.unmanaged): DataFrame = {
    val fp = scope.cache(
      fingerprints(docs, idCol, textCol, k, w).distinct())
    val refHashes = refDocs
      .select(call_function("winnow_fp", refTextCol, lit(k), lit(w)).as("__fps"))
      .select(explode_outer(col("__fps")).as("__fp"))
      .filter(col("__fp").isNotNull)
      .select(col("__fp.h").as("h")).distinct()
    val rm = fp.join(refHashes, Seq("h"))
      .select(col(idCol), col("p").cast("int").as("s"),
        (col("p") + lit(k - 1)).cast("int").as("e"))
      .distinct()
    assembleClean(docs, idCol, textCol, mergeIntervals(rm, idCol))
  }

  /** Merge overlapping/ADJACENT `[s, e]` intervals per document into
    * maximal spans (sort-and-scan islands: an island starts where the
    * running max end of all earlier intervals leaves a gap). ONE place
    * on purpose — both span-removal deliverables share these merge
    * semantics, and the oracles mirror this exact rule. */
  private[text] def mergeIntervals(rm: DataFrame, idCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byPos = Window.partitionBy(col(idCol)).orderBy(col("s"), col("e"))
    rm.withColumn("__maxe",
        max(col("e")).over(byPos.rowsBetween(Window.unboundedPreceding, -1)))
      .withColumn("__new",
        when(col("__maxe").isNull || col("s") > col("__maxe") + 1, 1).otherwise(0))
      .withColumn("__isl", sum(col("__new")).over(byPos))
      .groupBy(col(idCol), col("__isl"))
      .agg(min(col("s")).as("s"), max(col("e")).as("e"))
  }

  /** Shared reassembly tail of the two span-removal forms: merge span
    * lists per doc, fold out the kept segments, carry provenance. */
  private[text] def assembleClean(docs: DataFrame, idCol: String, textCol: Column,
                                  spans: DataFrame): DataFrame = {
    val perDoc = spans.groupBy(col(idCol))
      .agg(sort_array(collect_list(struct(col("s"), col("e")))).as("__spans"),
        count(lit(1)).as("n_spans"),
        sum(col("e") - col("s") + 1).cast("long").as("chars_removed"))
    val text = col("__text")
    val reassembled = aggregate(col("__spans"),
      struct(lit(0).as("cur"), lit("").as("acc")),
      (acc, sp) => struct(
        (sp.getField("e") + lit(1)).as("cur"),
        concat(acc.getField("acc"),
          substr(text, acc.getField("cur") + 1,
            sp.getField("s") - acc.getField("cur"))).as("acc")),
      acc => concat(acc.getField("acc"),
        substr(text, acc.getField("cur") + 1,
          greatest(length(text) - acc.getField("cur"), lit(0)))))
    docs.select(col(idCol), textCol.as("__text"))
      .join(perDoc, Seq(idCol), "left")
      .withColumn("clean_text",
        when(col("__spans").isNull, text).otherwise(reassembled))
      .select(col(idCol), col("clean_text"),
        coalesce(col("n_spans"), lit(0L)).as("n_spans"),
        coalesce(col("chars_removed"), lit(0L)).as("chars_removed"))
  }

  /** (id_a, id_b, n_common): document pairs sharing ≥ `minCommon`
    * distinct fingerprint hashes, after dropping hashes in more than
    * `maxDf` documents. */
  def sharedSpanPairs(docs: DataFrame, idCol: String, textCol: Column,
                      minCommon: Int = 2, maxDf: Int = 64,
                      k: Int = K, w: Int = W,
                      scope: graft.CacheScope = graft.CacheScope.unmanaged): DataFrame = {
    // distinct (doc, hash) — position multiplicity must not inflate
    // pair counts; cached: feeds the df-cap aggregation AND both join
    // sides
    val fph = scope.cache(
      fingerprints(docs, idCol, textCol, k, w).select(col(idCol), col("h")).distinct())
    val keep = fph.groupBy(col("h")).agg(count(lit(1)).as("__df"))
      .filter(col("__df") <= maxDf).select(col("h"))
    val capped = fph.join(keep, Seq("h"))
    val a = capped.toDF("h", "id_a")
    val b = capped.toDF("h", "id_b")
    a.join(b, Seq("h")).filter(col("id_a") < col("id_b"))
      .groupBy(col("id_a"), col("id_b")).agg(count(lit(1)).as("n_common"))
      .filter(col("n_common") >= minCommon)
  }
}
