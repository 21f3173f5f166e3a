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
