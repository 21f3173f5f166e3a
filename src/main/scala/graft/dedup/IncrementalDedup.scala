package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Portable

/** Incremental (cross-batch) deduplication — the standard production
  * shape: dedup each new day's documents AGAINST an accumulated
  * signature store instead of re-processing the whole corpus
  * (reference analog: the day-scoped driver D1, etl-olho-vivo-
  * velocidades-medias.py runs one day against standing outputs).
  *
  * The store holds one row per retained document: its exact-content
  * fingerprint and its MinHash signature — k longs + 1 long per doc,
  * ~1000× smaller than the corpus text. At 100 TB of accumulated docs
  * the store is the only thing the daily job reads besides the new
  * batch; both probes are equi-joins (fingerprint, LSH band), never a
  * scan of historic text.
  */
object IncrementalDedup {

  /** Exact-content 60-bit fingerprint (md5-derived, identical on the
    * DuckDB side as h60Sql). */
  def fingerprint(textCol: Column): Column = Portable.h60(textCol)

  /** Build/extend the signature store for a batch of retained docs:
    * (doc_id, fingerprint, sig). Write the result as partitioned
    * parquet and union/append per batch; `sig` is null for docs too
    * short to shingle (they still dedup exactly by fingerprint). */
  def signatureStore(docs: DataFrame, idCol: String, textCol: Column,
                     k: Int = 8, shingleN: Int = 3): DataFrame =
    Dedup.withMinhashSignature(docs, textCol, k, shingleN, "sig")
      .select(col(idCol).as("doc_id"), fingerprint(textCol).as("fingerprint"),
        when(size(col("sig")) === k &&
          !exists(col("sig"), _.isNull), col("sig")).as("sig"))

  /** Dedup a new batch against a store built with the SAME (k, shingleN,
    * rowsPerBand) parameters. Returns one row per new doc:
    * (doc_id, status, match_id) with status ∈
    *   'exact_dup'     — fingerprint already in the store (match_id =
    *                     smallest matching store doc);
    *   'near_dup'      — ≥1 shared LSH band with a store signature
    *                     (match_id = smallest such store doc; candidate
    *                     semantics, same as q42 — verify with an exact
    *                     measure downstream if the band layout is
    *                     permissive);
    *   'unique'        — neither (match_id null). These are the rows to
    *                     append to the store via [[signatureStore]].
    *
    * Shape: two equi-joins against the store (broadcast when the store
    * side is small, shuffled otherwise — Spark picks), one signature
    * map over the new batch only. No historic text is touched. */
  def dedupAgainstStore(newDocs: DataFrame, store: DataFrame,
                        idCol: String, textCol: Column,
                        k: Int = 8, rowsPerBand: Int = 2,
                        shingleN: Int = 3,
                        scope: graft.CacheScope = graft.CacheScope.unmanaged): DataFrame = {
    // cache: the signature relation feeds three branches (exact probe,
    // band probe, result spine) — uncached, one action computes the
    // tokenize+hash+minhash pipeline three times
    val sigd = scope.cache(
      Dedup.withMinhashSignature(newDocs, textCol, k, shingleN, "sig")
        .select(col(idCol).as("doc_id"), fingerprint(textCol).as("fingerprint"),
          col("sig")))

    val exact = sigd.join(store.select(col("fingerprint"),
        col("doc_id").as("store_id")), Seq("fingerprint"))
      .groupBy(col("doc_id")).agg(min(col("store_id")).as("match_id"))

    // LSH bands of new docs vs store signatures (null-signature rows on
    // either side produce null band hashes — dropped by the explode
    // null filter / join)
    def bands(df: DataFrame, idAs: String): DataFrame =
      df.select(col("doc_id").as(idAs),
          posexplode_outer(Dedup.lshBands(col("sig"), k, rowsPerBand))
            .as(Seq("band", "bh")))
        .filter(col("bh").isNotNull)
    val near = bands(sigd, "doc_id")
      .join(bands(store.filter(col("sig").isNotNull), "store_id"), Seq("band", "bh"))
      .groupBy(col("doc_id")).agg(min(col("store_id")).as("match_id"))

    sigd.select(col("doc_id"))
      .join(exact.withColumnRenamed("match_id", "exact_id"), Seq("doc_id"), "left")
      .join(near.withColumnRenamed("match_id", "near_id"), Seq("doc_id"), "left")
      .select(col("doc_id"),
        when(col("exact_id").isNotNull, lit("exact_dup"))
          .when(col("near_id").isNotNull, lit("near_dup"))
          .otherwise(lit("unique")).as("status"),
        coalesce(col("exact_id"), col("near_id")).as("match_id"))
  }
}
