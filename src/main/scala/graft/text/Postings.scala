package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.{BoundedTopK, Portable}

/** Inverted-index construction — term → (document frequency, capped
  * posting list) over a corpus (the retrieval-side primitive: keyword
  * search, df statistics for ranking, candidate generation for
  * lexical dedup).
  *
  * Scale design: one explode of per-document DISTINCT terms (map-only,
  * codegen'd) then ONE hash aggregation per term. The posting list is
  * collected with `BoundedSmallestK` (functions/BoundedTopK.scala): the
  * aggregation buffer never holds more than `cap` doc ids — a stopword
  * with df = 10^9 costs O(cap) state and ships ≤ cap longs through the
  * shuffle, where `collect_set`+`slice` would materialize the full 10^9
  * set in one buffer. df itself stays exact (plain count, partial-agg'd
  * in the same pass).
  */
object Postings {

  /** One row per distinct term: exact document frequency and the `cap`
    * smallest doc ids containing it (sorted — deterministic). `idCol`
    * must be a long-typed document id. */
  def invertedIndex(df: DataFrame, idCol: String, text: Column,
                    cap: Int): DataFrame =
    df.select(col(idCol),
        explode(array_distinct(Portable.tokens(text))).as("term"))
      .groupBy(col("term"))
      .agg(
        count(lit(1)).as("df"),
        BoundedTopK.smallestK(col(idCol), cap).as("postings"))
}
