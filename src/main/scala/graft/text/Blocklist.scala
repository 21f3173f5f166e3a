package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.Portable

/** Blocklist screening — annotate/filter documents against a term
  * blocklist (the safety/quality curation stage: badword filtering,
  * boilerplate-marker detection, benchmark-canary tagging).
  *
  * Scale design: the term set ships as a LITERAL array inside the plan
  * (the blocklist is a model-sized input — thousands of terms, not data),
  * so screening is map-only codegen'd `array_intersect` per row: no join,
  * no shuffle, no broadcast exchange even. For blocklists too large for a
  * plan literal, the same shape becomes a broadcast join against the
  * token explosion — `Decontaminate` (dedup/Decontaminate.scala) is that
  * variant; this operator is the in-plan fast path.
  */
object Blocklist {

  /** Per-document hit report: the sorted distinct blocklisted terms the
    * document contains, and their count. Case-sensitive on purpose — fold
    * case upstream if the blocklist is case-insensitive. */
  def annotate(df: DataFrame, text: Column, terms: Seq[String],
               hitsCol: String = "hits"): DataFrame = {
    require(terms.nonEmpty, "empty blocklist")
    df.withColumn(hitsCol,
        array_sort(array_intersect(Portable.tokens(text), lit(terms.toArray))))
      .withColumn(s"n_$hitsCol", size(col(hitsCol)).cast("long"))
  }

  /** Documents with NO blocklisted term (the filter form). */
  def clean(df: DataFrame, text: Column, terms: Seq[String]): DataFrame =
    annotate(df, text, terms).filter(col("n_hits") === 0)
      .drop("hits", "n_hits")
}
