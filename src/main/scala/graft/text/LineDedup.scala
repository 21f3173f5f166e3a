package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-level duplicate-LINE removal — the CCNet/RefinedWeb curation
  * stage batch dedup doesn't cover: boilerplate lines (navigation,
  * cookie banners, license headers) repeat across many documents while
  * the documents themselves are unique, so document-level dedup keeps
  * them. This operator drops every line whose document frequency
  * exceeds `maxDf` and reassembles each document from its surviving
  * lines in order.
  *
  * The caller supplies the line split (an array column) — newline
  * split, sentence split, or fixed token windows — so the corpus
  * policy stays out of the operator.
  *
  * Scale design (100 TB): lines are hashed to 60-bit longs before any
  * shuffle (8-byte keys, the hashedPostings posture; collisions
  * ~|lines|²/2⁶¹ — immaterial for boilerplate removal). Three
  * shuffles, all key-partitioned and partial-agg'd: df count by line
  * hash, survivor semi-join by hash, reassembly by doc. No windows over
  * the corpus, no driver-side state.
  */
object LineDedup {

  /** @return one row per input document: (idCol, clean_text, n_lines,
    *         n_kept); documents whose every line was dropped keep an
    *         empty clean_text. Null/empty line arrays yield n_lines=0.
    *
    *         `scope` caches the exploded+hashed line relation — it
    *         feeds both the df count and the survivor semi-join, and
    *         uncached each consumer would re-scan and re-hash the
    *         corpus (the hashedPostings posture; gate entries release
    *         through CacheScope.scoped). */
  def dropDuplicateLines(docs: DataFrame, idCol: String, linesCol: Column,
                         maxDf: Long, delim: String = " ",
                         scope: graft.CacheScope = graft.CacheScope.unmanaged): DataFrame = {
    require(maxDf > 0, "maxDf must be positive")
    // posexplode_outer: the array is computed — the usual
    // InferFiltersFromGenerate interpreted-Filter trap (q41)
    val exploded = scope.cache(docs
      .select(col(idCol).as("__ld_id"), posexplode_outer(linesCol).as(Seq("pos", "line")))
      .filter(col("line").isNotNull)
      .withColumn("h", graft.functions.Portable.h60(col("line"))))
    val dfCounts = exploded.groupBy(col("h"))
      .agg(countDistinct(col("__ld_id")).as("df"))
    val kept = exploded
      .join(dfCounts.filter(col("df") <= maxDf).select(col("h")), Seq("h"), "left_semi")
    val rebuilt = kept.groupBy(col("__ld_id"))
      .agg(
        array_join(transform(
          array_sort(collect_list(struct(col("pos"), col("line")))),
          s => s.getField("line")), delim).as("clean_text"),
        count(lit(1)).as("n_kept"))
    docs
      .select(col(idCol), coalesce(size(linesCol), lit(0)).cast("long").as("n_lines"))
      .join(rebuilt.withColumnRenamed("__ld_id", idCol), Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("clean_text"), lit("")).as("clean_text"),
        col("n_lines"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"))
  }

  /** Fixed-width token windows as "lines" for delimiter-free corpora
    * (the testdata documents carry no newlines): tokens i·width …
    * i·width+width−1 joined by a space. */
  def tokenWindows(textCol: Column, width: Int): Column = {
    require(width > 0, "width must be positive")
    val toks = split(textCol, " ")
    transform(
      sequence(lit(0), (ceil(size(toks).cast("double") / width) - 1).cast("int")),
      i => array_join(slice(toks, i * width + 1, lit(width)), " "))
  }
}
