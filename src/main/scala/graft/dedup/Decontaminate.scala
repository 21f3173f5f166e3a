package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Benchmark decontamination — the training-data hygiene step that
  * keeps evaluation honest: flag every corpus document sharing a word
  * n-gram with a benchmark/eval document, so contaminated docs can be
  * dropped before training (the published recipe of the GPT-3 and PaLM
  * papers: n-gram collision against the test sets).
  *
  * Scale design (100 TB corpus, benchmark-sized eval set): the
  * benchmark's distinct gram set is eval-sized and travels as h60
  * longs (8 bytes/gram), so it BROADCASTS; the corpus side is a
  * map-only tokenize+hash+explode feeding a broadcast join — the only
  * corpus shuffle is the final per-doc count, whose input has already
  * shrunk to contaminated (doc, gram) hits. Both engines hash grams
  * identically (Portable.h60), so the compare stays exact.
  */
object Decontaminate {

  /** (id, hits): how many DISTINCT benchmark n-grams each contaminated
    * corpus document contains; clean documents are absent (semi-join
    * semantics — callers anti-join on the result to purge). */
  def overlap(corpus: DataFrame, idCol: String, textCol: Column,
              benchmark: DataFrame, benchTextCol: Column, n: Int): DataFrame = {
    val bench = gramHashes(benchmark.select(benchTextCol.as("__bt")),
        col("__bt"), n, keep = Seq.empty)
      .distinct()
    val corp = gramHashes(corpus.select(col(idCol), textCol.as("__ct")),
        col("__ct"), n, keep = Seq(idCol))
    corp.join(broadcast(bench), Seq("g"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("hits"))
  }

  /** One row per (keep*, distinct gram h60) — explode_outer + null
    * filter ABOVE the generate (the InferFiltersFromGenerate trap:
    * plain `explode` on a computed array lets pushdown inline the
    * whole tokenize+hash pipeline into an interpreted Filter). */
  private def gramHashes(df: DataFrame, text: Column, n: Int,
                         keep: Seq[String]): DataFrame =
    Dedup.withShingleHashes(df, text, n)(array_distinct)("__dg")
      .select(keep.map(col) :+ explode_outer(col("__dg")).as("g"): _*)
      .filter(col("g").isNotNull)
}
