package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Lexical relevance ranking over the documents table: Okapi BM25
  * (Robertson/Walker, public literature) for a literal query term set.
  *
  * Scale design: one map-only pass computes per-document term
  * frequencies and length; one tiny global aggregate (count/avgdl/df
  * per term — a single row) is broadcast back; the score is a pure
  * column expression. No posting-list shuffle at all for scoring a
  * fixed query — the corpus-wide stats are the only reduction, and at
  * 100 TB that is one partial-aggregated row. */
object Ranking {

  /** @param terms query literals (deduplicated, order defines the
    *              summation order — mirror it in any oracle SQL).
    * Returns (doc_id, dl, bm25) for documents matching ≥ 1 term. */
  def bm25(docs: DataFrame, idCol: String, textCol: Column,
           terms: Seq[String], k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(terms.nonEmpty && terms.distinct == terms, "terms must be distinct")
    val base = docs
      .select(col(idCol).as("doc_id"), TextAnalysis.tokens(textCol).as("toks"))
      .withColumn("dl", size(col("toks")).cast("long"))
    val withTf = terms.zipWithIndex.foldLeft(base) { case (df, (t, i)) =>
      df.withColumn(s"tf_$i", size(filter(col("toks"), x => x === lit(t))).cast("long"))
    }.drop("toks")
    val statAggs =
      Seq(count(lit(1)).as("n_docs"), avg(col("dl")).as("avgdl")) ++
        terms.indices.map(i =>
          sum((col(s"tf_$i") > 0).cast("long")).as(s"df_$i"))
    val stats = withTf.agg(statAggs.head, statAggs.tail: _*)
    val scored = withTf.crossJoin(broadcast(stats))
    val score = terms.indices.map { i =>
      val tf = col(s"tf_$i").cast("double")
      val dfT = col(s"df_$i").cast("double")
      val idf = log((col("n_docs") - dfT + 0.5) / (dfT + 0.5) + 1.0)
      idf * (tf * (k1 + 1.0)) /
        (tf + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / col("avgdl")))
    }.reduce(_ + _)
    scored
      .filter(terms.indices.map(i => col(s"tf_$i") > 0).reduce(_ || _))
      .select(col("doc_id"), col("dl"), graft.functions.Fx.fx(score, 4).as("bm25"))
  }
}
