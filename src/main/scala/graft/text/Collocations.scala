package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PMI collocation extraction — pointwise mutual information over
  * adjacent token pairs, the classic corpus-statistics primitive for
  * phrase mining and tokenizer/vocabulary construction (Church & Hanks
  * 1990): PMI(x,y) = log2( P(x,y) / (P(x)·P(y)) ), estimated from
  * corpus counts as log2( c_xy·N / (c_x·c_y) ).
  *
  * Scale design: two map-only explode passes over the corpus (unigrams,
  * adjacent bigrams) each feed ONE partial-merged count aggregation
  * bounded by vocabulary size, not corpus size; the pair table is
  * df-capped BEFORE joining (`minPairCount` — rare pairs carry no
  * stable signal and dominate the pair count otherwise). The two
  * unigram lookups are hash equi-joins keyed on the token — both sides
  * aggregated, so a stopword's million occurrences arrive as ONE row.
  * The corpus total joins as a broadcast 1-row crossJoin (the standing
  * tiny-stats pattern).
  *
  * Cross-engine exactness: counts are exact longs; the PMI double is
  * computed with ONE fixed expression shape — (c_xy·N) / (c_x·c_y),
  * all four operands cast to double first — mirrored verbatim in the
  * oracle SQL, so both engines execute the same IEEE ops in the same
  * order and `round(…, 4)` absorbs the sub-ulp library noise of log2.
  */
object Collocations {

  /** (l_tok, r_tok, c_pair, c_l, c_r, pmi) for adjacent token pairs
    * occurring at least `minPairCount` times. Tokens are
    * whitespace-split (TextAnalysis.tokens), so the two-token shingle
    * splits back on its single interior space losslessly. */
  def pmi(df: DataFrame, text: Column, minPairCount: Long): DataFrame = {
    val uni = df.select(explode(TextAnalysis.tokens(text)).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("c_tok"))
    val totals = uni.agg(sum(col("c_tok")).as("n_tokens"))
    val pairs = df.select(explode(graft.dedup.Dedup.shingles(text, 2)).as("bg"))
      .groupBy(col("bg")).agg(count(lit(1)).as("c_pair"))
      .where(col("c_pair") >= minPairCount)
      .select(
        substring_index(col("bg"), " ", 1).as("l_tok"),
        substring_index(col("bg"), " ", -1).as("r_tok"),
        col("c_pair"))
    val num = col("c_pair").cast("double") * col("n_tokens").cast("double")
    val den = col("c_l").cast("double") * col("c_r").cast("double")
    pairs
      .join(uni.select(col("tok").as("l_tok"), col("c_tok").as("c_l")), "l_tok")
      .join(uni.select(col("tok").as("r_tok"), col("c_tok").as("c_r")), "r_tok")
      .crossJoin(broadcast(totals))
      .select(col("l_tok"), col("r_tok"), col("c_pair"), col("c_l"),
        col("c_r"), graft.functions.Fx.fx(log2(num / den), 4).as("pmi"))
  }
}
