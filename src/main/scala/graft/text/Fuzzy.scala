package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Fuzzy string matching — all pairs within edit distance `maxDist`
  * (spelling-variant dedup, OCR-noise normalization, entity aliasing)
  * WITHOUT the cross join a naive `levenshtein(a, b) ≤ k` predicate
  * would force.
  *
  * FastSS deletion neighborhoods (Bocek et al., 2007): if
  * dist(a, b) ≤ k then deleting ≤ k characters from each side meets in
  * a common variant — so candidates are an EQUI-join of the exploded
  * del≤k neighborhoods, then the exact (codegen) `levenshtein` filter
  * restores precision. Neighborhood size is O(L^k) per term (L+1 for
  * k=1, +L(L-1)/2 for k=2) — linear corpus blow-up, shuffled by variant
  * hash; nothing is ever all-pairs.
  *
  * All candidate generation is built-in expressions (substr/concat over
  * sequences — codegen, no UDF); the verify is Spark's native
  * levenshtein. Supports k ∈ {1, 2}.
  */
object Fuzzy {

  /** Distinct deletion variants of `s` with ≤ maxDist single-character
    * deletions (includes `s` itself). */
  def deletionVariants(s: Column, maxDist: Int): Column = {
    require(maxDist == 1 || maxDist == 2, "maxDist must be 1 or 2")
    val L = length(s)
    def delete1(i: Column): Column =
      concat(s.substr(lit(1), i - 1), s.substr(i + 1, L - i))
    // delete positions i < j: s[1..i-1] ++ s[i+1..j-1] ++ s[j+1..L]
    def delete2(i: Column, j: Column): Column =
      concat(s.substr(lit(1), i - 1), s.substr(i + 1, j - i - 1),
        s.substr(j + 1, L - j))
    val empty = array().cast("array<string>")
    // Spark's sequence(a, b) DESCENDS when a > b, so every range is
    // guarded to be ascending-only (L=0: no deletions; L=1: no pairs)
    val d1 = when(L >= lit(1), transform(sequence(lit(1), L), i => delete1(i)))
      .otherwise(empty)
    val all = if (maxDist == 1) concat(array(s), d1) else {
      val d2 = when(L >= lit(2),
        flatten(transform(sequence(lit(1), L - 1),
          i => transform(sequence(i + 1, L), j => delete2(i, j)))))
        .otherwise(empty)
      concat(array(s), d1, d2)
    }
    array_distinct(all)
  }

  /** All unordered pairs of `col` values (distinct values of the input)
    * within edit distance `maxDist`: (a, b, dist) with a < b.
    *
    * Candidates come from the variant equi-join (on the 60-bit hash of
    * the variant — false collisions are removed by the exact verify);
    * pair dedup keys on the pair itself. */
  def fuzzyPairs(df: DataFrame, strCol: Column, maxDist: Int): DataFrame = {
    val terms = df.select(strCol.as("term")).distinct()
    val posting = terms
      .select(col("term"),
        explode(deletionVariants(col("term"), maxDist)).as("variant"))
      .select(col("term"), graft.functions.Portable.h60(col("variant")).as("vh"))
    val cands = posting.as("l")
      .join(posting.withColumnRenamed("term", "term_b").as("r"), Seq("vh"))
      .filter(col("term") < col("term_b"))
      .select(col("term").as("term_a"), col("term_b"))
      .distinct()
    cands
      .withColumn("dist", levenshtein(col("term_a"), col("term_b")).cast("long"))
      .filter(col("dist") <= maxDist)
  }
}
