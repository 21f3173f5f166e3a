package graft.operators

import org.apache.spark.sql.functions._

import graft.olhovivo.SparkTestBase

class SamplingSpec extends SparkTestBase {
  import spark.implicits._

  private val docs = (1L to 40L)
    .map(i => (i, if (i <= 25) "a" else "b", s"doc content $i"))
    .toDF("id", "src", "text")

  test("stratifiedSample: exact n per stratum, partitioning-independent, salt redraws") {
    val s1 = Sampling.stratifiedSample(docs, $"src", $"text", $"id", 5)
      .select($"id").collect().map(_.getLong(0)).toSet
    assert(s1.size == 10) // 5 from each stratum
    val s1Repart = Sampling.stratifiedSample(docs.repartition(7), $"src", $"text", $"id", 5)
      .select($"id").collect().map(_.getLong(0)).toSet
    assert(s1 == s1Repart, "sample must not depend on physical partitioning")
    val s2 = Sampling.stratifiedSample(docs, $"src", $"text", $"id", 5, salt = "other")
      .select($"id").collect().map(_.getLong(0)).toSet
    assert(s1 != s2, "a different salt must redraw the sample")
  }

  test("tokenBudgetSample: inclusive boundary, order by salted hash") {
    // every doc has 3 tokens; budget 9 keeps exactly 3 docs per stratum
    // (cum 3, 6, 9 — the doc landing exactly on the budget is kept)
    val kept = Sampling.tokenBudgetSample(docs, $"src", $"text", $"id",
        lit(3L), budget = 9L)
      .groupBy($"src").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(kept == Map("a" -> 3L, "b" -> 3L), s"got $kept")
  }

  test("bm25: tf monotone, rare terms outweigh common, non-matching docs absent") {
    val corpus = Seq(
      (1L, "rare word here"),
      (2L, "common common common filler filler"),
      (3L, "common filler text"),
      (4L, "common text and more text"),
      (5L, "nothing relevant at all")
    ).toDF("doc_id", "text")
    val scores = graft.text.Ranking.bm25(corpus, "doc_id", $"text",
        Seq("rare", "common"))
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(!scores.contains(5L), "non-matching doc must be absent")
    assert(scores(1L) > scores(3L), "one rare term must outscore one common term")
    assert(scores(2L) > scores(3L), "higher tf of the same term must score higher")
  }
}
