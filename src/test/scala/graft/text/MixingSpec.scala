package graft.text

import org.apache.spark.sql.functions._

import graft.olhovivo.SparkTestBase

/** Temperature-mixing semantics: α=1/2 weights from exact integer
  * sqrt, floor shares that never overshoot, flatter-than-natural
  * mixture. */
class MixingSpec extends SparkTestBase {
  import spark.implicits._

  test("hand-computed weights for a skewed two-source corpus") {
    // source a: 9 + 7 = 16 tokens (isq 4); source b: 100 tokens (isq 10)
    val docs = Seq(("a", 9L), ("a", 7L), ("b", 100L)).toDF("src", "n")
    val byName = Mixing.sourceWeights(docs, col("src"), col("n"), 700L)
      .collect().map(r => r.getString(0) ->
        ((r.getAs[Long]("n_tokens"), r.getAs[Long]("weight_bp"),
          r.getAs[Long]("alloc_tokens")))).toMap
    assert(byName("a") == ((16L, 10000L * 4 / 14, 700L * 4 / 14)))
    assert(byName("b") == ((100L, 10000L * 10 / 14, 700L * 10 / 14)))
    // temperature flattens: b has 86% of tokens but only 71% of weight
    assert(byName("b")._2 < 8600L && byName("b")._2 > 5000L)
  }

  test("floor shares: weights sum ≤ 10000, allocations sum ≤ budget") {
    val docs = (1L to 200L).map(i => (s"s${i % 7}", i % 40 + 1)).toDF("src", "n")
    val rows = Mixing.sourceWeights(docs, col("src"), col("n"), 12345L).collect()
    assert(rows.length == 7)
    assert(rows.map(_.getAs[Long]("weight_bp")).sum <= 10000L)
    assert(rows.map(_.getAs[Long]("alloc_tokens")).sum <= 12345L)
    rows.foreach(r => assert(r.getAs[Long]("weight_bp") > 0))
  }

  test("sampleToBudget: deterministic, rate-capped, roughly proportional") {
    val docs = (1L to 400L)
      .map(i => (i, s"s${i % 4}", s"text body $i", 10L))
      .toDF("doc_id", "src", "text", "n")
    def run() = Mixing.sampleToBudget(docs, "doc_id", col("src"), col("n"),
        budgetTokens = 1000L, hashKey = col("text"), salt = "t")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    val kept = run()
    assert(kept == run()) // content-hash selection: identical re-run
    // 4 equal sources, budget = 25% of tokens → rate ≈ 2500 bp each
    val rates = kept.map(_._3)
    assert(rates.forall(r => r > 0 && r <= 10000L))
    // kept fraction within a loose band of the rate (hash uniformity)
    assert(kept.size > 40 && kept.size < 160, s"kept ${kept.size}/400")
    // a budget beyond the corpus keeps EVERYTHING (rate capped at 100%)
    val all = Mixing.sampleToBudget(docs, "doc_id", col("src"), col("n"),
      budgetTokens = 1000000L, hashKey = col("text"), salt = "t")
    assert(all.count() == 400L)
  }

  test("sampleToBudget: a zero-token source keeps NOTHING (÷0 guard)") {
    val docs = Seq((1L, "real", "x", 10L), (2L, "empty", "", 0L), (3L, "empty", "", 0L))
      .toDF("doc_id", "src", "text", "n")
    val kept = Mixing.sampleToBudget(docs, "doc_id", col("src"), col("n"),
        budgetTokens = 100L, hashKey = col("text"), salt = "t")
      .select(col("source")).collect().map(_.getString(0)).toSet
    assert(!kept.contains("empty"), s"zero-token source leaked: $kept")
  }
}
