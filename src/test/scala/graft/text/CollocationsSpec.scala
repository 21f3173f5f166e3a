package graft.text

import org.apache.spark.sql.functions._
import graft.olhovivo.SparkTestBase

/** Collocations.pmi semantics (hand-computed counts and PMI) and plan
  * shape (aggregated equi-joins + one broadcast, no corpus cross join). */
class CollocationsSpec extends SparkTestBase {

  import spark.implicits._

  test("counts and PMI match a hand computation") {
    // corpus: "a b" ×3, "a c" ×2  →  tokens: a×5, b×3, c×2, N=10
    val docs = (Seq.fill(3)("a b") ++ Seq.fill(2)("a c")).toDF("text")
    val got = Collocations.pmi(docs, col("text"), minPairCount = 2L)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getDouble(5))).sortBy(t => (t._1, t._2))
    // PMI(a,b) = log2(3*10 / (5*3)) = 1;  PMI(a,c) = log2(2*10 / (5*2)) = 1
    assert(got === Seq(
      ("a", "b", 3L, 5L, 3L, 1.0),
      ("a", "c", 2L, 5L, 2L, 1.0)))
  }

  test("minPairCount suppresses rare pairs before the joins") {
    val docs = (Seq.fill(5)("x y") ++ Seq("x z")).toDF("text")
    val got = Collocations.pmi(docs, col("text"), minPairCount = 2L)
      .select("l_tok", "r_tok").as[(String, String)].collect().toSet
    assert(got === Set(("x", "y")))
  }

  test("single-token and empty docs contribute unigrams but no pairs") {
    val docs = Seq("solo", "", "  ", "p q", "p q").toDF("text")
    val got = Collocations.pmi(docs, col("text"), minPairCount = 1L)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(got.toSeq === Seq(("p", "q", 2L)))
  }

  test("plan: equi-joins on aggregated sides; only the 1-row total broadcasts") {
    val docs = Seq("a b", "b c").toDF("text")
    val plan = Collocations.pmi(docs, col("text"), 1L)
      .queryExecution.executedPlan.toString
    assert(!plan.toLowerCase.contains("cartesian"), plan)
    // the single nested-loop join is the broadcast of the 1-row totals
    assert(countOf(plan, "BroadcastNestedLoopJoin") <= 1, plan)
  }
}
