package graft.queries

import org.apache.spark.sql.functions._
import graft.olhovivo.SparkTestBase
import graft.Tables

/** Semantics + plan shape for the round-7 curation entries (q115–q119)
  * on the sf0.001 testdata. Cross-engine value equality is the DuckDB
  * gate's job; these pin the invariants and the physical shapes. */
class CurationQueriesSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"

  test("q115 TPC-H Q5: integer revenue, grouped by nation, broadcast dims") {
    val out = SqlText.q115SqlQ5(spark, dir)
    val rows = out.collect()
    assert(rows.nonEmpty && rows.length <= 25)
    rows.foreach { r =>
      assert(r.getAs[Long]("revenue_e4") > 0L)
      assert(r.getAs[Long]("n_items") > 0L)
    }
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.toLowerCase.contains("cartesian"), plan)
  }

  test("q116 pareto frontier: every kept doc is undominated in its lang") {
    val docs = Tables.documents(spark, dir).select(
      col("doc_id"), col("lang"), col("n_chars"),
      graft.text.TextAnalysis.qualityScore(col("text")).as("q"))
      .collect()
      .map(r => (r.getString(1), r.getLong(0), r.getLong(2), r.getLong(3)))
    val kept = TextOps.q116ParetoFrontier(spark, dir)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val expected = docs.filter { case (g, _, x, y) =>
      !docs.exists { case (g2, _, x2, y2) =>
        g2 == g && x2 >= x && y2 >= y && (x2 > x || y2 > y)
      }
    }.map(_._2).toSet
    assert(kept === expected)
  }

  test("q117 entropy: bounds hold and counts conserve") {
    val out = TextOps.q117SourceEntropy(spark, dir).collect()
    val nDocs = Tables.documents(spark, dir).count()
    assert(out.map(_.getAs[Long]("n")).sum === nDocs)
    val maxEnt = math.log(5) / math.log(2) + 1e-9
    out.foreach { r =>
      val e = r.getAs[Double]("entropy_bits")
      val kl = r.getAs[Double]("kl_to_corpus")
      assert(e >= 0.0 && e <= maxEnt, s"entropy $e out of [0, log2(5)]")
      assert(kl >= -1e-9, s"KL $kl negative")
    }
  }

  test("q118 union evolve: by-name alignment null-pads per branch; no shuffle") {
    val out = Relational.q118UnionEvolve(spark, dir)
    assert(out.columns.toSeq ===
      Seq("o_orderkey", "o_custkey", "o_totalprice", "o_orderstatus",
        "o_orderpriority"))
    val total = Tables.orders(spark, dir).count()
    assert(out.count() === total)
    // each branch's absent columns are null, present columns are not
    val gen1 = out.where(col("o_totalprice").isNotNull)
    val gen2 = out.where(col("o_totalprice").isNull)
    assert(gen1.where(col("o_orderstatus").isNotNull).count() === 0)
    assert(gen2.where(col("o_orderstatus").isNull).count() === 0)
    assert(gen1.count() + gen2.count() === total)
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }

  test("q119 k-anonymity: cohorts >= 10 kept whole, smaller suppressed whole") {
    val out = Relational.q119KAnonymity(spark, dir)
    val cohorts = Tables.customer(spark, dir)
      .groupBy("c_mktsegment", "c_nationkey").count().collect()
      .map(r => ((r.getString(0), r.getInt(1)), r.getLong(2))).toMap
    val got = out.collect()
    got.foreach { r =>
      val key = (r.getAs[String]("c_mktsegment"), r.getAs[Int]("c_nationkey"))
      assert(r.getAs[Long]("cohort_n") === cohorts(key))
      assert(cohorts(key) >= 10L)
    }
    val expectedKept = cohorts.filter(_._2 >= 10L).values.sum
    assert(got.length.toLong === expectedKept)
    // fresh plan: an executed AQE plan prints Final+Initial sections,
    // double-counting every node
    val plan = Relational.q119KAnonymity(spark, dir)
      .queryExecution.executedPlan.toString
    assert(countOf(plan, "Exchange hashpartitioning") === 1, plan)
    assert(!plan.contains("Join"), plan)
  }
}
