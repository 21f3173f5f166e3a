package graft.operators

import org.apache.spark.sql.functions._
import graft.olhovivo.SparkTestBase

/** Seeded corpus shuffle: bijection, reproducibility, oracle order,
  * and the one-exchange plan. */
class CorpusShuffleSpec extends SparkTestBase {
  import spark.implicits._

  private val docs = (0L until 1000L).toDF("doc_id")

  test("the permutation is a bijection onto 1..N") {
    val pos = CorpusShuffle.permute(docs, col("doc_id"), "seed-a")
      .select("shuffle_pos").as[Long].collect().sorted
    assert(pos.toSeq == (1L to 1000L))
  }

  test("same seed → bit-identical order; different seed → different order") {
    def run(seed: String) = CorpusShuffle.permute(docs, col("doc_id"), seed)
      .select("doc_id", "shuffle_pos").as[(Long, Long)].collect().toMap
    val a1 = run("seed-a"); val a2 = run("seed-a"); val b = run("seed-b")
    assert(a1 == a2, "same seed must reproduce exactly")
    assert(a1 != b, "a different seed must be a different permutation")
  }

  test("positions equal the naive global-sort rank") {
    val got = CorpusShuffle.permute(docs, col("doc_id"), "seed-x", partitions = 7)
      .select("doc_id", "shuffle_pos").as[(Long, Long)].collect().toMap
    val naive = docs
      .withColumn("__h", CorpusShuffle.shuffleKey("seed-x", col("doc_id")))
      .withColumn("shuffle_pos",
        row_number().over(org.apache.spark.sql.expressions.Window
          .orderBy(col("__h"), col("doc_id"))).cast("long"))
      .select("doc_id", "shuffle_pos").as[(Long, Long)].collect().toMap
    assert(got == naive)
  }

  test("plan: the corpus crosses exactly one MATERIALIZED range exchange; offsets broadcast") {
    val df = CorpusShuffle.permute(docs, col("doc_id"), "seed-p")
    df.collect()
    // post-execution adaptive plan: the two logical consumers of the
    // range exchange must share ONE materialized shuffle stage (AQE
    // stage reuse) — the corpus is ranged once, not twice
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("isFinalPlan=true"), s"expected a finalized AQE plan:\n$p")
    val finalSection = p.split(java.util.regex.Pattern.quote("== Initial Plan ==")).head
    val materializedRange = finalSection.linesIterator.count(l =>
      l.contains("Exchange rangepartitioning") && !l.contains("ReusedExchange"))
    assert(materializedRange == 1,
      s"corpus must cross exactly one materialized range exchange:\n$finalSection")
    assert(finalSection.contains("ReusedExchange"),
      s"the counts branch must reuse the range shuffle, not recompute it:\n$finalSection")
    assert(finalSection.contains("BroadcastHashJoin"),
      s"offsets must broadcast:\n$finalSection")
  }
}
