package graft.operators

import org.apache.spark.sql.functions._
import graft.olhovivo.SparkTestBase

/** The adaptive host-side join strategy (VERDICT r16 wrong #1): the
  * SAME rows come back on either branch; the ceiling conf forces the
  * shuffled-hash fallback a gate-scale corpus never reaches. */
class AdaptiveJoinSpec extends SparkTestBase {
  import spark.implicits._

  private val ceiling = AdaptiveJoin.CeilingConf

  private def robotsVerdicts(): Seq[(Long, Boolean, String)] = {
    val robots = Seq(
      ("a.example", "User-agent: bot\nDisallow: /x"),
      ("b.example", "User-agent: *\nDisallow: /y")).toDF("host", "txt")
    val docs = Seq(
      (1L, "a.example", "/x/1"), (2L, "a.example", "/free"),
      (3L, "b.example", "/y/2"), (4L, "b.example", "/ok")).toDF("doc_id", "host", "path")
    val rs = graft.text.Robots.ruleSet(robots, col("host"), col("txt"))
    graft.text.Robots.allowed(docs, rs, "bot")
      .select(col("doc_id"), col("allowed"), col("rule_path"))
      .as[(Long, Boolean, String)].collect().toSeq.sortBy(_._1)
  }

  test("Robots.allowed: broadcast and shuffled-hash branches return identical rows") {
    val viaBroadcast = robotsVerdicts()
    spark.conf.set(ceiling, "0")
    try {
      val viaShuffle = robotsVerdicts()
      assert(viaShuffle == viaBroadcast,
        s"branch divergence:\n  bcast=$viaBroadcast\n  shuf=$viaShuffle")
    } finally spark.conf.unset(ceiling)
  }

  test("the ceiling actually flips the physical strategy") {
    val small = Seq((1L, "a"), (2L, "b")).toDF("k", "v")
    val big = Seq((1L, 10L), (2L, 20L), (1L, 30L)).toDF("k", "x")

    val bPlan = big.join(AdaptiveJoin.broadcastIfSmall(small), Seq("k"))
      .queryExecution.executedPlan.toString
    assert(bPlan.contains("BroadcastHashJoin"),
      s"under the ceiling the join must broadcast:\n$bPlan")

    spark.conf.set(ceiling, "0")
    try {
      val sPlan = big.join(AdaptiveJoin.broadcastIfSmall(small), Seq("k"))
        .queryExecution.executedPlan.toString
      assert(sPlan.contains("ShuffledHashJoin"),
        s"past the ceiling the join must shuffle-hash:\n$sPlan")
      assert(!sPlan.contains("BroadcastHashJoin"),
        s"no broadcast past the ceiling:\n$sPlan")
    } finally spark.conf.unset(ceiling)
  }

  test("a malformed ceiling override fails naming the conf key, not with a bare NumberFormatException") {
    val small = Seq((1L, "a")).toDF("k", "v")
    spark.conf.set(ceiling, "100k")
    try {
      val e = intercept[IllegalArgumentException] {
        AdaptiveJoin.broadcastIfSmall(small)
      }
      assert(e.getMessage.contains(ceiling) && e.getMessage.contains("100k"),
        s"the error must name the conf key and the bad value: ${e.getMessage}")
    } finally spark.conf.unset(ceiling)
  }

  test("knownRows skips the count and still picks the right branch") {
    val small = Seq((1L, "a")).toDF("k", "v")
    val big = Seq((1L, 10L)).toDF("k", "x")
    val forced = big.join(
      AdaptiveJoin.broadcastIfSmall(small, knownRows = Some(Long.MaxValue)), Seq("k"))
      .queryExecution.executedPlan.toString
    assert(forced.contains("ShuffledHashJoin"), s"got:\n$forced")
  }
}
