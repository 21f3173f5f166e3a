package graft.operators

import org.apache.spark.sql.functions._
import graft.olhovivo.SparkTestBase

/** Bounded-hop functional-graph resolution (r19): sinks settle, loops
  * flag at the revisited node, and a chain longer than the budget comes
  * back unsettled instead of silently truncated-as-final. */
class ChainResolveSpec extends SparkTestBase {
  import spark.implicits._

  test("sinks settle, loops detect at the revisited node, budget exhaustion is visible") {
    val edges = Seq(
      "a" -> "b", "b" -> "c",             // 2-hop chain to a sink
      "d" -> "e", "e" -> "d",             // 2-cycle
      "f" -> "f",                         // self-loop
      "g" -> "h", "h" -> "i", "i" -> "j", "j" -> "k" // longer than budget
    ).toDF("src", "dst")
    val starts = Seq("a", "b", "c", "d", "f", "g").toDF("node")
    val got = ChainResolve.resolve(starts, edges, maxHops = 3)
      .select(col("node"), col("final_node"), col("hops"),
        col("is_loop"), col("settled"))
      .as[(String, String, Long, Boolean, Boolean)]
      .collect().map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    assert(got("a") == (("c", 2L, false, true)), s"got ${got("a")}")
    assert(got("b") == (("c", 1L, false, true)))
    assert(got("c") == (("c", 0L, false, true)))
    // d → e → d: the revisit is the stop, and the detecting hop counts
    assert(got("d") == (("d", 2L, true, true)), s"got ${got("d")}")
    assert(got("f") == (("f", 1L, true, true)))
    // g walks 3 of its 4 hops and must say so, not claim j is final
    assert(got("g") == (("j", 3L, false, false)), s"got ${got("g")}")
  }
}
