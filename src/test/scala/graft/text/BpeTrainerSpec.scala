package graft.text

import org.apache.spark.sql.functions._
import graft.olhovivo.SparkTestBase

/** BPE merge learning against the classic hand-computed example
  * (low/lower/newest/widest), plus tie and edge behavior. */
class BpeTrainerSpec extends SparkTestBase {
  import spark.implicits._

  test("learns the textbook merge sequence with deterministic ties") {
    // Sennrich et al.'s example vocabulary: low x5, lower x2,
    // newest x6, widest x3 — as one document per word occurrence
    val words = Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest")
    val docs = words.zipWithIndex.map { case (w, i) => (i.toLong, w) }
      .toDF("doc_id", "text")
    val rules = BpeTrainer.train(docs, col("text"), 5)
    // round 1: e-s and s-t tie at 9 -> lexicographically lower left
    // wins; then est at 9; l-o and o-w tie at 7 -> (l, o); then (lo, w);
    // round 5: n-e / e-w / w-est tie at 6 -> (e, w)
    assert(rules.map(r => (r.left, r.right, r.count)) == Seq(
      ("e", "s", 9L), ("es", "t", 9L), ("l", "o", 7L),
      ("lo", "w", 7L), ("e", "w", 6L)))
    assert(rules.map(_.round) == Seq(1, 2, 3, 4, 5))
  }

  test("overlapping pairs count per occurrence; merge applies left-to-right") {
    // "aaaa": round-1 pairs (a,a) x3; merge -> [aa, aa]; round 2 merges
    // (aa, aa) once
    val docs = Seq((1L, "aaaa")).toDF("doc_id", "text")
    val rules = BpeTrainer.train(docs, col("text"), 2)
    assert(rules.map(r => (r.left, r.right, r.count)) == Seq(
      ("a", "a", 3L), ("aa", "aa", 1L)))
  }

  test("repeating pair sequences pair greedily left-to-right (the replace trap)") {
    // "ababab" + merge (a,b) must give [ab, ab, ab]: round 2's top pair
    // is then (ab, ab) x2 — a string-replace merge would have produced
    // [ab, a, b, ab] shapes and a different round-2 table
    val docs = Seq((1L, "ababab ababab")).toDF("doc_id", "text")
    val rules = BpeTrainer.train(docs, col("text"), 2)
    assert(rules.map(r => (r.left, r.right, r.count)) == Seq(
      ("a", "b", 6L), ("ab", "ab", 4L)))
  }

  test("trainMany with batch=1 is bit-identical to the sequential trainer") {
    val words = Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest")
    val docs = words.zipWithIndex.map { case (w, i) => (i.toLong, w) }
      .toDF("doc_id", "text")
    val seqRules = BpeTrainer.train(docs, col("text"), 5)
    val batched = BpeTrainer.trainMany(docs, col("text"), 5, batch = 1)
    assert(batched == seqRules)
  }

  test("trainMany batches symbol-disjoint rules per sweep with pre-sweep counts") {
    // textbook corpus, batch = 4, 6 rules. Hand-derived sweeps:
    //   sweep 1 counts: (e,s)9 (s,t)9 (w,e)8 (l,o)7 (o,w)7, the 6-ties
    //     (e,w) (n,e), then the 3-ties in left-lex order (d,e) (i,d) (w,i).
    //     disjointness walk: take (e,s); (s,t) shares s, (w,e) shares e;
    //     take (l,o); (o,w) shares o; (n,e)/(e,w)/(d,e) share e;
    //     take (i,d) — candidates exhausted at 3 of 4
    //   sweep 2 (after the three merges): (es,t)9 (lo,w)7 then the 6-count
    //     ties (e,w) (n,e) (w,es) in left-lex order: take (es,t);
    //     take (lo,w); (e,w) shares w; take (n,e)
    val words = Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest")
    val docs = words.zipWithIndex.map { case (w, i) => (i.toLong, w) }
      .toDF("doc_id", "text")
    val rules = BpeTrainer.trainMany(docs, col("text"), 6, batch = 4)
    assert(rules.map(r => (r.left, r.right, r.count)) == Seq(
      ("e", "s", 9L), ("l", "o", 7L), ("i", "d", 3L),
      ("es", "t", 9L), ("lo", "w", 7L), ("n", "e", 6L)))
    assert(rules.map(_.round) == Seq(1, 2, 3, 4, 5, 6))
  }

  test("trainMany: vocab exhaustion stops the sweep loop early") {
    val docs = Seq((1L, "ab a b")).toDF("doc_id", "text")
    val rules = BpeTrainer.trainMany(docs, col("text"), 10, batch = 4)
    assert(rules.map(r => (r.left, r.right, r.count)) == Seq(("a", "b", 1L)))
  }

  test("vocab exhaustion stops early instead of looping") {
    val docs = Seq((1L, "ab a b")).toDF("doc_id", "text")
    // only one mergeable pair exists ("ab" has (a,b); "a"/"b" have none)
    val rules = BpeTrainer.train(docs, col("text"), 10)
    assert(rules.map(r => (r.left, r.right, r.count)) == Seq(("a", "b", 1L)))
  }
}
