package graft.text

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.olhovivo.SparkTestBase
import graft.operators.{Scd2, Upsert}

/** Property invariants for the corpus-prep/snapshot operators. Window
  * placement is checked against a pure-Scala model over hundreds of
  * cases (no Spark job each); the algebraic laws of upsert and SCD-2 run
  * through the real operators on a few seeded datasets.
  */
class CorpusPropertiesSpec extends SparkTestBase {
  import spark.implicits._

  private val params = Gen.Parameters.default
  private def samples[T](g: Gen[T], n: Int): Seq[T] =
    (0 until n).flatMap(i => g.apply(params, Seed(i.toLong)))

  // pure mirror of Chunking.maxStart (same integer arithmetic)
  private def starts(n: Int, size: Int, stride: Int): Seq[Int] = {
    val maxStart = ((math.max(n - size, 0) + stride - 1) / stride) * stride
    0 to maxStart by stride
  }

  test("chunk placement: full coverage, no start past the end, stride-regular") {
    val g = for {
      n <- Gen.choose(0, 300); size <- Gen.choose(1, 64)
      stride <- Gen.choose(1, size)
    } yield (n, size, stride)
    samples(g, 500).foreach { case (n, size, stride) =>
      val ss = starts(n, size, stride)
      assert(ss.head == 0 && ss == ss.sorted)
      assert(ss.sliding(2).forall(p => p.length < 2 || p(1) - p(0) == stride))
      // coverage: every token index falls in ≥1 window
      val covered = ss.flatMap(s => s until math.min(s + size, n)).toSet
      assert(covered == (0 until n).toSet, s"hole at n=$n size=$size stride=$stride")
      // no window starts at/after the end (except the n=0 degenerate)
      if (n > 0) assert(ss.last < n, s"overshoot at n=$n size=$size stride=$stride")
      // the last window reaches the end
      assert(ss.last + size >= n)
    }
  }

  private def mkChanges(seed: Int, rows: Int) = {
    val g = for {
      k <- Gen.choose(0, 7); v <- Gen.choose(0L, 5L)
    } yield (k, v)
    samples(g, rows).zipWithIndex
      .map { case ((k, v), i) => (s"k$k", v, i.toLong, s"p$i") }
      .toDF("k", "v", "seq", "payload")
  }

  test("upsert laws: merge ≡ whole-stream compaction; re-applying a batch is a no-op") {
    for (seed <- 1 to 3) {
      val all = mkChanges(seed, 60)
      val s = all.filter($"seq" % 3 === 0)
      val u = all.filter($"seq" % 3 =!= 0)
      val keyOrder = Seq("k", "v", "seq", "payload")
      def rows(df: org.apache.spark.sql.DataFrame) =
        df.select(keyOrder.map(col): _*).collect().map(_.toSeq).toSet
      val merged = Upsert.latestWins(
        Upsert.compact(s, Seq("k"), Seq("v", "seq")), u, Seq("k"), Seq("v", "seq"))
      // incremental merge reaches the same snapshot as compacting the
      // whole change stream at once ((v, seq) is a total order: seq unique)
      assert(rows(merged) == rows(Upsert.compact(all, Seq("k"), Seq("v", "seq"))))
      // idempotence: the update batch re-applied changes nothing
      assert(rows(Upsert.latestWins(merged, u, Seq("k"), Seq("v", "seq"))) == rows(merged))
    }
  }

  test("scd2 intervals tile each key's timeline: contiguous, open-ended, alternating") {
    for (seed <- 1 to 3) {
      val g = for {
        k <- Gen.choose(0, 4); t <- Gen.choose(0L, 1000L); a <- Gen.choose(0, 2)
      } yield (k, t, a)
      val obs = samples(g, 80 * seed).distinct
        .groupBy(r => (r._1, r._2)).map(_._2.head).toSeq // unique (k, t)
        .map { case (k, t, a) => (s"k$k", t, s"a$a") }
        .toDF("k", "t", "attr")
      val byKey = Scd2.intervalize(obs, Seq("k"), "t", "attr")
        .collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2),
          Option(r.get(3)).map(_.asInstanceOf[Long])))
        .groupBy(_._1)
      val minTs = obs.groupBy($"k").agg(min($"t")).collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      byKey.foreach { case (k, ivs0) =>
        val ivs = ivs0.sortBy(_._3)
        // first interval opens at the key's first observation
        assert(ivs.head._3 == minTs(k))
        // contiguous tiling: each valid_to is the next valid_from
        ivs.sliding(2).foreach {
          case Array(a, b) =>
            assert(a._4.contains(b._3), s"gap in $k: $a then $b")
            assert(a._2 != b._2, s"uncompressed run in $k: $a then $b")
          case _ =>
        }
        // exactly one open interval per key, and it is the last
        assert(ivs.last._4.isEmpty && ivs.init.forall(_._4.nonEmpty))
      }
    }
  }
}
