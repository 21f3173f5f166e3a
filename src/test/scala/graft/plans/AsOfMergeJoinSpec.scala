package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.olhovivo.SparkTestBase
import graft.operators.AsOfJoin

/** Property test for the native sort-merge as-of exec: on random
  * keys/times (including null keys, null times, left-side ties, equal
  * left/right times), `asofMergeJoin` must agree with BOTH the composed
  * union+window `asofJoin` AND a brute-force in-memory oracle, across
  * tolerance × joinType. Right (key, time) pairs are generated unique —
  * equal-time right ties are nondeterministic in any as-of definition.
  *
  * Also pins the physical plan: AsOfMergeJoinExec present, exactly one
  * exchange per side, strategy installed through the ordinary
  * SparkTestBase session (register()'s experimental-methods seam — the
  * round-2 wiring gap).
  */
case class AsOfL(id: Long, k: Option[String], t: Option[Long])
case class AsOfR(rid: Long, rk: Option[String], rt: Option[Long])

class AsOfMergeJoinSpec extends SparkTestBase {
  import spark.implicits._

  private type L = AsOfL
  private type R = AsOfR
  private val L = AsOfL
  private val R = AsOfR

  private val genL: Gen[List[L]] = for {
    n    <- Gen.choose(0, 30)
    rows <- Gen.listOfN(n, for {
      k <- Gen.option(Gen.oneOf("a", "b", "c", "d"))
      t <- Gen.frequency(9 -> Gen.choose(0L, 60L).map(Some(_)), 1 -> Gen.const(None))
    } yield (k, t))
  } yield rows.zipWithIndex.map { case ((k, t), i) => L(i.toLong, k, t) }

  private val genR: Gen[List[R]] = for {
    n    <- Gen.choose(0, 30)
    rows <- Gen.listOfN(n, for {
      k <- Gen.option(Gen.oneOf("a", "b", "c", "d"))
      t <- Gen.frequency(9 -> Gen.choose(0L, 60L).map(Some(_)), 1 -> Gen.const(None))
    } yield (k, t))
  } yield {
    // unique (key, time) among non-null pairs → deterministic latest-match
    val dedup = rows.distinct
    dedup.zipWithIndex.map { case ((k, t), i) => R(1000L + i, k, t) }
  }

  private def sample[T](g: Gen[T], seed: Long): T =
    g.pureApply(Gen.Parameters.default, Seed(seed))

  /** Brute force: latest right with same key, rt ≤ t, within tolerance. */
  private def oracle(ls: Seq[L], rs: Seq[R], tol: Option[Long],
                     inner: Boolean): Set[(Long, Option[Long])] = {
    val matched = ls.map { l =>
      val m = for {
        k <- l.k; t <- l.t
        best <- rs.filter(r => r.rk.contains(k) &&
            r.rt.exists(rt => rt <= t && tol.forall(t - rt <= _)))
          .sortBy(_.rt.get).lastOption
      } yield best.rid
      l.id -> m
    }
    (if (inner) matched.filter(_._2.isDefined) else matched).toSet
  }

  private def resultSet(df: DataFrame, ridCol: String): Set[(Long, Option[Long])] =
    df.select(col("id"), col(ridCol)).collect()
      .map(r => r.getLong(0) -> Option(r.get(1)).map(_.asInstanceOf[Long])).toSet

  test("asofMergeJoin ≡ composed asofJoin ≡ brute force (random property)") {
    val configs = Seq(
      (None: Option[Long], "left"), (None: Option[Long], "inner"),
      (Some(10L): Option[Long], "left"), (Some(10L): Option[Long], "inner"))
    for (seed <- 1L to 10L) {
      val ls = sample(genL, seed)
      val rs = sample(genR, seed + 7919L)
      val ldf = ls.toDF()
      val rdfComposed = rs.toDF("rid", "k", "t")
      val rdfNative = rs.toDF() // rid, rk, rt — no overlap with left
      for ((tol, jt) <- configs) {
        val expect = oracle(ls, rs, tol, jt == "inner")
        val composed = resultSet(
          AsOfJoin.asofJoin(ldf, rdfComposed, "k", "t", "t",
            rightCols = Seq("rid"), toleranceSec = tol, joinType = jt),
          "asof_rid")
        assert(composed == expect,
          s"composed mismatch seed=$seed tol=$tol jt=$jt:\n got $composed\n want $expect")
        val native = resultSet(
          AsOfJoin.asofMergeJoin(ldf, rdfNative,
            leftKeys = Seq("k"), rightKeys = Seq("rk"),
            leftTime = "t", rightTime = "rt",
            tolerance = tol, joinType = jt),
          "rid")
        assert(native == expect,
          s"native mismatch seed=$seed tol=$tol jt=$jt:\n got $native\n want $expect")
      }
    }
  }

  test("native plan: AsOfMergeJoinExec with one exchange per side") {
    val ldf = Seq(L(1, Some("a"), Some(5L))).toDF()
    val rdf = Seq(R(10, Some("a"), Some(3L))).toDF()
    val joined = AsOfJoin.asofMergeJoin(ldf, rdf,
      leftKeys = Seq("k"), rightKeys = Seq("rk"),
      leftTime = "t", rightTime = "rt")
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("AsOfMergeJoin"), s"native exec missing:\n$plan")
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges == 2, s"expected 2 exchanges, got $exchanges:\n$plan")
    assert(joined.count() == 1L)
  }

  test("q74 native path ≡ q71 composed path on real events (sf0.01)") {
    val dir = "/root/testdata/sf0.01"
    def rows(df: DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val composed = rows(graft.queries.Temporal.q71AsofJoin(spark, dir))
    val native = rows(graft.queries.Temporal.q74AsofNative(spark, dir))
    assert(native == composed,
      s"native≠composed: only-native=${native -- composed}, only-composed=${composed -- native}")
    assert(native.nonEmpty)
  }

  test("asofMergeJoin on multi-column keys") {
    val ldf = Seq((1L, "a", 1, Some(10L)), (2L, "a", 2, Some(10L)), (3L, "b", 1, Some(10L)))
      .toDF("id", "k1", "k2", "t")
    val rdf = Seq((100L, "a", 1, 8L), (200L, "a", 2, 9L), (300L, "b", 9, 1L))
      .toDF("rid", "rk1", "rk2", "rt")
    val got = AsOfJoin.asofMergeJoin(ldf, rdf,
        leftKeys = Seq("k1", "k2"), rightKeys = Seq("rk1", "rk2"),
        leftTime = "t", rightTime = "rt", joinType = "left")
      .select(col("id"), col("rid")).collect()
      .map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(got == Map(1L -> Some(100L), 2L -> Some(200L), 3L -> None), s"got $got")
  }
}
