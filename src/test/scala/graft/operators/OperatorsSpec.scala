package graft.operators

import org.apache.spark.sql.functions._
import graft.olhovivo.SparkTestBase

/** Unit semantics for the temporal operators: as-of boundaries (≤, ties,
  * tolerance), range-join bucket edges, session gap boundaries. */
class OperatorsSpec extends SparkTestBase {
  import spark.implicits._

  test("asofJoin: picks latest ≤, honors tolerance, left vs inner") {
    val left = Seq((1L, "u", 100L), (2L, "u", 205L), (3L, "u", 9L))
      .toDF("id", "k", "t")
    val right = Seq((10L, "u", 100L), (11L, "u", 50L), (12L, "u", 201L))
      .toDF("rid", "k", "t")
    val joined = AsOfJoin.asofJoin(left, right, "k", "t", "t",
      rightCols = Seq("rid"), toleranceSec = Some(100L), joinType = "left")
      .select($"id", $"asof_rid").collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(joined(1L).contains(10L)) // equal ts matches (asof is ≤)
    assert(joined(2L).contains(12L)) // latest of {100, 50, 201}
    assert(joined(3L).isEmpty)       // nothing ≤ 9
    val inner = AsOfJoin.asofJoin(left, right, "k", "t", "t",
      rightCols = Seq("rid"), toleranceSec = Some(3L), joinType = "inner")
    // tolerance 3: only id=1 (gap 0) within; id=2's gap is 4
    assert(inner.select($"id").collect().map(_.getLong(0)).toSeq == Seq(1L))
  }

  test("selfRangeJoin: strict lower, inclusive upper, bucket boundary crossing") {
    val df = Seq((1L, "u", 0L), (2L, "u", 600L), (3L, "u", 601L), (4L, "u", 1199L))
      .toDF("id", "k", "t")
    val pairs = RangeJoin.selfRangeJoin(df, "k", "t", "id", 600L)
      .select($"l_id", $"r_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // (1,2): 600 ≤ 0+600 inclusive ✓; (1,3): 601 > 600 ✗;
    // (2,3): 601 > 600 strict-lower ✓ (crosses bucket boundary);
    // (2,4): 1199 ≤ 1200 ✓; (3,4): ✓
    assert(pairs == Set((1L, 2L), (2L, 3L), (2L, 4L), (3L, 4L)), s"got $pairs")
  }

  test("selfRangeJoin: negative times bucket by FLOOR division (no truncate-toward-zero miss)") {
    // t = -100 and t = +100 are 200 apart: a hit for horizon 600. With
    // truncating division both land in bucket 0 only by accident of sign;
    // floor places -100 in bucket -1 whose windows (buckets -1, 0) still
    // cover +100 — truncation would also claim bucket 0 for -100 but put
    // its replicas at {0, 1}, missing right rows in bucket -1.
    val df = Seq((1L, "u", -700L), (2L, "u", -100L), (3L, "u", 100L))
      .toDF("id", "k", "t")
    val pairs = RangeJoin.selfRangeJoin(df, "k", "t", "id", 600L)
      .select($"l_id", $"r_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // (1,2): -100 ≤ -700+600 = -100 inclusive ✓; (1,3): 100 > -100 ✗;
    // (2,3): 100 ≤ 500 ✓
    assert(pairs == Set((1L, 2L), (2L, 3L)), s"got $pairs")
  }

  test("intervalOverlapJoin: inclusive touch, bucket crossing, degenerate drop, maxLen error") {
    val iv = Seq(
      (1L, "u", 0L, 100L),
      (2L, "u", 100L, 200L),   // touches 1 at exactly 100 → inclusive overlap
      (3L, "u", 201L, 300L),   // gap of 1 after 2 → no overlap with 2
      (4L, "u", 50L, 260L),    // spans several buckets; overlaps 1, 2, 3
      (5L, "u", 400L, 390L),   // degenerate end < start → drops
      (6L, "v", 0L, 100L)      // other key — never pairs with u
    ).toDF("id", "k", "s", "e")
    val got = RangeJoin.intervalOverlapJoin(iv, "k", "s", "e", "id",
        bucketWidth = 64L, maxLen = 512L)
      .select($"id_a", $"id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 2L), (1L, 4L), (2L, 4L), (3L, 4L)), s"got $got")

    val tooLong = Seq((1L, "u", 0L, 1000L)).toDF("id", "k", "s", "e")
    val err = intercept[Exception] {
      RangeJoin.intervalOverlapJoin(tooLong, "k", "s", "e", "id", 64L, 512L).collect()
    }
    assert(err.getMessage != null)
  }

  test("selfRangeJoin rejects a non-positive horizon") {
    val df = Seq((1L, "u", 0L)).toDF("id", "k", "t")
    intercept[IllegalArgumentException] {
      RangeJoin.selfRangeJoin(df, "k", "t", "id", 0L)
    }
    intercept[IllegalArgumentException] {
      RangeJoin.selfRangeJoin(df, "k", "t", "id", -600L)
    }
  }

  test("countFollowing keeps zero rows") {
    val df = Seq((1L, "u", 0L), (2L, "u", 10000L)).toDF("id", "k", "t")
    val got = RangeJoin.countFollowing(df, "k", "t", "id", 600L)
      .select($"id", $"n_following").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 0L, 2L -> 0L))
  }

  test("saltedSumCount == plain groupBy aggregate") {
    val df = (1 to 500).map(i => (if (i % 10 == 0) "hot" else s"k${i % 7}", i.toDouble))
      .toDF("k", "v")
    val salted = SkewedAggregate.saltedSumCount(df, Seq("k"),
        Map("v" -> "sum_v"), "n", saltBuckets = 8)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val plain = df.groupBy($"k").agg(count(lit(1)).as("n"), sum($"v").as("sum_v"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(salted == plain)
  }

  test("sessionize: gap == timeout stays in session, gap+1 starts new one") {
    val df = Seq((1L, "u", 0L, 1.0), (2L, "u", 1800L, 1.0), (3L, "u", 3601L, 1.0),
      (4L, "v", 0L, 2.0)).toDF("id", "k", "t", "v")
    val sess = Sessionize.withSessionId(df, "k", "t", 1800L, Seq($"id"))
      .select($"id", $"session_id").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sess(1L) == 0L && sess(2L) == 0L) // gap exactly 1800 → same session
    assert(sess(3L) == 1L)                    // 1801 → new session
    assert(sess(4L) == 0L)                    // other key independent
    val stats = Sessionize.sessionStats(df, "k", "t", 1800L, "v", Seq($"id"))
    assert(stats.count() == 3)
  }
}
