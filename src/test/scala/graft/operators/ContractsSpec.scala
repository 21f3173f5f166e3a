package graft.operators

import org.apache.spark.sql.functions._
import graft.olhovivo.SparkTestBase

/** The operators' declared preconditions FAIL LOUDLY — each contract
  * violation throws with a usable message instead of silently
  * corrupting output (the failure mode each guard was added against). */
class ContractsSpec extends SparkTestBase {
  import spark.implicits._

  private val df = Seq(("a", 1L, "x")).toDF("k", "v", "p")

  test("guards: duplicate rule names, reserved __rn, bad fuzzy k, bad chunk stride") {
    import Expectations.Rule
    intercept[IllegalArgumentException] {
      Expectations.audit(df, Seq(Rule("r", $"v" > 0), Rule("r", $"v" < 9)))
    }
    intercept[IllegalArgumentException] { Rule("not an identifier", $"v" > 0) }
    intercept[IllegalArgumentException] {
      QuotaCap.capPerGroup(df.withColumn("__rn", lit(1)), Seq("k"), Seq($"v"), 1)
    }
    intercept[IllegalArgumentException] {
      graft.text.Fuzzy.deletionVariants($"p", maxDist = 3)
    }
    intercept[IllegalArgumentException] {
      graft.text.Chunking.slidingChunks(df, "k", $"p", chunkSize = 8, stride = 9)
    }
    intercept[IllegalArgumentException] {
      Upsert.latestWins(df, df, Seq("k"), Seq("missing_version_col"))
    }
  }

  test("capPerGroupDynamic: a capCol above staticCap truncates to staticCap — the documented precondition, made visible (ADVICE r18)") {
    // 5 rows in one group, quota says keep 5, but the static ceiling is
    // 3: the literal conjunct drops ranks 4..5. This is exactly the
    // silent-row-loss mode the precondition (capCol <= staticCap)
    // forbids — asserted here against the pure dynamic filter so the
    // divergence class is pinned, not latent.
    val rows = (1L to 5L).map(i => ("g", i, 5L)).toDF("k", "id", "quota")
    val capped = QuotaCap.capPerGroupDynamic(rows, Seq("k"), Seq($"id"),
        staticCap = 3, capCol = $"quota", rankName = "rn")
      .select($"id").as[Long].collect().sorted.toSeq
    assert(capped == Seq(1L, 2L, 3L),
      s"violating capCol must truncate at staticCap, got $capped")
    // the pure dynamic filter (no map-side limit) keeps all 5 — the
    // delta IS the precondition's stake
    import org.apache.spark.sql.expressions.Window
    val pure = rows.withColumn("rn",
        row_number().over(Window.partitionBy($"k").orderBy($"id")))
      .filter($"rn".cast("long") <= $"quota")
      .select($"id").as[Long].collect().sorted.toSeq
    assert(pure == (1L to 5L), s"pure filter keeps the quota, got $pure")
    // and when the precondition HOLDS, the two shapes agree exactly
    val ok = (1L to 5L).map(i => ("g", i, 2L)).toDF("k", "id", "quota")
    val a = QuotaCap.capPerGroupDynamic(ok, Seq("k"), Seq($"id"),
        staticCap = 3, capCol = $"quota", rankName = "rn")
      .select($"id").as[Long].collect().sorted.toSeq
    assert(a == Seq(1L, 2L), s"got $a")
  }

  test("denseGrid's in-plan alignment guard fires on off-step buckets") {
    val misaligned = Seq(("a", 0L), ("a", 250L), ("a", 500L)).toDF("k", "b")
    val e = intercept[Exception] {
      Resample.denseGrid(misaligned, Seq("k"), "b", 500L).collect()
    }
    assert(e.getMessage.contains("aligned") ||
      Option(e.getCause).exists(_.getMessage.contains("aligned")),
      s"unexpected error: ${e.getMessage}")
  }

  test("scd2 tiebreak makes same-timestamp change points deterministic") {
    // two observations at t=10 with different values: tiebreak by seq
    // pins the order (A then B) → A opens at 10, B follows at 10
    val obs = Seq(("u", 10L, 1L, "A"), ("u", 10L, 2L, "B"), ("u", 20L, 3L, "B"))
      .toDF("k", "t", "seq", "attr")
    val out = (1 to 3).map { _ =>
      Scd2.intervalize(obs.repartition(4), Seq("k"), "t", "attr",
          tiebreak = Seq("seq"))
        .collect().map(r => (r.getString(1), r.getLong(2),
          Option(r.get(3)).map(_.asInstanceOf[Long]))).toSet
    }
    assert(out.distinct.size == 1, "nondeterministic under repartition")
    assert(out.head == Set(("A", 10L, Some(10L)), ("B", 10L, None)), s"got ${out.head}")
  }
}
