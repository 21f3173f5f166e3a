package graft.similarity

import org.apache.spark.sql.functions._
import graft.olhovivo.SparkTestBase
import graft.Tables

/** The corpus-adaptive sizing rules for the two bucketed vector paths
  * (sign-LSH plane count, IVF centroid count) — the vector twins of
  * Dedup.simhashBitsFor / Clustering.adaptiveK. Each rule must (a) keep
  * every gate corpus at the legacy value so the static DuckDB oracles
  * stay exact, (b) grow with the corpus so bucket/list occupancy stays
  * bounded, and (c) leave the operator's semantics intact (sign-LSH:
  * widening only refines buckets; IVF: full probe stays exact at any k). */
class AdaptiveParamsSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"
  private lazy val emb = Tables.embeddings(spark, dir)

  test("planesFor: gate floor, log2 growth, signed-long cap") {
    assert(Similarity.planesFor(20) == 8)     // sf0.001
    assert(Similarity.planesFor(2000) == 8)   // sf0.1 — gate planes unchanged
    assert(Similarity.planesFor(32 * 256) == 8)  // last corpus at the floor
    assert(Similarity.planesFor(32 * 256 + 1) == 9)
    assert(Similarity.planesFor(200000) == 13)   // the 100× scale corpus
    // ceil(log2(2^63 / 32)) = 58 — the 62 cap can never bind for a Long
    // input, it guards hypothetical wider callers
    assert(Similarity.planesFor(Long.MaxValue) == 58)
  }

  test("widening planes only refines buckets: pair set at p+2 ⊆ pair set at p") {
    // hyperplanes(p) is a prefix of hyperplanes(p+2) (same seed,
    // sequential draws), so each (p+2)-plane bucket refines a p-plane
    // bucket and the surviving pair set can only shrink. Base set:
    // corpus ∪ a positively-scaled copy — scaling preserves every sign
    // dot, so each (v, 1.001·v) pair shares its bucket at ANY plane
    // count (cosine 1), guaranteeing the property is tested non-vacuously.
    val doubled = emb.select(col("vec_id"), col("embedding")).union(
      emb.select(col("vec_id") + 10000,
        transform(col("embedding"), x => (x * lit(1.001f)).cast("float"))))
    def pairs(planes: Int) =
      Similarity.lshNearDupPairs(doubled, planes, dim = 64, minCos = 0.3)
        .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val p8 = pairs(8)
    val p10 = pairs(10)
    assert(p10.subsetOf(p8), s"widened pairs not a subset: ${p10 -- p8}")
    assert(p10.nonEmpty) // scaled twins survive at every width
  }

  test("Ivf.kFor: gate floor, Θ(√n) growth, model-size cap") {
    assert(Ivf.kFor(20) == 8)      // sf0.001
    assert(Ivf.kFor(2000) == 8)    // sf0.1 — gate k unchanged
    assert(Ivf.kFor(4096) == 8)    // last corpus at the floor
    assert(Ivf.kFor(4161) == 9)    // first corpus above it (⌈√(4161/64)⌉)
    assert(Ivf.kFor(200000) == 56) // the 100× scale corpus
    assert(Ivf.kFor(Long.MaxValue) == 4096) // driver model stays bounded
  }

  test("append reports the growth refit cue when the corpus outgrows kFor") {
    // Pure growth — the appended batch is drawn FROM the indexed
    // distribution, so drift must stay false while outgrown fires once
    // the post-append corpus's kFor exceeds growthFactor × the fit k.
    implicit val s: org.apache.spark.sql.SparkSession = spark
    val model = Ivf.fit(emb, k = 8, iters = 2)
    val path = graft.TempArtifacts.dir("graft_adaptive_append") + "/index"
    Ivf.index(emb, model).write.parquet(path)
    Ivf.writeIndexStats(path, Some(model))
    val n0 = emb.count() // 500 at sf0.001
    // the corpus re-appended once: still far below kFor's floor knee
    val small = Ivf.append(emb.select(col("vec_id") + 1000000, col("embedding"))
      .toDF("vec_id", "embedding"), path, model)
    assert(!small.outgrown && small.recommendedK == 8 && !small.drifted)
    // a batch that pushes the corpus past kFor⁻¹(2·8) = 16384 vectors:
    // replicate the in-distribution embeddings via a range cross join
    val copies = 16384L / n0 + 2
    val big = emb.select(col("embedding")).crossJoin(
      spark.range(copies).select(col("id")))
      .select((monotonically_increasing_id() + 2000000).as("vec_id"), col("embedding"))
    val r = Ivf.append(big, path, model)
    val total = 2 * n0 + copies * n0
    assert(r.outgrown, s"expected outgrown at n=$total, got $r")
    assert(r.recommendedK == Ivf.kFor(total))
    assert(!r.drifted, s"in-distribution growth must not read as drift: $r")
  }

  test("full probe stays exact at a non-legacy adaptive k") {
    // k=13 (≠ the legacy 8, not a divisor of the corpus) exercises the
    // arbitrary-k codegen path end to end: full probe ≡ brute force.
    val model = Ivf.fit(emb, k = 13, iters = 3)
    val indexed = Ivf.index(emb, model)
    val queries = emb.filter(col("vec_id") < 10)
    def asPairs(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val ivf = asPairs(Ivf.search(queries, indexed, model, topK = 5, nProbe = model.k))
    val bf = asPairs(Similarity.bruteForceTopK(queries, emb, 5)
      .select(col("query_id"), col("rank").cast("long"), col("corpus_id")))
    assert(ivf == bf)
  }
}
