package graft.dedup

import org.apache.spark.sql.functions._
import graft.olhovivo.SparkTestBase
import graft.similarity.Similarity

/** Semantics of the dedup + similarity primitives on constructed
  * documents with known relationships. */
class DedupSpec extends SparkTestBase {
  import spark.implicits._

  private val docs = Seq(
    (0L, "the quick brown fox jumps over the lazy dog"),
    (1L, "the quick brown fox jumps over the lazy cat"),  // near-dup of 0
    (2L, "completely different words appear in this one"),
    (3L, "the quick brown fox jumps over the lazy dog"),  // exact dup of 0
    (4L, "ab")                                            // < 3 tokens → no shingles
  ).toDF("doc_id", "text")

  test("shingles: count, content, short-doc empty") {
    val sh = docs.select($"doc_id", Dedup.shingles($"text", 3).as("sh"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(sh(0L).length == 7) // 9 tokens → 7 trigrams
    assert(sh(0L).head == "the quick brown")
    assert(sh(4L).isEmpty)
  }

  test("minhash: identical docs → identical signatures; near-dups agree on most perms") {
    val sig = Dedup.withMinhashSignature(docs, $"text", 8, 3, "sig")
      .select($"doc_id", $"sig").collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(sig(0L) == sig(3L), "exact dups must collide on every permutation")
    val agree01 = sig(0L).zip(sig(1L)).count { case (a, b) => a == b }
    val agree02 = sig(0L).zip(sig(2L)).count { case (a, b) => a == b }
    assert(agree01 > agree02, s"near-dup agreement $agree01 must beat unrelated $agree02")
  }

  test("jaccardJoin finds the near-dup pair and the exact pair") {
    val pairs = Dedup.jaccardJoin(docs, "doc_id", $"text", 3, 50, 0.2)
      .select($"id_a", $"id_b", $"jaccard").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(pairs((0L, 3L)) == 1.0, "exact dup → jaccard 1.0")
    assert(pairs.contains((0L, 1L)) && pairs((0L, 1L)) > 0.4)
    assert(!pairs.keySet.exists { case (a, b) => Set(a, b).contains(2L) })
  }

  test("hashed co-occurrence ≡ hashed prefix-filtered ≡ string all-pairs on real docs") {
    val real = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    def key(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getDouble(5))).toSet
    // multiple thresholds exercise different prefix lengths, including
    // boundary cases where (1-t)*sz is an exact integer
    for (t <- Seq(0.2, 0.5, 0.75)) {
      val cooc = key(Dedup.jaccardJoin(real, "doc_id", col("text"), 3, 50, t))
      val prefix = key(Dedup.jaccardJoinPrefix(real, "doc_id", col("text"), 3, 50, t))
      val strings = key(Dedup.jaccardJoinAllPairs(real, "doc_id", col("text"), 3, 50, t))
      assert(cooc == prefix,
        s"t=$t: prefix lost ${cooc -- prefix}, extra ${prefix -- cooc}")
      assert(cooc == strings,
        s"t=$t: hashed vs string mismatch (collision?): ${cooc -- strings} / ${strings -- cooc}")
    }
    spark.catalog.clearCache() // unmanaged-scope postings from the three variants
  }

  test("simhash: exact dups equal, near-dups closer in hamming than unrelated") {
    val sh = Dedup.withSimhash(docs, $"text", 24, "sh")
      .select($"doc_id", $"sh").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sh(0L) == sh(3L))
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(sh(0L), sh(1L)) < ham(sh(0L), sh(2L)))
  }

  test("lshBands: bounded mod-M fold — no overflow at any band width, dups still collide") {
    val k = 8
    for (rowsPerBand <- Seq(1, 2, 4, 8)) {
      val bands = Dedup.withMinhashSignature(docs, $"text", k, 3, "sig")
        .filter($"doc_id" =!= 4L) // short doc has a null signature
        .select($"doc_id", Dedup.lshBands($"sig", k, rowsPerBand).as("b"))
        .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
      bands.values.flatten.foreach { v =>
        assert(v >= 0 && v < Dedup.BandM,
          s"band hash $v escaped [0, BandM) at rowsPerBand=$rowsPerBand")
      }
      assert(bands(0L) == bands(3L), "exact dups collide on every band")
    }
  }

  test("native minhash_sig / simhash64 expressions are bit-identical to the fold forms") {
    // includes the edge docs: short doc (empty shingle array) and a doc
    // whose token stream exercises every signature entry
    val mh = Dedup.withMinhashSignature(docs, $"text", 8, 3, "native")
    val mhBoth = Dedup.withMinhashSignatureFold(mh, $"text", 8, 3, "fold")
      .select($"doc_id", $"native", $"fold").collect()
    mhBoth.foreach { r =>
      assert(r.getSeq[java.lang.Long](1) == r.getSeq[java.lang.Long](2),
        s"minhash mismatch for doc ${r.getLong(0)}")
    }
    val sh = Dedup.withSimhash(docs, $"text", 24, "native")
    val shBoth = Dedup.withSimhashFold(sh, $"text", 24, "fold")
      .select($"doc_id", $"native", $"fold").collect()
    shBoth.foreach { r =>
      assert(r.getLong(1) == r.getLong(2), s"simhash mismatch for doc ${r.getLong(0)}")
    }
    // empty text → empty token array → simhash 0, minhash all-null
    val edge = Seq((9L, "")).toDF("doc_id", "text")
    val e = Dedup.withSimhash(
      Dedup.withMinhashSignature(edge, $"text", 4, 3, "mh"), $"text", 8, "sh")
      .select($"mh", $"sh").head()
    assert(e.getSeq[java.lang.Long](0) == Seq(null, null, null, null))
    assert(e.getLong(1) == 0L)
  }

  test("exactCanonical groups exact duplicates to the min id") {
    val canon = Dedup.exactCanonical(docs, "doc_id", $"text")
      .collect().map(r => r.getAs[String]("dedup_key") ->
        (r.getAs[Long]("canonical_id"), r.getAs[Long]("n_docs"))).toMap
    assert(canon("the quick brown fox jumps over the lazy dog") == (0L, 2L))
    assert(canon.size == 4)
  }

  test("cosine: orthogonal 0, identical 1, sign-LSH buckets stable") {
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f, 0.0f)),
      (1L, Array(0.0f, 1.0f, 0.0f, 0.0f)),
      (2L, Array(2.0f, 0.0f, 0.0f, 0.0f))).toDF("vec_id", "embedding")
    val c = vecs.as("a").crossJoin(vecs.as("b"))
      .select($"a.vec_id".as("ia"), $"b.vec_id".as("ib"),
        Similarity.cosine($"a.embedding", $"b.embedding").as("cos"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(c((0L, 1L)) == 0.0)
    assert(math.abs(c((0L, 2L)) - 1.0) < 1e-12)
    val sig = vecs.select($"vec_id",
      Similarity.signLshSignature($"embedding", 8, 4).as("b")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sig(0L) == sig(2L), "colinear vectors share every hyperplane side")
  }
}
