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

  test("simhashBandedPairs ≡ brute-force hamming ≤ 2 at legacy and widened widths") {
    // banding is EXACT for hamming ≤ bands−1 (pigeonhole) — assert it
    // against the all-pairs compute at the legacy 24-bit layout and at
    // the widened layout the adaptive rule picks for large corpora
    val real = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    for (bits <- Seq(24, 48)) {
      def key(df: org.apache.spark.sql.DataFrame) = df.collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getAs[Number](2).intValue)).toSet
      val banded = key(
        Dedup.simhashBandedPairs(real, "doc_id", col("text"), bits))
      val sig = Dedup.withSimhash(real, col("text"), bits, "simhash")
        .select(col("doc_id"), col("simhash"))
      val a = sig.toDF("id_a", "sim_a")
      val b = sig.toDF("id_b", "sim_b")
      val brute = key(
        a.crossJoin(b).filter(col("id_a") < col("id_b"))
          .select(col("id_a"), col("id_b"),
            Dedup.hammingDistance(col("sim_a"), col("sim_b")).as("hamming"))
          .filter(col("hamming") <= 2))
      assert(banded == brute,
        s"bits=$bits: banded lost ${brute -- banded}, extra ${banded -- brute}")
    }
  }

  test("simhashBitsFor: legacy width through gate sizes, log-scaled beyond, capped") {
    assert(Dedup.simhashBitsFor(1) == 24)
    assert(Dedup.simhashBitsFor(500) == 24)
    assert(Dedup.simhashBitsFor(5000) == 24)    // sf0.1 — bench unchanged
    assert(Dedup.simhashBitsFor(8192) == 24)    // last corpus in the legacy regime
    assert(Dedup.simhashBitsFor(8193) == 27)
    assert(Dedup.simhashBitsFor(500000) == 42)  // the 100× scale corpus
    assert(Dedup.simhashBitsFor(Long.MaxValue) == 60) // signed-long cap
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

  test("property: jaccard variants ≡ plain-Scala oracle on exact-boundary corpora") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed

    def shingleSet(text: String): Set[String] = {
      val toks = text.split("\\s+").filter(_.nonEmpty)
      if (toks.length < 3) Set.empty
      else toks.sliding(3).map(_.mkString(" ")).toSet
    }
    // independent reimplementation of the jaccardJoin contract: distinct
    // shingles, df cap over the corpus, round(j, 4) HALF_UP ≥ minJ
    def oracle(docs: Seq[(Long, String)], cap: Int, minJ: Double): Set[(Long, Long, Double)] = {
      val raw = docs.map { case (id, t) => id -> shingleSet(t) }
      val dfc = raw.flatMap(_._2).groupBy(identity).view.mapValues(_.size).toMap
      val sets = raw.map { case (id, s) => id -> s.filter(dfc(_) <= cap) }
      (for {
        Seq((ia, sa), (ib, sb)) <- sets.sortBy(_._1).combinations(2).toSeq
        inter = (sa & sb).size
        if inter > 0
        j = BigDecimal(inter.toDouble / (sa.size + sb.size - inter))
          .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
        if j >= minJ
      } yield (ia, ib, j)).toSet
    }
    def run(variant: String, docs: Seq[(Long, String)], cap: Int, t: Double) = {
      val df = docs.toDF("doc_id", "text")
      val got = variant match {
        case "cooc"   => Dedup.jaccardJoin(df, "doc_id", col("text"), 3, cap, t)
        case "prefix" => Dedup.jaccardJoinPrefix(df, "doc_id", col("text"), 3, cap, t)
        case "string" => Dedup.jaccardJoinAllPairs(df, "doc_id", col("text"), 3, cap, t)
      }
      got.select($"id_a", $"id_b", $"jaccard").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    }

    // engineered corpora: k shared trigrams + m unique suffix tokens per
    // side gives J = k/(k+2m) EXACTLY — one pair sitting ON each
    // threshold (the tEff prefix margin's worst case, and (1-t)*sz an
    // exact integer), one pair just below, an exact dup, and a disjoint
    // pair, all on per-pair vocabularies so nothing interferes
    def pair(pid: Int, k: Int, m: Int): Seq[(Long, String)] = {
      val shared = (0 until k + 2).map(i => s"s${pid}_$i")
      val ua = (0 until m).map(i => s"a${pid}_$i")
      val ub = (0 until m).map(i => s"b${pid}_$i")
      Seq((pid * 2L, (shared ++ ua).mkString(" ")),
        (pid * 2L + 1, (shared ++ ub).mkString(" ")))
    }
    val boundary = Map(0.2 -> (2, 4), 0.5 -> (6, 3), 0.8 -> (8, 1), 0.95 -> (38, 1))
    for ((t, (k, m)) <- boundary) {
      val docs = pair(0, k, m) ++ pair(1, k - 1, m) ++
        Seq((100L, (0 until 10).map(i => s"d$i").mkString(" ")),
          (101L, (0 until 10).map(i => s"d$i").mkString(" ")),
          (102L, (0 until 10).map(i => s"u$i").mkString(" ")))
      val exp = oracle(docs, 1000, t)
      // construction sanity: pair 0 sits exactly on t, pair 1 below it
      assert(exp.contains((0L, 1L, t)), s"t=$t: expected boundary pair in $exp")
      assert(!exp.exists(p => p._1 == 2L), s"t=$t: below-boundary pair leaked")
      for (v <- Seq("cooc", "prefix", "string"))
        assert(run(v, docs, 1000, t) == exp, s"t=$t variant=$v")
    }

    // randomized fuzz: tiny vocabulary forces dense accidental overlap;
    // cap=4 makes the df filter BIND (stop-shingles drop out mid-pair)
    val gen = for {
      n    <- Gen.choose(8, 18)
      docs <- Gen.sequence[Seq[Seq[String]], Seq[String]]((1 to n).map(_ =>
        Gen.choose(3, 12).flatMap(len =>
          Gen.listOfN(len, Gen.choose(0, 9).map(i => s"w$i")))))
    } yield docs.zipWithIndex.map { case (ws, i) => (i.toLong, ws.mkString(" ")) }
    for (seed <- 1L to 3L; cap <- Seq(1000, 4); t <- Seq(0.2, 0.5, 0.8, 0.95)) {
      val docs = gen.pureApply(Gen.Parameters.default, Seed(seed))
      val exp = oracle(docs, cap, t)
      for (v <- Seq("cooc", "prefix"))
        assert(run(v, docs, cap, t) == exp, s"seed=$seed cap=$cap t=$t variant=$v")
    }
    spark.catalog.clearCache() // unmanaged-scope postings
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

  test("q130 leakage-safe split: whole clusters move together, every doc labeled") {
    val out = graft.queries.DedupOps.q130LeakageSafeSplit(
      spark, "/root/testdata/sf0.001").cache()
    try {
      val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
      assert(out.count() == docs.count(), "every document must be labeled")
      // THE invariant the operator exists for: a cluster never straddles
      // splits — zero clusters with more than one distinct label
      val straddling = out.groupBy($"cluster_id")
        .agg(countDistinct($"split").as("nsplits"))
        .filter($"nsplits" > 1).count()
      assert(straddling == 0, s"$straddling clusters straddle splits")
      // the label is the q34 split function applied to the cluster id —
      // singleton clusters therefore degrade to q34's per-key behavior
      val direct = out.select($"doc_id",
        graft.operators.DataSplit.splitColumn(
          $"cluster_id".cast("string"),
          Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)).as("expected"),
        $"split")
      assert(direct.filter($"split" =!= $"expected").count() == 0)
      val labels = out.select($"split").distinct()
        .collect().map(_.getString(0)).toSet
      assert(labels.subsetOf(Set("train", "val", "test")))
    } finally out.unpersist()
  }
}
