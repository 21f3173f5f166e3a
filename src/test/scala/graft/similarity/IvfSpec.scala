package graft.similarity

import org.apache.spark.sql.functions._
import graft.olhovivo.SparkTestBase
import graft.Tables

/** IVF semantics: full probe ≡ exact brute force; pruned probe returns
  * well-formed, monotone results with nontrivial recall. */
class IvfSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"
  private lazy val emb = Tables.embeddings(spark, dir)
  private lazy val queries = emb.filter(col("vec_id") < 15)
  private lazy val model = Ivf.fit(emb, k = 8, iters = 3)
  private lazy val indexed = Ivf.index(emb, model).cache()

  private def asPairs(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap

  test("modelFromFx: the distributed Lloyd fit round-trips exactly into Ivf") {
    val fitted = Clustering.fitLloyd(emb, "vec_id", "embedding", k = 8, sweeps = 3)
    val ivfModel = Ivf.modelFromFx(fitted.centroids)
    // assignment under the converted double model must be bit-identical
    // to assignment under the fx model (the c/1e6 → floor(·1e6+0.5)
    // round-trip is exact for |c| ≤ 2^21) — the seam that lets the
    // distributed fit replace the sampled one with no search change
    val viaIvf = emb.select(col("vec_id"),
        Ivf.assignExpr(col("embedding"), ivfModel).cast("long").as("cid"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val viaFx = Clustering.assign(emb, "vec_id", "embedding", fitted.centroids)
      .select(col("vec_id"), col("cid"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaIvf == viaFx)
    // and the fitted model drives index/search end-to-end
    val idx = Ivf.index(emb, ivfModel)
    val out = Ivf.search(queries, idx, ivfModel, topK = 3, nProbe = 8)
    assert(out.count() > 0)
  }

  test("full probe (nProbe = k) is exactly brute force") {
    val ivf = asPairs(Ivf.search(queries, indexed, model, topK = 5, nProbe = model.k))
    val bf = asPairs(Similarity.bruteForceTopK(queries, emb, 5)
      .select(col("query_id"), col("rank").cast("long"), col("corpus_id")))
    assert(ivf == bf)
  }

  test("pruned probe: contiguous ranks, subset semantics, recall > chance floor") {
    val pruned = Ivf.search(queries, indexed, model, topK = 5, nProbe = 2)
    val byQuery = pruned.collect().groupBy(_.getLong(0))
    byQuery.foreach { case (_, rows) =>
      assert(rows.map(_.getLong(1)).sorted.sameElements(1L to rows.length))
    }
    val bf = asPairs(Similarity.bruteForceTopK(queries, emb, 5)
      .select(col("query_id"), col("rank").cast("long"), col("corpus_id")))
    val prunedSet = pruned.collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val bfSet = bf.keys.map { case (q, _) => q }.toSet // queries present
    val hits = bf.count { case ((q, _), cid) => prunedSet.contains((q, cid)) }
    val recall = hits.toDouble / bf.size
    assert(bfSet.nonEmpty && recall > 0.1,
      s"recall $recall implausibly low even for 2/8 probing")
  }

  test("sampled fit is deterministic and full probe stays exact") {
    val m1 = Ivf.fit(emb, k = 4, iters = 2, fitOneIn = 4)
    val m2 = Ivf.fit(emb, k = 4, iters = 2, fitOneIn = 4)
    assert(m1.centroids.map(_.toSeq).toSeq == m2.centroids.map(_.toSeq).toSeq)
    val ivf = asPairs(Ivf.search(queries, Ivf.index(emb, m1), m1,
      topK = 5, nProbe = m1.k))
    val bf = asPairs(Similarity.bruteForceTopK(queries, emb, 5)
      .select(col("query_id"), col("rank").cast("long"), col("corpus_id")))
    assert(ivf == bf)
  }

  test("save/load roundtrips the model and reproduces search exactly") {
    implicit val s: org.apache.spark.sql.SparkSession = spark
    val path = scratchDir("ivf-model").toString + "/model"
    Ivf.save(model, path)
    val loaded = Ivf.load(path)
    assert(loaded.centroids.map(_.toSeq).toSeq ==
      model.centroids.map(_.toSeq).toSeq)
    // a LATER job: index + search from the loaded model only
    val ivf = asPairs(Ivf.search(queries, Ivf.index(emb, loaded), loaded,
      topK = 5, nProbe = 2))
    val orig = asPairs(Ivf.search(queries, indexed, model, topK = 5, nProbe = 2))
    assert(ivf == orig)
  }

  test("native assignment and probe ranking are bit-equal to the composed literal forms") {
    val native = emb.select(col("vec_id"),
        Ivf.assignExpr(col("embedding"), model).as("cid"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val fold = emb.select(col("vec_id"),
        Ivf.assignExprFold(col("embedding"), model).as("cid"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(native == fold)
    val pNative = emb.select(col("vec_id"),
        Ivf.probeExpr(col("embedding"), model, 3).as("p"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val pFold = emb.select(col("vec_id"),
        Ivf.probeExprFold(col("embedding"), model, 3).as("p"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(pNative == pFold)
  }

  test("append-only maintenance: appended index ≡ indexed-from-scratch, drift fires on a shifted batch") {
    implicit val s: org.apache.spark.sql.SparkSession = spark
    // sf0.001 embeddings are vec_id 0..499 — split 400 base / 100 batch
    val base = emb.filter(col("vec_id") < 400)
    val batch = emb.filter(col("vec_id") >= 400)
    val m = Ivf.fit(base, k = 4, iters = 2)
    val idxPath = scratchDir("ivf-append").toString + "/index"
    Ivf.index(base, m).write.parquet(idxPath)
    val st0 = Ivf.writeIndexStats(idxPath)
    assert(st0.n == base.count() && st0.sumDist > 0)
    // in-distribution batch: appended, NOT drifted
    val rep = Ivf.append(batch, idxPath, m)
    assert(rep.appended == batch.count() && !rep.drifted,
      s"in-distribution batch flagged drifted: $rep")
    // the appended store is bit-identical in content to indexing the
    // full corpus from scratch with the same model — assignment is a
    // pure function of (vector, model), so even PRUNED-probe search
    // must agree exactly (stronger than a recall bound)
    val stored = spark.read.parquet(idxPath)
    val scratch = Ivf.index(emb, m)
    val a = asPairs(Ivf.search(queries, stored, m, topK = 5, nProbe = 2))
    val b = asPairs(Ivf.search(queries, scratch, m, topK = 5, nProbe = 2))
    assert(a == b)
    // stats sidecar rolled forward and invisible to index readers
    val st1 = Ivf.readIndexStats(idxPath)
    assert(st1.n == emb.count())
    assert(stored.count() == emb.count(), "sidecar leaked into the index scan")
    // a distribution-shifted batch must trip the refit signal
    val shifted = batch
      .withColumn("vec_id", col("vec_id") + lit(100000L))
      .withColumn("embedding",
        transform(col("embedding"), x => (x + lit(5.0f)).cast("float")))
    val rep2 = Ivf.append(shifted, idxPath, m)
    assert(rep2.drifted,
      s"shifted batch (mean ${rep2.batchMeanDist} vs ${rep2.indexMeanDist}) must signal refit")
  }

  test("append onto a pre-maintenance cid-only index: stats recomputed from the model, layout matched") {
    implicit val s: org.apache.spark.sql.SparkSession = spark
    val base = emb.filter(col("vec_id") < 400)
    val batch = emb.filter(col("vec_id") >= 400)
    val m = Ivf.fit(base, k = 4, iters = 1)
    val idxPath = scratchDir("ivf-legacy").toString + "/index"
    // an index written before adist existed: cid-only layout, no sidecar
    Ivf.index(base, m).drop("adist").write.parquet(idxPath)
    val rep = Ivf.append(batch, idxPath, m)
    assert(rep.appended == batch.count() && rep.indexMeanDist > 0,
      s"legacy backfill did not recompute distances: $rep")
    // appended rows matched the stored layout — no schema mixing
    val stored = spark.read.parquet(idxPath)
    assert(!stored.columns.contains("adist"),
      s"append mixed adist into a cid-only index: ${stored.columns.toSeq}")
    assert(stored.count() == emb.count())
    // without a model, a cid-only backfill must fail loudly
    val bare = scratchDir("ivf-legacy2").toString + "/index"
    Ivf.index(base, m).drop("adist").write.parquet(bare)
    val ex = intercept[IllegalStateException] { Ivf.writeIndexStats(bare) }
    assert(ex.getMessage.contains("adist"), ex.getMessage)
  }

  test("lifecycle: fit → append → drift=true → refit → pruned-probe recall recovers") {
    implicit val s: org.apache.spark.sql.SparkSession = spark
    // ---- day 0: fit + index + stats on the base corpus
    val base = emb.filter(col("vec_id") < 400)
    val m0 = Ivf.fit(base, k = 4, iters = 3)
    val idxPath = scratchDir("ivf-lifecycle").toString + "/index"
    Ivf.index(base, m0).write.parquet(idxPath)
    Ivf.writeIndexStats(idxPath)
    // ---- day 1: a drifted batch, ENGINEERED to be the worst case for
    // the stale quantizer: a tight blob centered at
    // `mid + s·u` where mid is the bisector midpoint of stale centroids
    // c0/c1 and u ⊥ (c1−c0) — equidistant from c0 and c1 (so members
    // split across BOTH lists) yet, thanks to the orthogonal push s,
    // FAR from every centroid (so drift must fire; the bare midpoint is
    // actually CLOSER to the centroids than a typical base point).
    // Each member is nudged ±0.2·|w| along w by vec_id parity — a
    // deterministic half/half split — plus 0.01× of its original
    // coordinates as jitter. The blob is internally near-parallel, so
    // by cosine its members are each other's true top-5; with
    // nProbe = 1 a + side query never sees its − side neighbors: the
    // stale-quantizer recall hole refit must close.
    val st0 = Ivf.readIndexStats(idxPath)
    val meanIdx = st0.meanDist / 1e12 // fixed point → double units
    def sq(a: Array[Double], b: Array[Double]) =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    // Try every centroid pair (i, j): push from the pair's bisector
    // midpoint along u = away-from-the-OTHER-centroids, orthogonalized
    // against w = cj − ci (orthogonality preserves the ci/cj tie; the
    // away component keeps the other centroids from becoming nearest as
    // s grows). Keep the first pair whose blob center has exactly
    // {ci, cj} as its nearest two.
    val pairs = for {
      i <- m0.centroids.indices; j <- m0.centroids.indices if i < j
    } yield (i, j)
    val (pi, pj, target, w) = pairs.iterator.map { case (i, j) =>
      val ci = m0.centroids(i); val cj = m0.centroids(j)
      val wij = cj.zip(ci).map { case (a, b) => a - b }
      val wN = math.sqrt(wij.map(x => x * x).sum)
      val mid = ci.zip(cj).map { case (a, b) => (a + b) / 2 }
      val others = m0.centroids.indices.filter(x => x != i && x != j)
      val u0 = mid.indices.map(d =>
        others.map(o => mid(d) - m0.centroids(o)(d)).sum).toArray
      val proj = u0.zip(wij).map { case (a, b) => a * b }.sum / (wN * wN)
      val ortho = u0.zip(wij).map { case (a, b) => a - proj * b }
      val oN = math.sqrt(ortho.map(x => x * x).sum)
      // distance² to ci/cj becomes |w|²/4 + s²: pick s for ≈ 4× the
      // index mean — far past the 1.5× drift trigger
      val s = math.sqrt(math.max(4 * meanIdx - wN * wN / 4, meanIdx))
      val t = mid.zip(ortho).map { case (m, o) => m + s * o / math.max(oN, 1e-12) }
      (i, j, t, wij)
    }.find { case (i, j, t, _) =>
      val d = m0.centroids.map(c => sq(t, c))
      d.zipWithIndex.sortBy(_._1).take(2).map(_._2).toSet == Set(i, j)
    }.getOrElse(fail("no centroid pair admits an equidistant far blob — data pathology"))
    info(s"blob straddles stale lists $pi/$pj")
    // Blob member = target + α·e (α = 0.05 of the original embedding as
    // jitter). Which SIDE of the ci/cj bisector a member falls on is
    // decided by the signed along-w component of its own jitter — one
    // direction out of `dim` — while its cosine top-5 follow overall
    // jitter similarity, which is nearly independent of that one
    // component: so each query's true neighbors land ~half in the list
    // it does NOT probe. The jitter's MEAN along w is cancelled out of
    // the target (otherwise a biased corpus mean would push the whole
    // blob onto one side and the split — the point of the test — would
    // silently vanish).
    val alpha = 0.05
    val batchBase = emb.filter(col("vec_id") >= 400)
    val batchVecs = batchBase.select(col("embedding")).collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toArray)
    val mu = batchVecs.transpose.map(xs => xs.sum / xs.length)
    val wNorm2 = w.map(x => x * x).sum
    val muAlongW = mu.zip(w).map { case (a, b) => a * b }.sum / wNorm2
    val center = target.zip(w).map { case (t, wi) => t - alpha * muAlongW * wi }
    val centerCol = array(center.map(v => lit(v.toFloat)): _*)
    val batch = batchBase
      .withColumn("vec_id", col("vec_id") + lit(100000L))
      .withColumn("embedding",
        zip_with(col("embedding"), centerCol,
          (x, c) => (x * lit(alpha.toFloat) + c).cast("float")))
    val rep = Ivf.append(batch, idxPath, m0)
    assert(rep.drifted,
      s"blob at the centroid bisector must trip drift: $rep")
    // ---- stale pruned-probe recall on blob queries, vs brute force
    // over the FULL stored corpus (the search contract after append)
    def recallAt5(indexed: org.apache.spark.sql.DataFrame, m: Ivf.Model): Double = {
      val corpus = indexed.select(col("vec_id"), col("embedding"))
      val bf = Similarity.bruteForceTopK(batch, corpus, 5)
        .select(col("query_id"), col("corpus_id")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val got = Ivf.search(batch, indexed, m, topK = 5, nProbe = 1)
        .select(col("query_id"), col("corpus_id")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      (bf & got).size.toDouble / bf.size
    }
    val stored = spark.read.parquet(idxPath)
    val staleRecall = recallAt5(stored, m0)
    // ---- the drift signal drives the loop: refit on the stored corpus,
    // re-index, re-baseline the stats — the caller's refit step verbatim
    val m1 = Ivf.fit(stored.select(col("vec_id"), col("embedding")), k = 4, iters = 3)
    val refitPath = scratchDir("ivf-lifecycle").toString + "/index_refit"
    Ivf.index(stored.select(col("vec_id"), col("embedding")), m1)
      .write.parquet(refitPath)
    val stRefit = Ivf.writeIndexStats(refitPath)
    assert(stRefit.n == stored.count())
    val refitRecall = recallAt5(spark.read.parquet(refitPath), m1)
    info(s"pruned-probe recall@5, nProbe=1: stale=$staleRecall refit=$refitRecall")
    // refit must materially recover what the stale split lost: the new
    // quantizer gives the blob its own list(s), so blob queries find
    // their blob neighbors again
    assert(staleRecall < 0.9,
      s"stale recall $staleRecall — the engineered split did not degrade recall; test is vacuous")
    assert(refitRecall > staleRecall + 0.1 && refitRecall > 0.9,
      s"refit did not recover recall: stale=$staleRecall refit=$refitRecall")
    // and a post-refit batch from the SAME (new) distribution no longer drifts
    val steady = batch.withColumn("vec_id", col("vec_id") + lit(1000000L))
    val rep2 = Ivf.append(steady, refitPath, m1)
    assert(!rep2.drifted,
      s"in-distribution batch after refit must not re-trip drift: $rep2")
  }

  test("every corpus row lands in exactly one inverted list") {
    assert(indexed.filter(col("cid").isNull || col("cid") < 0 ||
      col("cid") >= model.k).count() == 0)
    assert(indexed.count() == emb.count())
  }
}
