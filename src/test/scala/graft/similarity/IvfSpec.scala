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

  test("every corpus row lands in exactly one inverted list") {
    assert(indexed.filter(col("cid").isNull || col("cid") < 0 ||
      col("cid") >= model.k).count() == 0)
    assert(indexed.count() == emb.count())
  }
}
