package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** IVF (inverted-file) approximate nearest neighbor: a coarse k-means
  * quantizer partitions the corpus into k inverted lists; a query probes
  * only the nProbe nearest lists and scores exactly inside them.
  *
  * Scale design: `fit` is a few Spark aggregation passes (collecting
  * only k×dim centroid doubles to the driver — the model, not data);
  * assignment and probe ranking both run through the native
  * nearest-centroid codegen expressions (the model ships as ONE
  * flattened long[] reference object, so the plan survives production
  * coarse-list counts k ≈ 10³–10⁴ where a k-wide literal tree would
  * fall back to interpreted); `search` shuffles only
  * (query × probed-list) pairs — corpus rows outside probed lists are
  * never scored. nProbe/k is the recall/cost dial; nProbe = k degrades
  * gracefully to exact search (proved in the oracle gate: full-probe
  * IVF ≡ brute force).
  *
  * Determinism: centroid init = the k lowest vec_ids; Lloyd iterations
  * are fixed-count; ties in assignment break to the first (lowest)
  * centroid index — same run-to-run and engine-to-engine.
  */
object Ivf {

  case class Model(centroids: Array[Array[Double]]) {
    def k: Int = centroids.length
  }

  /** Persist a fitted quantizer as a (cid, centroid) parquet table —
    * the operational seam a 100 TB corpus needs: fit once (a sampled
    * pass), then index and search in LATER jobs/sessions without
    * refitting. The model is k×dim doubles, so a single output file is
    * the right shape. */
  def save(model: Model, path: String)(implicit spark: org.apache.spark.sql.SparkSession): Unit = {
    import spark.implicits._
    model.centroids.zipWithIndex
      .map { case (c, i) => (i, c.toSeq) }.toSeq
      .toDF("cid", "centroid")
      .coalesce(1).write.mode("overwrite").parquet(path)
  }

  /** Load a quantizer saved by [[save]]; centroid order (and therefore
    * every assignment tiebreak) is restored exactly via cid. */
  def load(path: String)(implicit spark: org.apache.spark.sql.SparkSession): Model = {
    val rows = spark.read.parquet(path)
      .select(col("cid").cast("int"), col("centroid"))
      .orderBy(col("cid")).collect()
    require(rows.nonEmpty, s"no centroids at $path")
    require(rows.head.getInt(0) == 0 && rows.last.getInt(0) == rows.length - 1,
      s"centroid ids at $path are not dense 0..${rows.length - 1}")
    Model(rows.map(_.getSeq[Double](1).toArray))
  }

  /** Model from an integer-exact distributed fit
    * ([[Clustering.fitLloyd]]): fx centroids convert to doubles c/1e6,
    * which round-trip EXACTLY back through [[fxCentroids]] — |c| ≤ 2^21
    * means c/1e6 carries relative error < 2^-52, so
    * floor((c/1e6)·1e6 + 0.5) == c always — making assignment under the
    * converted model bit-identical to assignment under the fx model
    * (IvfSpec asserts the round-trip). This is the seam that lets the
    * 100 TB-scale fit replace [[fit]]'s sampled one with no change to
    * index/search/save/load. */
  def modelFromFx(fx: Array[Array[Long]]): Model =
    Model(fx.map(_.map(_ / 1e6)))

  /** The quantizer in the 1e-6 fixed-point convention the native
    * nearest-centroid expressions score in (Clustering.fixedPoint:
    * floor(x·1e6 + 0.5)). Quantizing the MODEL once driver-side keeps
    * the corpus pass pure integer arithmetic. */
  private def fxCentroids(model: Model): Array[Array[Long]] =
    model.centroids.map(_.map(x => math.floor(x * 1e6 + 0.5).toLong))

  /** Index (0-based) of the nearest centroid; ties → lowest index.
    *
    * Scored by the native `nearest_cid` codegen expression
    * (functions.NearestCentroid): the centroid model rides along as ONE
    * flattened long[] reference object, so the per-row corpus
    * assignment — IVF's only full-corpus pass — is a single compiled
    * k×dim integer loop regardless of k. The previous form scored an
    * array of k centroid literals; at production coarse-list counts
    * (k ≈ 10³–10⁴) that k-wide expression tree busts the JVM's 64 KB
    * method limit and whole-stage codegen falls back to interpreted —
    * the exact failure mode the native expression exists to remove
    * (see its Scaladoc's 141 s-vs-seconds measurement). Distances are
    * 1e-6 fixed point (integer — bit-reproducible under any
    * partitioning); [[assignExprFold]] is the registration-free composed
    * twin, bit-equal by IvfSpec. */
  def assignExpr(vec: Column, model: Model): Column =
    Clustering.nearestCid(vec, fxCentroids(model)).cast("int")

  /** Composed-literal twin of [[assignExpr]] (k interpreted HOF folds —
    * the pre-native form, kept as the bit-equality witness and for
    * sessions without GraftExtensions). */
  def assignExprFold(vec: Column, model: Model): Column = {
    val fx = Clustering.fixedPoint(vec)
    val dists = array(fxCentroids(model).map { c =>
      aggregate(
        zip_with(fx, lit(c), (a, b) => (a - b) * (a - b)),
        lit(0L), (acc, v) => acc + v)
    }: _*)
    (array_position(dists, array_min(dists)) - 1).cast("int")
  }

  /** The nProbe nearest centroid ids for one (query) vector, in
    * (dist asc, cid asc) order — native top-n codegen
    * (functions.NearestCentroids), so the probe ranking survives
    * production centroid counts exactly like the assignment. */
  def probeExpr(vec: Column, model: Model, nProbe: Int): Column =
    Clustering.nearestCids(vec, fxCentroids(model), nProbe)

  /** Composed-literal twin of [[probeExpr]] (bit-equality witness). */
  def probeExprFold(vec: Column, model: Model, nProbe: Int): Column = {
    val fx = Clustering.fixedPoint(vec)
    val dists = array(fxCentroids(model).map { c =>
      aggregate(
        zip_with(fx, lit(c), (a, b) => (a - b) * (a - b)),
        lit(0L), (acc, v) => acc + v)
    }: _*)
    slice(
      transform(
        array_sort(
          zip_with(dists, sequence(lit(0L), lit((model.k - 1).toLong)),
            (d, i) => struct(d.as("d"), i.as("i")))),
        s => s.getField("i")),
      1, nProbe)
  }

  /** Deterministic Lloyd k-means. Empty clusters keep their previous
    * centroid (stable under any data).
    *
    * `fitOneIn` > 1 fits the quantizer on a deterministic 1-in-n slice
    * of the corpus (vec_id mod n == 0) — the standard production
    * posture: a coarse quantizer needs a representative sample, not all
    * 100 TB, and the search stays exact within probed lists regardless
    * of where the centroids landed (nProbe is the recall dial).
    *
    * The projected corpus is spread (single-split scans would run the
    * interpreted assignment single-threaded) and persisted for the
    * duration of the fit — it is consumed `iters + 1` times, and Lloyd
    * iterations over a re-read corpus are the classic iterative-ML
    * anti-pattern Spark caching exists for. */
  /** Corpus-adaptive centroid count for [[fit]]. With k FIXED, inverted-
    * list length grows linearly with the corpus, so a pruned probe
    * (nProbe < k) degrades toward a linear scan — the index-shaped twin
    * of SemDeDup's fixed-cluster-count bug the 100× scale run measured
    * (342 s → 6.4 s once adaptive). k = ⌈√(n/64)⌉ keeps the centroid
    * count AND the expected list length both Θ(√n) (a probe touches
    * nProbe lists of ~8√n vectors each), floored at `kMin` (the legacy 8
    * — gate corpora ≤ 4096 vectors are unaffected, so full-probe results
    * and their static oracles are byte-identical there) and capped at
    * `kMax` so the driver-held quantizer stays model-sized (4096 × dim
    * doubles ≈ 2 MB at dim 64). */
  def kFor(nVectors: Long, kMin: Int = 8, kMax: Int = 4096): Int =
    math.max(kMin, math.min(kMax,
      math.ceil(math.sqrt(math.max(nVectors, 1L).toDouble / 64.0)).toInt))

  def fit(corpus: DataFrame, k: Int, iters: Int = 5, fitOneIn: Int = 1): Model = {
    val projected = corpus.select(col("vec_id"), col("embedding"))
    val sampled = if (fitOneIn <= 1) projected
      else projected.filter(pmod(col("vec_id"), lit(fitOneIn)) === 0)
    val base = graft.Tables.spread(corpus.sparkSession, sampled)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    var model = Model(
      base.orderBy(col("vec_id")).limit(k).collect()
        .map(_.getSeq[Float](1).map(_.toDouble).toArray))
    for (_ <- 1 to iters) {
      val assigned = base.withColumn("cid", assignExpr(col("embedding"), model))
      val sums = assigned
        .select(col("cid"), posexplode_outer(col("embedding")).as(Seq("dim", "x")))
        .groupBy(col("cid"), col("dim"))
        .agg(avg(col("x").cast("double")).as("m"))
        .collect()
      val next = model.centroids.map(_.clone())
      sums.foreach(r => next(r.getInt(0))(r.getInt(1)) = r.getDouble(2))
      model = Model(next)
    }
    base.unpersist(blocking = false)
    model
  }

  /** Corpus with inverted-list assignment (persist/write this once;
    * queries only touch probed lists). Also carries `adist` — the
    * integer fixed-point assignment distance — which costs nothing
    * extra (the native expression computes the struct anyway) and is
    * what the incremental-maintenance drift statistic reads. */
  def index(corpus: DataFrame, model: Model): DataFrame =
    corpus
      .withColumn("__nc",
        Clustering.nearestStruct(col("embedding"), fxCentroids(model)))
      .withColumn("cid", col("__nc").getField("cid").cast("int"))
      .withColumn("adist", col("__nc").getField("dist"))
      .drop("__nc")

  // ---------------------------------------------- incremental maintenance

  /** Corpus-level assignment-quality stats for a stored index: row
    * count and the sum of fixed-point assignment distances (summed as
    * double — a 2^56-bounded long distance over a 100 TB corpus would
    * overflow a long sum; the drift statistic is a heuristic ratio, not
    * an exact gate, so double is the right width). */
  case class IndexStats(n: Long, sumDist: Double) {
    def meanDist: Double = if (n == 0) 0.0 else sumDist / n
  }

  /** What [[append]] did: batch size, the batch's mean assignment
    * distance vs the index's, and the two refit cues — `drifted` (the
    * batch's distribution moved away from the fitted centroids) and
    * `outgrown` (the corpus has grown past the [[kFor]] sizing rule for
    * the stored quantizer: appends reuse the fit-time k, so pure growth
    * — no drift at all — still lets list lengths outgrow the Θ(√n)
    * contract and pruned-probe cost creep back toward linear).
    * `recommendedK` is [[kFor]] of the post-append corpus, the k a
    * refit should use. */
  case class AppendReport(appended: Long, batchMeanDist: Double,
                          indexMeanDist: Double, drifted: Boolean,
                          outgrown: Boolean, recommendedK: Int)

  /** Underscore-prefixed sidecar dir: invisible to parquet scans of the
    * index (Spark's listing skips `_*`, the _spark_metadata convention),
    * so readers of the index never see it. */
  private def statsPath(indexPath: String) = s"$indexPath/_graft_stats"

  /** (Re)compute and persist the stats sidecar from the stored index —
    * one aggregation pass; call once after the initial bulk index
    * write. An index written before `adist` existed (cid-only) is
    * still supported WHEN the quantizer is supplied: the distance is
    * recomputed on the fly for the aggregate (same native expression,
    * nothing rewritten on disk). Without a model, a cid-only index
    * fails loudly instead of silently recording zero distances. */
  def writeIndexStats(indexPath: String, model: Option[Model] = None)(
      implicit spark: org.apache.spark.sql.SparkSession): IndexStats = {
    import spark.implicits._
    val stored = spark.read.parquet(indexPath)
    val withDist =
      if (stored.columns.contains("adist")) stored
      else model match {
        case Some(m) => stored.withColumn("adist",
          Clustering.nearestStruct(col("embedding"), fxCentroids(m))
            .getField("dist"))
        case None => throw new IllegalStateException(
          s"index at $indexPath has no adist column (pre-maintenance layout); " +
            "pass the quantizer model so stats can be recomputed")
      }
    val r = withDist.agg(count(lit(1)), sum(col("adist").cast("double"))).head()
    val st = IndexStats(r.getLong(0),
      if (r.isNullAt(1)) 0.0 else r.getDouble(1))
    Seq((st.n, st.sumDist)).toDF("n", "sum_dist")
      .coalesce(1).write.mode("overwrite").parquet(statsPath(indexPath))
    st
  }

  /** Stored stats, backfilled from the index itself when the sidecar
    * does not exist yet (pre-maintenance indexes — including cid-only
    * layouts when `model` is supplied). */
  def readIndexStats(indexPath: String, model: Option[Model] = None)(
      implicit spark: org.apache.spark.sql.SparkSession): IndexStats =
    try {
      val r = spark.read.parquet(statsPath(indexPath)).head()
      IndexStats(r.getLong(0), r.getDouble(1))
    } catch { case _: org.apache.spark.sql.AnalysisException =>
      writeIndexStats(indexPath, model)
    }

  /** Append-only maintenance of a persisted index: assign `newVectors`
    * with the SAME stored quantizer (no refit — the 100 TB posture is a
    * growing corpus indexed incrementally), append them to the index
    * parquet, roll the stats sidecar forward, and report drift.
    *
    * Drift: the appended batch's mean assignment distance vs the
    * index's historical mean. Centroids fitted on yesterday's
    * distribution assign drifted data to farther lists — recall decays
    * silently under pruned probing — so a batch mean above
    * `driftFactor ×` the historical mean signals `drifted = true`: the
    * caller's cue to refit and re-index. The append still happens
    * (exactness of full-probe search never depends on where centroids
    * sit; drift only degrades the pruned-probe recall/cost trade). */
  def append(newVectors: DataFrame, indexPath: String, model: Model,
             driftFactor: Double = 1.5, growthFactor: Double = 2.0)(
      implicit spark: org.apache.spark.sql.SparkSession): AppendReport = {
    import spark.implicits._
    val prior = readIndexStats(indexPath, Some(model)) // before the
    // append — a backfill after the write would double-count the batch
    val batch = index(newVectors, model)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val r = batch.agg(count(lit(1)), sum(col("adist").cast("double"))).head()
    val nb = r.getLong(0)
    val sb = if (r.isNullAt(1)) 0.0 else r.getDouble(1)
    // match the stored layout: appending adist rows into a cid-only
    // index would mix file schemas in one directory (and a default,
    // non-mergeSchema read could then drop or mis-resolve the column)
    val toWrite =
      if (spark.read.parquet(indexPath).columns.contains("adist")) batch
      else batch.drop("adist")
    toWrite.write.mode("append").parquet(indexPath)
    batch.unpersist(blocking = false)
    // Roll the sidecar forward. The index append above and this tiny
    // overwrite are two non-atomic writes; if the sidecar write dies
    // AFTER the batch landed, the rolled stats would silently
    // undercount that batch forever — so on failure fall back to a full
    // recompute from the stored index itself (one aggregation pass —
    // self-healing, never silently stale). Concurrency: `append` is
    // read-modify-write on the sidecar and assumes a SINGLE writer (the
    // normal posture for an index-maintenance job); concurrent appends
    // must be serialized by the caller.
    try
      Seq((prior.n + nb, prior.sumDist + sb)).toDF("n", "sum_dist")
        .coalesce(1).write.mode("overwrite").parquet(statsPath(indexPath))
    catch { case scala.util.control.NonFatal(_) =>
      writeIndexStats(indexPath, Some(model))
    }
    val meanB = if (nb == 0) 0.0 else sb / nb
    // growth cue: kFor is Θ(√n), so recommendedK > growthFactor·k means
    // the corpus grew ~growthFactor² since fit — refits are expensive,
    // and the factor keeps the cue from firing on every append
    val recK = kFor(prior.n + nb)
    AppendReport(nb, meanB, prior.meanDist,
      drifted = prior.n > 0 && nb > 0 && meanB > driftFactor * prior.meanDist,
      outgrown = recK > growthFactor * model.k, recommendedK = recK)
  }

  /** Top-k cosine search probing the nProbe nearest lists per query. */
  def search(queries: DataFrame, indexed: DataFrame, model: Model,
             topK: Int, nProbe: Int): DataFrame =
    // project queries down first: plain search must not drag unrelated
    // query columns through the probed join's shuffle
    searchWhere(queries.select(col("vec_id"), col("embedding")),
      indexed, model, topK, nProbe, lit(true))

  /** [[search]] generalized with a per-pair predicate and carried corpus
    * columns — the composition hard-negative mining needs: `pairFilter`
    * is applied to the (query × probed-candidate) pairs BELOW the
    * ranking window (so ranks are assigned over the already-filtered
    * candidate set — a negative's rank counts only negatives), and may
    * reference any extra column of `queries` (kept under its own name,
    * e.g. a query label) and any `carry` column of `indexed` (which
    * also rides through to the output, e.g. the negative's label).
    *
    * Scale shape is unchanged from [[search]]: the predicate is one
    * more conjunct on the probed join — corpus rows outside probed
    * lists are never scored, and Catalyst pushes the filter below the
    * window exactly as in the brute-force form (q127). With
    * nProbe = k this is EXACT hard-negative mining (probe covers every
    * list), which is what the q128 oracle gate pins bit-for-bit. */
  def searchWhere(queries: DataFrame, indexed: DataFrame, model: Model,
                  topK: Int, nProbe: Int, pairFilter: Column,
                  carry: Seq[String] = Nil): DataFrame = {
    val qExtra = queries.columns.toSeq
      .filterNot(Set("vec_id", "embedding")).map(col)
    val q = queries.select(
      (Seq(col("vec_id").as("query_id"), col("embedding").as("qvec")) ++ qExtra): _*)
    // nProbe nearest centroids per query, as an exploded (query, cid)
    // set (generator first, cast in a separate select — generators
    // cannot nest inside expressions)
    val probed = q
      .withColumn("__cid", explode(probeExpr(col("qvec"), model, nProbe)))
      .withColumn("cid", col("__cid").cast("int")).drop("__cid")
    val c = indexed.select(
      (Seq(col("vec_id").as("corpus_id"), col("embedding").as("cvec"),
        col("cid")) ++ carry.map(col)): _*)
    val scored = probed.join(c, Seq("cid"))
      .filter(col("query_id") =!= col("corpus_id") && pairFilter)
      .withColumn("rcos", graft.functions.Fx.fx(Similarity.cosine(col("qvec"), col("cvec")), 4))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("rcos").desc, col("corpus_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= topK)
      .select((Seq(col("query_id"), col("rank").cast("long").as("rank"),
        col("corpus_id")) ++ carry.map(col) :+ col("rcos")): _*)
  }
}
