package graft.queries

import graft.functions.Fx
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.similarity.Similarity

/** Similarity-search operator coverage over `embeddings`
  * (array<float>, dim 64): brute-force cosine top-k (exact baseline)
  * and sign-LSH bucketed near-dup pairs (the scale path). The oracle
  * embeds the identical hyperplane literals the library generates.
  */
object VectorOps {

  type Q = (SparkSession, String) => DataFrame

  private val Dim = 64
  private val Planes = 8
  private val TopK = 5
  private val NQueries = 20
  private val MinCos = 0.3

  /** dot(a,b) as a sequential double fold — SQL mirror of
    * Similarity.dot (and of the dot_product codegen expression, which
    * accumulates in the same 0→n−1 order). Shared with SqlText's q102
    * oracle. */
  private[queries] def dotSql(a: String, b: String): String =
    s"coalesce(list_sum(list_transform(range(1, len($a) + 1), " +
      s"d -> $a[d]::DOUBLE * $b[d]::DOUBLE)), 0.0::DOUBLE)::DOUBLE"

  private def cosineSql(a: String, b: String): String = {
    val d = s"(sqrt(${dotSql(a, a)}) * sqrt(${dotSql(b, b)}))"
    s"(CASE WHEN $d = 0 THEN 0.0::DOUBLE ELSE ${dotSql(a, b)} / $d END)"
  }

  def q50AnnTopK(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(s, dir)
    // spread the corpus side: the O(|Q|·|C|) cosine scoring runs on the
    // corpus partitioning (queries are broadcast), and the testdata scan
    // is a single split.
    Similarity.bruteForceTopK(
      emb.filter(col("vec_id") < NQueries), Tables.spread(s, emb), TopK)
      .select(col("query_id"), col("rank").cast("long").as("rank"),
        col("corpus_id"), col("rcos"))
  }

  val q50Sql: String =
    s"""WITH q AS (SELECT vec_id AS query_id, embedding AS qvec
       |           FROM embeddings WHERE vec_id < $NQueries),
       |c AS (SELECT vec_id AS corpus_id, embedding AS cvec FROM embeddings),
       |scored AS (
       |  SELECT query_id, corpus_id,
       |    ${Fx.fxSql(cosineSql("qvec", "cvec"), 4)} AS rcos
       |  FROM c CROSS JOIN q WHERE query_id <> corpus_id),
       |ranked AS (
       |  SELECT *, row_number() OVER (PARTITION BY query_id
       |            ORDER BY rcos DESC, corpus_id ASC) AS rank
       |  FROM scored)
       |SELECT query_id, rank, corpus_id, rcos FROM ranked WHERE rank <= $TopK""".stripMargin

  /** Quantized (int8) top-k — q50's memory-scale path. Exact oracle:
    * floor-based codes are bit-reproducible (see similarity.Quantize),
    * dots are integer arithmetic, and the dequantized ranking divides
    * identical doubles on both engines. */
  def q53QuantizedTopK(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(s, dir)
    graft.similarity.Quantize.quantizedTopK(
      emb.filter(col("vec_id") < NQueries), Tables.spread(s, emb), TopK)
  }

  val q53Sql: String =
    s"""WITH mx AS (
       |  SELECT vec_id, embedding,
       |    list_max(list_transform(embedding, x -> abs(x::DOUBLE))) AS m
       |  FROM embeddings),
       |qv AS (
       |  SELECT vec_id,
       |    CASE WHEN m = 0 THEN 1.0::DOUBLE ELSE 127.0::DOUBLE / m END AS s,
       |    list_transform(embedding,
       |      x -> CAST(floor(x::DOUBLE * (CASE WHEN m = 0 THEN 1.0::DOUBLE
       |                  ELSE 127.0::DOUBLE / m END) + 0.5::DOUBLE) AS BIGINT)) AS qv
       |  FROM mx),
       |q AS (SELECT vec_id AS query_id, s AS sq, qv AS qq FROM qv
       |      WHERE vec_id < $NQueries),
       |c AS (SELECT vec_id AS corpus_id, s AS sc, qv AS qc FROM qv),
       |scored AS (
       |  SELECT query_id, corpus_id,
       |    CAST(coalesce(list_sum(list_transform(range(1, len(qq) + 1),
       |      d -> qq[d] * qc[d])), 0) AS BIGINT) AS qdot,
       |    sq, sc
       |  FROM c CROSS JOIN q WHERE query_id <> corpus_id),
       |ranked AS (
       |  SELECT query_id, corpus_id, qdot,
       |    qdot::DOUBLE / (sq * sc) AS adot_raw,
       |    row_number() OVER (PARTITION BY query_id
       |      ORDER BY qdot::DOUBLE / (sq * sc) DESC, corpus_id ASC) AS rank
       |  FROM scored)
       |SELECT query_id, rank, corpus_id, qdot, ${Fx.fxSql("adot_raw", 4)} + 0.0 AS adot
       |FROM ranked WHERE rank <= $TopK""".stripMargin

  /** Plane count is corpus-adaptive (Similarity.planesFor — fixed
    * planes give quadratically-growing candidate pairs, the sign-LSH
    * twin of the SimHash-width scale bug): gate corpora (≤ 8192
    * vectors) stay at the legacy 8-plane layout the static oracle
    * mirrors; larger corpora widen per log₂(n). */
  def q51LshNearDup(s: SparkSession, dir: String): DataFrame = {
    val scope = graft.CacheScope.scoped()
    scope.materializeAndRelease(
      Similarity.lshNearDupPairs(Tables.spread(s, Tables.embeddings(s, dir)),
        Similarity.planesFor(nEmb(s, dir)), Dim, MinCos, scope = scope))
  }

  val q51Sql: String = q51SqlFor(Planes)

  /** q51's oracle for an arbitrary plane count — the adaptive-width
    * twin used by the above-floor hash gate (graft.AdaptiveGate). */
  def q51SqlFor(nPlanes: Int): String = {
    val planes = Similarity.hyperplanes(nPlanes, Dim)
    val sigExpr = planes.zipWithIndex.map { case (plane, j) =>
      val lit = plane.mkString("[", ", ", "]")
      s"(CASE WHEN ${dotSql("embedding", s"($lit)")} > 0.0 THEN ${1L << j}::BIGINT ELSE 0::BIGINT END)"
    }.mkString(" + ")
    s"""WITH sig_t AS (
       |  SELECT vec_id, embedding, $sigExpr AS bucket FROM embeddings)
       |SELECT a.vec_id AS id_a, b.vec_id AS id_b, a.bucket AS bucket,
       |  ${Fx.fxSql(cosineSql("a.embedding", "b.embedding"), 4)} AS rcos
       |FROM sig_t a JOIN sig_t b USING (bucket)
       |WHERE a.vec_id < b.vec_id
       |  AND ${Fx.fxSql(cosineSql("a.embedding", "b.embedding"), 4)} >= $MinCos""".stripMargin
  }

  /** IVF ANN with FULL probe (nProbe = k): the inverted-list machinery
    * (k-means fit → assignment → probe → in-list exact scoring) end to
    * end, degraded gracefully to exact search — which is precisely what
    * makes it oracle-checkable. IvfSpec covers the pruned-probe recall
    * behavior that has no SQL analog.
    *
    * The index ARTIFACT (quantizer model + assigned corpus) is built
    * once per source dir through the Ivf.save/load persistence seam and
    * re-read by every subsequent query — a 100 TB deployment fits and
    * assigns once at ingest, then serves millions of searches off the
    * stored index; repeat calls (bench attempts, concurrent consumers)
    * measuring the SEARCH is the deployed economics, same reasoning as
    * q103's bucketed layout. Deterministic fit → identical results
    * whether the artifact is fresh or reloaded (IvfSpec roundtrip).
    * NOTE the build is EAGER at DataFrame construction (the search plan
    * reads the stored index), so the first call per dir pays fit+index
    * even for a schema/plan-only caller — flagged via
    * SparkEntry.artifactEntries for timing harnesses. */
  def q52IvfTopK(s: SparkSession, dir: String): DataFrame = {
    val (model, indexPath) = ivfArtifact.computeIfAbsent(dir, { _ =>
      // quantizer fit on a deterministic 1-in-4 slice — the 100 TB
      // posture; full probe keeps the result exact regardless of fit.
      // Centroid count is corpus-adaptive (Ivf.kFor): gate dirs stay
      // at the legacy k=8, larger corpora keep lists at Θ(√n)
      val emb = Tables.embeddings(s, dir)
      val m = graft.similarity.Ivf.fit(emb,
        k = graft.similarity.Ivf.kFor(nEmb(s, dir)), iters = 3, fitOneIn = 4)
      val base = graft.TempArtifacts.dir("graft_ivf")
      graft.similarity.Ivf.save(m, s"$base/model")(s)
      graft.similarity.Ivf.index(Tables.spread(s, emb), m)
        .write.parquet(s"$base/index")
      (graft.similarity.Ivf.load(s"$base/model")(s), s"$base/index")
    })
    graft.similarity.Ivf.search(
      Tables.embeddings(s, dir).filter(col("vec_id") >= 20 && col("vec_id") < 40),
      s.read.parquet(indexPath), model,
      topK = TopK, nProbe = model.k) // full probe = exact at any k
  }

  /** dir → (reloaded quantizer, stored index path); concurrent-safe
    * build-once (ConcurrentHashMap runs the builder atomically). */
  private val ivfArtifact =
    new java.util.concurrent.ConcurrentHashMap[String, (graft.similarity.Ivf.Model, String)]()

  val q52Sql: String =
    s"""WITH q AS (SELECT vec_id AS query_id, embedding AS qvec
       |           FROM embeddings WHERE vec_id >= 20 AND vec_id < 40),
       |c AS (SELECT vec_id AS corpus_id, embedding AS cvec FROM embeddings),
       |scored AS (
       |  SELECT query_id, corpus_id,
       |    ${Fx.fxSql(cosineSql("qvec", "cvec"), 4)} AS rcos
       |  FROM c CROSS JOIN q WHERE query_id <> corpus_id),
       |ranked AS (
       |  SELECT *, row_number() OVER (PARTITION BY query_id
       |            ORDER BY rcos DESC, corpus_id ASC) AS rank
       |  FROM scored)
       |SELECT query_id, rank, corpus_id, rcos FROM ranked WHERE rank <= $TopK""".stripMargin

  /** Per-group mean-pooled centroid (vec_id mod 10 as the group key):
    * exact fixed-point accumulation makes the parallel mean
    * order-independent, so the oracle compare is exact. Emitted as
    * scalar (g, dim, m) rows — the driver's oracle harness hashes
    * pandas cells, and array cells are unhashable; the array-assembled
    * shape stays available as Pooling.meanCentroid (PoolingSpec). */
  def q55GroupCentroid(s: SparkSession, dir: String): DataFrame =
    graft.similarity.Pooling.meanCentroidByDim(
      Tables.spread(s, Tables.embeddings(s, dir)),
      pmod(col("vec_id"), lit(10)), col("embedding"))

  val q55Sql: String =
    s"""WITH e AS (
      |  SELECT vec_id % 10 AS g,
      |    unnest(list_transform(range(1, len(embedding) + 1),
      |      d -> {'dim': d - 1,
      |            'fx': CAST(floor(embedding[d]::DOUBLE * 1000000.0
      |                             + 0.5::DOUBLE) AS BIGINT)})) AS u
      |  FROM embeddings)
      |SELECT g, u.dim AS dim,
      |  ${Fx.fxSql("CAST(sum(u.fx) AS DOUBLE) / (count(*) * 1000000.0)", 4)}
      |    + 0.0::DOUBLE AS m
      |FROM e
      |WHERE u.fx IS NOT NULL
      |GROUP BY 1, 2""".stripMargin

  /** L2 normalization — the standard pre-ANN transform (cosine over
    * unit vectors = dot product). Map-only; norm staged once per row.
    * Emitted element-wise as (vec_id, dim, u, norm) scalar rows for the
    * same unhashable-array reason as q55; the array shape stays
    * available as Similarity.withL2Normalized (SimilaritySpec). */
  def q56L2Normalize(s: SparkSession, dir: String): DataFrame =
    Similarity.withL2Normalized(
        Tables.spread(s, Tables.embeddings(s, dir)), col("embedding"),
        "__n", "unit")
      .select(col("vec_id"), Fx.fx(col("__n"), 6).as("norm"),
        // posexplode_outer, not posexplode: `unit` is computed, and
        // InferFiltersFromGenerate would re-inline the whole transform
        // into an interpreted Filter (the q41 trap)
        posexplode_outer(col("unit")).as(Seq("dim", "u")))
      .filter(col("u").isNotNull)
      .select(col("vec_id"), col("dim").cast("long").as("dim"),
        col("u"), col("norm"))

  val q56Sql: String = {
    val dotSelf = dotSql("embedding", "embedding")
    s"""WITH n AS (
       |  SELECT vec_id, ${Fx.fxSql(s"sqrt($dotSelf)", 6)} AS norm,
       |    unnest(list_transform(range(1, len(embedding) + 1),
       |      d -> {'dim': d - 1,
       |            'val': CASE WHEN sqrt($dotSelf) = 0 THEN 0.0::DOUBLE
       |                   ELSE ${Fx.fxSql(s"embedding[d]::DOUBLE / sqrt($dotSelf)", 6)} + 0.0::DOUBLE
       |                   END})) AS u
       |  FROM embeddings)
       |SELECT vec_id, u.dim AS dim, u.val AS u, norm FROM n
       |WHERE u.val IS NOT NULL""".stripMargin
  }

  /** Nearest-centroid assignment (similarity.Clustering): k = 8 seed
    * centroids (the lowest vec_ids), every vector assigned by EXACT
    * integer fixed-point distance — cluster membership is engine-exact,
    * so the full assignment table (id, cid, dist) oracle-checks. */
  def q86KmeansAssign(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(s, dir)
    val cents = graft.similarity.Clustering.seedCentroids(emb, "vec_id", "embedding", 8)
    graft.similarity.Clustering.assign(
      Tables.spread(s, emb), "vec_id", "embedding", cents)
  }

  val q86Sql: String =
    """WITH f AS (
      |  SELECT vec_id, list_transform(embedding,
      |    x -> CAST(floor(CAST(x AS DOUBLE) * 1000000 + 0.5) AS BIGINT)) AS fx
      |  FROM embeddings),
      |c AS (SELECT vec_id, fx AS cfx FROM f ORDER BY vec_id LIMIT 8),
      |cc AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cid, cfx FROM c),
      |d AS (
      |  SELECT f.vec_id, cc.cid,
      |    CAST(list_sum(list_transform(range(1, len(f.fx) + 1),
      |      i -> (f.fx[i] - cc.cfx[i]) * (f.fx[i] - cc.cfx[i]))) AS BIGINT) AS dist
      |  FROM f CROSS JOIN cc)
      |SELECT vec_id, cid, dist FROM d
      |QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) = 1""".stripMargin

  // ---------------------------------------- q129 distributed Lloyd fit

  private val FitK = 8
  private val FitSweeps = 3

  /** q129: the FULL distributed Lloyd k-means fit
    * ([[graft.similarity.Clustering.fitLloyd]]) as an oracle-gated
    * fact: k = 8 seeds (lowest vec_ids), 3 sweeps of native-codegen
    * E-step + grouped-aggregation M-step, integer-exact throughout —
    * the fitted model (cid, dim, centroid component, final cluster
    * size) hash-matches a DuckDB oracle replaying the identical
    * initialization and sweep count CTE-by-CTE. This closes the
    * sampled-fit gap: at 100 TB the driver can't hold the data the fit
    * sees, so the fit itself must be a distributed aggregation — and
    * here it is, with the model (k·dim rows) the only thing collected. */
  def q129KmeansFit(s: SparkSession, dir: String): DataFrame = {
    // corpus-adaptive k, same growth law and floor as SemDeDup's
    // (gate corpora ≤ 2048 vectors stay at the static oracle's k = 8;
    // AdaptiveGate hash-checks an above-floor width)
    val k = graft.similarity.Clustering.adaptiveK(nEmb(s, dir), kMin = FitK)
    val m = graft.similarity.Clustering.fitLloyd(
      Tables.embeddings(s, dir), "vec_id", "embedding", k, FitSweeps)
    import s.implicits._
    m.centroids.zipWithIndex.flatMap { case (c, cid) =>
      c.zipWithIndex.map { case (v, dim) =>
        (cid.toLong, dim.toLong, v, m.sizes(cid)) }
    }.toSeq.toDF("cid", "dim", "c", "n_members")
  }

  val q129Sql: String = q129SqlFor(FitK, FitSweeps)

  /** q129's oracle for arbitrary (k, sweeps): the Lloyd loop unrolled
    * as one CTE chain per sweep — assignment d/a (q86's exact-distance
    * pattern), per-(cid, dim) integer sums m, round-half-away integer
    * mean g (`sign(s)·((|s|·2+n) // (2n))` — positive operands, so
    * DuckDB's flooring `//` equals Scala's truncating `/`), and model
    * update c (empty clusters keep the previous centroid via LEFT
    * JOIN + coalesce, size 0). */
  def q129SqlFor(k: Int, sweeps: Int): String = {
    val dims = s"(SELECT unnest(range(1, ${Dim + 1})) AS j)"
    val sweepCtes = (1 to sweeps).map { i =>
      s"""d$i AS (
         |  SELECT f.vec_id, c.cid,
         |    CAST(list_sum(list_transform(range(1, len(f.fx) + 1),
         |      j -> (f.fx[j] - c.cfx[j]) * (f.fx[j] - c.cfx[j]))) AS BIGINT) AS dist
         |  FROM f CROSS JOIN c${i - 1} c),
         |a$i AS (SELECT vec_id, cid FROM d$i
         |        QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) = 1),
         |m$i AS (
         |  SELECT a.cid, j.j AS dim, CAST(sum(f.fx[j.j]) AS BIGINT) AS s, count(*) AS n
         |  FROM a$i a JOIN f USING (vec_id) CROSS JOIN $dims j
         |  GROUP BY a.cid, j.j),
         |g$i AS (
         |  SELECT cid,
         |    list(CASE WHEN s < 0 THEN -(((-s) * 2 + n) // (2 * n))
         |              ELSE (s * 2 + n) // (2 * n) END ORDER BY dim) AS cfx,
         |    max(n) AS n
         |  FROM m$i GROUP BY cid),
         |c$i AS (
         |  SELECT p.cid, coalesce(g.cfx, p.cfx) AS cfx,
         |    CAST(coalesce(g.n, 0) AS BIGINT) AS n
         |  FROM c${i - 1} p LEFT JOIN g$i g USING (cid))""".stripMargin
    }.mkString(",\n")
    s"""WITH f AS (
       |  SELECT vec_id, list_transform(embedding,
       |    x -> CAST(floor(CAST(x AS DOUBLE) * 1000000 + 0.5) AS BIGINT)) AS fx
       |  FROM embeddings WHERE embedding IS NOT NULL),
       |seed AS (SELECT vec_id, fx FROM f ORDER BY vec_id LIMIT $k),
       |c0 AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cid, fx AS cfx,
       |              0::BIGINT AS n
       |       FROM seed),
       |$sweepCtes
       |SELECT cid, j.j - 1 AS dim, cfx[j.j] AS c, n AS n_members
       |FROM c$sweeps CROSS JOIN $dims j""".stripMargin
  }

  /** SemDeDup (similarity.SemDedup): within-cluster cosine near-dup
    * drop, greedy keep-lowest-id. The cluster count is corpus-adaptive
    * (Clustering.adaptiveK — the 100× scale run measured the fixed-k
    * form super-linear at ratio ~393, because mean cluster size and
    * with it the within-cluster pair scan grew with the corpus): gate
    * corpora (≤ 2048 vectors) stay at the k = 8 the static oracle
    * mirrors; larger corpora hold mean cluster size ≈ 256. Threshold
    * 0.35 is tuned to the synthetic embeddings' cosine range (max
    * within-cluster cosine ≈ 0.49 — real sentence embeddings would
    * use 0.9+); ~15% of rows drop at sf0.01, so the kept flag carries
    * real signal for the hash compare. */
  private val SemK = 8
  private val SemT = 0.35

  /** Memoized per-dir embedding count — same per-dir caching contract
    * as DedupOps' document count (immutable bench/gate dirs). */
  private val embCounts =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Long]()
  private def nEmb(s: SparkSession, dir: String): Long =
    embCounts.computeIfAbsent(dir,
      _ => Tables.embeddings(s, dir).count()).longValue()

  def q106SemanticDedup(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(s, dir)
    val k = graft.similarity.Clustering.adaptiveK(nEmb(s, dir), kMin = SemK)
    val cents = graft.similarity.Clustering.seedCentroids(emb, "vec_id", "embedding", k)
    val scope = graft.CacheScope.scoped()
    scope.materializeAndRelease(
      graft.similarity.SemDedup.semanticDedup(
        Tables.spread(s, emb), "vec_id", "embedding", cents, SemT, scope = scope))
  }

  val q106Sql: String = q106SqlFor(SemK)

  /** q106's oracle for an arbitrary cluster count (Clustering.adaptiveK
    * above the floor) — used by graft.AdaptiveGate. */
  def q106SqlFor(semK: Int): String = {
    val dotSelf = dotSql("embedding", "embedding")
    s"""WITH f AS (
       |  SELECT vec_id, list_transform(embedding,
       |    x -> CAST(floor(CAST(x AS DOUBLE) * 1000000 + 0.5) AS BIGINT)) AS fx
       |  FROM embeddings),
       |c AS (SELECT vec_id, fx AS cfx FROM f ORDER BY vec_id LIMIT $semK),
       |cc AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cid, cfx FROM c),
       |d AS (
       |  SELECT f.vec_id, cc.cid,
       |    CAST(list_sum(list_transform(range(1, len(f.fx) + 1),
       |      i -> (f.fx[i] - cc.cfx[i]) * (f.fx[i] - cc.cfx[i]))) AS BIGINT) AS dist
       |  FROM f CROSS JOIN cc),
       |a AS (SELECT vec_id, cid FROM d
       |      QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) = 1),
       |u AS (
       |  SELECT a.vec_id, a.cid,
       |    CASE WHEN sqrt($dotSelf) = 0
       |         THEN list_transform(embedding, x -> 0.0::DOUBLE)
       |         ELSE list_transform(embedding,
       |                x -> ${Fx.fxSql(s"x::DOUBLE / sqrt($dotSelf)", 6)} + 0.0::DOUBLE)
       |    END AS uv
       |  FROM a JOIN embeddings e USING (vec_id)),
       |dr AS (
       |  SELECT DISTINCT y.vec_id
       |  FROM u x JOIN u y ON x.cid = y.cid AND x.vec_id < y.vec_id
       |  WHERE ${Fx.fxSql(dotSql("x.uv", "y.uv"), 4)} >= $SemT)
       |SELECT u.vec_id, u.cid, (dr.vec_id IS NULL) AS kept
       |FROM u LEFT JOIN dr ON u.vec_id = dr.vec_id""".stripMargin
  }

  // ------------------------------------- q111 random-projection reduce

  private val ProjK = 8

  /** q111: JL sign-matrix random projection 64→8 dims
    * ([[graft.similarity.RandomProjection]]) — the pre-ANN compression
    * pass. Map-only: the ±1 matrix is a plan literal regenerated
    * identically on any engine (md5-derived), coordinates are integer
    * sums over quantized thousandths. Null/short vectors project to 0
    * on both engines (coalesce; zip_with pads with null → null sum). */
  def q111RandomProjection(s: SparkSession, dir: String): DataFrame = {
    val signs = graft.similarity.RandomProjection.signMatrix(Dim, ProjK)
    Tables.spread(s, Tables.embeddings(s, dir))
      .select(col("vec_id"),
        graft.similarity.RandomProjection.quantize(col("embedding")).as("qv"))
      .select(col("vec_id") +: signs.zipWithIndex.map { case (row, j) =>
        coalesce(graft.similarity.RandomProjection.coordinate(col("qv"), row),
          lit(0L)).as(s"p${j + 1}")
      }.toSeq: _*)
  }

  val q111Sql: String = {
    val signs = graft.similarity.RandomProjection.signMatrix(Dim, ProjK)
    val cols = signs.zipWithIndex.map { case (row, j) =>
      val lits = row.mkString("[", ", ", "]")
      s"CAST(coalesce(list_sum(list_transform(range(1, ${Dim + 1}), " +
        s"d -> ($lits)[d] * qv[d])), 0) AS BIGINT) AS p${j + 1}"
    }.mkString(",\n  ")
    s"""WITH q AS (
       |  SELECT vec_id, list_transform(embedding,
       |    x -> CAST(floor(x::DOUBLE * ${graft.similarity.RandomProjection.QuantScale} + 0.5) AS BIGINT)) AS qv
       |  FROM embeddings)
       |SELECT vec_id,
       |  $cols
       |FROM q""".stripMargin
  }

  /** q123: the IVF probe RANKING itself (similarity.Clustering
    * .nearestCids → the native top-n `nearest_cids` codegen
    * expression), oracle-gated: each vector's 3 nearest of q86's 8
    * seed centroids in (fixed-point dist asc, cid asc) order. q86
    * gates the top-1 assignment; this gates the top-n selection loop —
    * order, ties, and early-abandon correctness — against an
    * independent engine rather than only the composed-fold twin. */
  private val ProbeN = 3

  def q123ProbeRank(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(s, dir)
    val cents = graft.similarity.Clustering.seedCentroids(emb, "vec_id", "embedding", 8)
    Tables.spread(s, emb)
      .select(col("vec_id"),
        // posexplode_outer, not posexplode (the q41 trap): the probe
        // array is computed, and the non-outer generator would let
        // InferFiltersFromGenerate re-inline it into a Filter
        posexplode_outer(
          graft.similarity.Clustering.nearestCids(col("embedding"), cents, ProbeN))
          .as(Seq("probe_rank", "cid")))
      .filter(col("cid").isNotNull)
      .select(col("vec_id"), col("probe_rank").cast("long").as("probe_rank"),
        col("cid"))
  }

  val q123Sql: String =
    s"""WITH f AS (
       |  SELECT vec_id, list_transform(embedding,
       |    x -> CAST(floor(CAST(x AS DOUBLE) * 1000000 + 0.5) AS BIGINT)) AS fx
       |  FROM embeddings),
       |c AS (SELECT vec_id, fx AS cfx FROM f ORDER BY vec_id LIMIT 8),
       |cc AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cid, cfx FROM c),
       |d AS (
       |  SELECT f.vec_id, cc.cid,
       |    CAST(list_sum(list_transform(range(1, len(f.fx) + 1),
       |      i -> (f.fx[i] - cc.cfx[i]) * (f.fx[i] - cc.cfx[i]))) AS BIGINT) AS dist
       |  FROM f CROSS JOIN cc),
       |r AS (
       |  SELECT vec_id, cid,
       |    row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) - 1 AS probe_rank
       |  FROM d)
       |SELECT vec_id, probe_rank::BIGINT AS probe_rank, cid FROM r
       |WHERE probe_rank < $ProbeN""".stripMargin

  /** q127: hard-negative mining — for each anchor vector, the top-k
    * most-similar vectors with a DIFFERENT label (the contrastive-
    * training data-prep primitive: negatives that are hard precisely
    * because they are near). Same scoring/ranking discipline as q50
    * (broadcast anchors, corpus-partitioned scoring, round(4) ties to
    * corpus_id) plus the label-mismatch predicate pushed below the
    * ranking window; at production scale the anchor set rides the IVF
    * probe path instead of brute force — the label filter composes
    * identically there. */
  def q127HardNegatives(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(s, dir)
    val q = emb.filter(col("vec_id") < NQueries)
      .select(col("vec_id").as("query_id"), col("label").as("qlabel"),
        col("embedding").as("qvec"))
    val c = Tables.spread(s, emb)
      .select(col("vec_id").as("corpus_id"), col("label").as("clabel"),
        col("embedding").as("cvec"))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("query_id") =!= col("corpus_id") &&
        col("qlabel") =!= col("clabel"))
      .withColumn("rcos", Fx.fx(Similarity.cosine(col("qvec"), col("cvec")), 4))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("rcos").desc, col("corpus_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= TopK)
      .select(col("query_id"), col("rank").cast("long").as("rank"),
        col("corpus_id"), col("clabel").cast("long").as("neg_label"),
        col("rcos"))
  }

  val q127Sql: String =
    s"""WITH q AS (SELECT vec_id AS query_id, label AS qlabel, embedding AS qvec
       |           FROM embeddings WHERE vec_id < $NQueries),
       |c AS (SELECT vec_id AS corpus_id, label AS clabel, embedding AS cvec
       |      FROM embeddings),
       |scored AS (
       |  SELECT query_id, corpus_id, clabel,
       |    ${Fx.fxSql(cosineSql("qvec", "cvec"), 4)} AS rcos
       |  FROM c CROSS JOIN q
       |  WHERE query_id <> corpus_id AND qlabel <> clabel),
       |ranked AS (
       |  SELECT *, row_number() OVER (PARTITION BY query_id
       |            ORDER BY rcos DESC, corpus_id ASC) AS rank
       |  FROM scored)
       |SELECT query_id, rank, corpus_id, clabel::BIGINT AS neg_label, rcos
       |FROM ranked WHERE rank <= $TopK""".stripMargin

  /** q128: hard-negative mining OVER THE IVF PROBE PATH — the scale
    * composition q127's Scaladoc promises ("at production scale the
    * anchor set rides the IVF probe"), now oracle-gated instead of
    * argued: the same stored index artifact q52 serves, searched via
    * Ivf.searchWhere with the label-mismatch predicate below the
    * ranking window and the negative's label carried through. Full
    * probe (nProbe = k) keeps the result EXACT — bit-identical to the
    * brute-force q127 oracle — so the gate pins that the predicate
    * composes with probed search without perturbing scores, ranks, or
    * tie-breaks. At deployed scale the same plan runs with
    * nProbe ≪ k: the probed join's shape (only probed lists scored) is
    * precisely what this entry executes. */
  def q128HardNegativesIvf(s: SparkSession, dir: String): DataFrame = {
    val (model, indexPath) = ivfArtifact.computeIfAbsent(dir, { _ =>
      val emb = Tables.embeddings(s, dir)
      val m = graft.similarity.Ivf.fit(emb,
        k = graft.similarity.Ivf.kFor(nEmb(s, dir)), iters = 3, fitOneIn = 4)
      val base = graft.TempArtifacts.dir("graft_ivf")
      graft.similarity.Ivf.save(m, s"$base/model")(s)
      graft.similarity.Ivf.index(Tables.spread(s, emb), m)
        .write.parquet(s"$base/index")
      (graft.similarity.Ivf.load(s"$base/model")(s), s"$base/index")
    })
    val anchors = Tables.embeddings(s, dir)
      .filter(col("vec_id") < NQueries)
      .select(col("vec_id"), col("embedding"), col("label").as("qlabel"))
    graft.similarity.Ivf.searchWhere(
      anchors, s.read.parquet(indexPath), model,
      topK = TopK, nProbe = model.k, // full probe = exact at any k
      pairFilter = col("qlabel") =!= col("label"),
      carry = Seq("label"))
      .select(col("query_id"), col("rank"), col("corpus_id"),
        col("label").cast("long").as("neg_label"), col("rcos"))
  }

  val queries: Map[String, Q] = Map(
    "q128_hard_negatives_ivf" -> q128HardNegativesIvf,
    "q127_hard_negatives" -> q127HardNegatives,
    "q123_probe_rank" -> q123ProbeRank,
    "q111_random_projection" -> q111RandomProjection,
    "q50_ann_topk"    -> q50AnnTopK,
    "q55_group_centroid" -> q55GroupCentroid,
    "q56_l2_normalize" -> q56L2Normalize,
    "q51_lsh_neardup" -> q51LshNearDup,
    "q52_ivf_topk"    -> q52IvfTopK,
    "q53_quantized_topk" -> q53QuantizedTopK,
    "q86_kmeans_assign" -> q86KmeansAssign,
    "q106_semantic_dedup" -> q106SemanticDedup,
    "q129_kmeans_fit" -> q129KmeansFit,
  )

  val oracles: Map[String, String] = Map(
    // full-probe IVF hard negatives are exact, so the ORACLE is the
    // brute-force q127 SQL verbatim — the equivalence IS the gate
    "q128_hard_negatives_ivf" -> q127Sql,
    "q127_hard_negatives" -> q127Sql,
    "q123_probe_rank" -> q123Sql,
    "q111_random_projection" -> q111Sql,
    "q50_ann_topk"    -> q50Sql,
    "q55_group_centroid" -> q55Sql,
    "q56_l2_normalize" -> q56Sql,
    "q51_lsh_neardup" -> q51Sql,
    "q52_ivf_topk"    -> q52Sql,
    "q53_quantized_topk" -> q53Sql,
    "q86_kmeans_assign" -> q86Sql,
    "q106_semantic_dedup" -> q106Sql,
    "q129_kmeans_fit" -> q129Sql,
  )
}
