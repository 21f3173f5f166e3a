package graft

import org.apache.spark.sql.{Column, DataFrame}

/** Fluent facade over the operator library — `import graft.syntax._`
  * and chain pipeline stages off any DataFrame:
  *
  * {{{
  *   docs.dedupExact("doc_id", col("text"))
  *   docs.decontaminateAgainst(bench, "doc_id", col("text"), n = 3)
  *   emb.l2Normalized(col("embedding"), "norm", "unit")
  *   facts.bloomSemiJoin(col("k"), dims, col("dim_k"))
  * }}}
  *
  * Every method delegates 1:1 to the documented object-API operator
  * (dedup.Dedup, dedup.Decontaminate, similarity.*, operators.*,
  * text.*) — no logic lives here, so the two surfaces cannot drift.
  */
package object syntax {

  implicit class GraftDataFrameOps(private val df: DataFrame) {

    // ------------------------------------------------------ dedup
    def dedupExact(idCol: String, key: Column): DataFrame =
      dedup.Dedup.exactCanonical(df, idCol, key)

    def withMinhashSignature(text: Column, k: Int, shingleN: Int = 3,
                             out: String = "sig"): DataFrame =
      dedup.Dedup.withMinhashSignature(df, text, k, shingleN, out)

    def withSimhash(text: Column, bits: Int = 64,
                    out: String = "simhash"): DataFrame =
      dedup.Dedup.withSimhash(df, text, bits, out)

    def jaccardJoin(idCol: String, text: Column, shingleN: Int = 3,
                    maxShingleDf: Long = 50, minJ: Double = 0.2): DataFrame =
      dedup.Dedup.jaccardJoin(df, idCol, text, shingleN, maxShingleDf, minJ)

    /** Near-dup pairs → (id, cluster_id) by connected components. */
    def dedupClusters(idCol: String, pairs: DataFrame,
                      aCol: String, bCol: String): DataFrame =
      dedup.ConnectedComponents.components(df, idCol, pairs, aCol, bCol)

    /** (cluster_id, keep_id): one survivor per cluster by priority
      * (this df = the (id, cluster_id) clusters frame). */
    def keepBest(docs: DataFrame, idCol: String, priority: Column): DataFrame =
      dedup.ConnectedComponents.keepBest(df, docs, idCol, priority)

    def decontaminateAgainst(benchmark: DataFrame, idCol: String,
                             text: Column, n: Int,
                             benchText: Column = null): DataFrame =
      dedup.Decontaminate.overlap(df, idCol, text, benchmark,
        Option(benchText).getOrElse(text), n)

    // ------------------------------------------------------- text
    def repetitionMetrics(idCol: String, text: Column, n: Int = 2): DataFrame =
      graft.text.Repetition.metrics(df, idCol, text, n)

    def slidingChunks(idCol: String, text: Column, chunkSize: Int,
                      stride: Int): DataFrame =
      graft.text.Chunking.slidingChunks(df, idCol, text, chunkSize, stride)

    def blocklistClean(text: Column, terms: Seq[String]): DataFrame =
      graft.text.Blocklist.clean(df, text, terms)

    def invertedIndex(idCol: String, text: Column, cap: Int = 20): DataFrame =
      graft.text.Postings.invertedIndex(df, idCol, text, cap)

    def fuzzyPairs(strCol: Column, maxDist: Int = 1): DataFrame =
      graft.text.Fuzzy.fuzzyPairs(df, strCol, maxDist)

    def fluencyScores(idCol: String, text: Column): DataFrame =
      graft.text.Fluency.scoreByCorpusFrequency(df, idCol, text)

    // ----------------------------------------------------- vectors
    def l2Normalized(vec: Column, normOut: String, vecOut: String): DataFrame =
      similarity.Similarity.withL2Normalized(df, vec, normOut, vecOut)

    def quantizedInt8(vecCol: String = "embedding", qCol: String = "qvec",
                      sCol: String = "qscale"): DataFrame =
      similarity.Quantize.withInt8(df, vecCol, qCol, sCol)

    def meanCentroid(group: Column, vec: Column): DataFrame =
      similarity.Pooling.meanCentroid(df, group, vec)

    /** JL sign-matrix projection of `vec` to k integer coordinates. */
    def randomProjected(vec: Column, k: Int, dim: Int,
                        out: String = "proj"): DataFrame = {
      val signs = similarity.RandomProjection.signMatrix(dim, k)
      val q = similarity.RandomProjection.quantize(vec)
      df.withColumn(out, org.apache.spark.sql.functions.array(
        signs.map(row => similarity.RandomProjection.coordinate(q, row))
          .toSeq: _*))
    }

    // --------------------------------------------------- operators
    def bloomSemiJoin(key: Column, right: DataFrame, rightKey: Column,
                      expectedItems: Long = -1L,
                      numBits: Long = -1L): DataFrame =
      operators.BloomPrune.semiJoin(df, key, right, rightKey,
        expectedItems, numBits)

    def saltedJoin(key: Column, dim: DataFrame, dimKey: Column,
                   saltSource: Column, salts: Int = 8): DataFrame =
      operators.SaltedJoin.inner(df, key, dim, dimKey, saltSource, salts)

    def withSplit(key: Column, splits: Seq[(String, Double)]): DataFrame =
      operators.DataSplit.withSplit(df, key, splits)

    def stratifiedSample(strata: Column, hashKey: Column, tiebreak: Column,
                         n: Int): DataFrame =
      operators.Sampling.stratifiedSample(df, strata, hashKey, tiebreak, n)

    /** Latest-wins merge of an update batch into this snapshot. */
    def upsert(updates: DataFrame, keys: Seq[String],
               version: Seq[String]): DataFrame =
      operators.Upsert.latestWins(df, updates, keys, version)

    def scd2(keys: Seq[String], orderCol: String, attr: String): DataFrame =
      operators.Scd2.intervalize(df, keys, orderCol, attr)

    def capPerGroup(groupCols: Seq[String], order: Seq[Column],
                    n: Int): DataFrame =
      operators.QuotaCap.capPerGroup(df, groupCols, order, n)

    def gapFill(keys: Seq[String], bucketCol: String, step: Long,
                zeroFill: Map[String, Column], ffill: Seq[String]): DataFrame =
      operators.Resample.gapFill(df, keys, bucketCol, step, zeroFill, ffill)

    def expectationsAudit(rules: Seq[operators.Expectations.Rule]): DataFrame =
      operators.Expectations.audit(df, rules)

    def quarantine(rules: Seq[operators.Expectations.Rule]): (DataFrame, DataFrame) =
      operators.Expectations.quarantine(df, rules)

    def aggState(keys: Seq[String], valueCol: String): DataFrame =
      operators.AggMaintenance.state(df, keys, valueCol)

    /** Per-group integer percent_rank calibration (cross-source scores). */
    def rankCalibrated(group: Column, score: Column, tiebreak: Column,
                       buckets: Int = 10): DataFrame =
      operators.Calibrate.rankCalibrate(df, group, score, tiebreak, buckets)

    /** Diff this snapshot (old) against `newer` by key + fingerprint. */
    def snapshotDiff(newer: DataFrame, key: String,
                     fingerprint: Column): DataFrame =
      operators.SnapshotDiff.diff(df, newer, key, fingerprint)

    /** Exact global rank without a global sort (bounded integer score). */
    def globalRanked(score: Column, tiebreak: Column): DataFrame =
      operators.GlobalRank.globalRank(df, score, tiebreak)

    /** Integer equi-width histogram of a discretized column. */
    def histogram(value: Column, buckets: Int): DataFrame =
      operators.Histogram.equiWidth(df, value, buckets)

    /** Fixed-sweep integer PageRank of this edge relation. */
    def pageRank(srcCol: String, dstCol: String, iterations: Int): DataFrame =
      operators.PageRank.run(df, srcCol, dstCol, iterations)

    def writeZOrdered(path: String, clusterCols: Seq[String],
                      numFiles: Int, bits: Int = 8): Unit =
      sources.ZOrder.writeZOrdered(df, path, clusterCols, numFiles, bits)
  }
}
