package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Connected components over a candidate-pair graph — the last mile of a
  * dedup pipeline: LSH/simhash emit near-dup PAIRS (q42/q45), but the
  * deliverable is one canonical document per duplicate CLUSTER.
  * Components are labeled by their minimum member id.
  *
  * Algorithm: alternating large-star / small-star (Kiveris et al.,
  * "Connected Components in MapReduce and Beyond", 2014 — public
  * literature; the same scheme GraphFrames uses). Each round every node
  * u with neighborhood Γ(u) and m = min(Γ(u) ∪ {u}):
  *   - large-star: reattach u's strictly-larger neighbors to m;
  *   - small-star: reattach u and its smaller neighbors to m.
  * Both preserve connectivity; the only fixpoints are star graphs rooted
  * at each component's minimum, and alternation converges in O(log n)
  * rounds (a naive min-label flood or one-sided contraction needs
  * O(diameter) — a 60-node chain already breaks it).
  *
  * Exit is PROVEN, not assumed: we verify that every remaining edge
  * connects two nodes with the same label — a labeling consistent
  * across all edges is constant per component, and since label(u) ≤ u
  * with the component minimum labeling itself, that constant is the
  * minimum. The check runs only on edge-count PLATEAU rounds (a star
  * forest is a fixpoint of both transforms, so the count always
  * plateaus once labels are final; while it is still moving the
  * certificate join is almost always a wasted pass). The certificate
  * remains the SOLE exit — a plateau alone proves nothing. maxIter
  * throws rather than ship partial clusters.
  *
  * Scale design (100 TB): everything is joins/aggregations on the edge
  * relation — no driver-side graph, no collect; rounds touch only the
  * still-unconverged frontier (star-shaped components stop producing
  * changes). Each round's lineage is truncated through
  * [[graft.Checkpoints.eager]] (iterative plans otherwise re-execute
  * from the scan): localCheckpoint by default, reliable checkpoint when
  * `spark.graft.checkpoint.dir` is set — the posture for multi-hour
  * jobs where executor loss must not restart the computation.
  */
object ConnectedComponents {

  /** @param vertices one row per node (singletons keep their own id as
    *                 cluster); @param pairs undirected edges; duplicates
    *                 and self-loops tolerated. Returns (id, cluster_id).
    * @param scope when the caller materializes the result through a
    *              [[graft.CacheScope.Scoped]], pass it here: the FINAL
    *              round's checkpoint (which the returned lazy frame
    *              reads from) is registered as a scope intermediate and
    *              its files are deleted the moment the caller's
    *              `materializeAndRelease` lands — instead of surviving
    *              until the session-wide `releaseAll`. */
  def components(vertices: DataFrame, idCol: String,
                 pairs: DataFrame, aCol: String, bCol: String,
                 maxIter: Int = 100,
                 scope: Option[graft.CacheScope.Scoped] = None): DataFrame = {
    val raw = pairs.select(col(aCol).cast("long").as("u"),
        col(bCol).cast("long").as("v"))
      .filter(col("u").isNotNull && col("v").isNotNull && col("u") =!= col("v"))
    var edges = graft.Checkpoints.eager(symmetrize(raw))

    // per-node label: min(self, neighbors) — lazy, derived from the
    // current checkpoint (cheap to recompute; checkpointing it would
    // cost an extra job per round)
    def labelsOf(e: DataFrame): DataFrame =
      e.groupBy(col("u")).agg(least(col("u"), min(col("v"))).as("lab"))

    /** The correctness certificate: labels are final iff every edge
      * connects two nodes with the same label (then the labeling is
      * constant per component, and — since lab(u) ≤ u with the
      * component minimum labeling itself — that constant is the min). */
    def isStar(e: DataFrame): Boolean = {
      val lab = labelsOf(e)
      e.join(lab.select(col("u"), col("lab").as("lab_u")), Seq("u"))
        .join(lab.select(col("u").as("v"), col("lab").as("lab_v")), Seq("v"))
        .filter(col("lab_u") =!= col("lab_v"))
        .isEmpty
    }

    var prevCount = edges.count()
    var iter = 0
    var converged = prevCount == 0
    while (!converged) {
      iter += 1
      if (iter > maxIter)
        throw new IllegalStateException(
          s"connected components did not converge in $maxIter rounds")
      // Exactly ONE large+small alternation per checkpoint: each star
      // transform references its input 2-3× (agg + join probe), so
      // stacking a second alternation on the unmaterialized output
      // re-executes the inner subtrees multiplicatively — measured 3×
      // SLOWER than checkpointing every round, not faster.
      val newEdges = graft.Checkpoints.eager(smallStar(largeStar(edges)))
      val n = newEdges.count()
      // certificate on PLATEAU rounds (see the header contract) — plus
      // a LAST-CHANCE check on the final permitted round, so a graph
      // that becomes a star exactly at maxIter (its plateau round would
      // be maxIter+1) converges instead of throwing
      converged = n == 0 || ((n == prevCount || iter == maxIter) && isStar(newEdges))
      // round N's reliable checkpoint is superseded once round N+1 is
      // materialized: delete it, or a multi-hour job accumulates
      // rounds × |edges| of files under the checkpoint dir (no-op for
      // localCheckpoint). The FINAL round's checkpoint stays — the
      // returned frame reads from it.
      graft.Checkpoints.release(edges)
      edges = newEdges
      prevCount = n
    }
    scope.foreach(_.trackIntermediate(edges))
    vertices.select(col(idCol).cast("long").as("id")).distinct()
      .join(labelsOf(edges).select(col("u").as("id"), col("lab")), Seq("id"), "left")
      .select(col("id"), coalesce(col("lab"), col("id")).as("cluster_id"))
  }

  /** The pipeline's last step: given (id, cluster_id) from
    * [[components]] and the document table, pick ONE survivor per
    * cluster — the row maximizing `priority` (ties → lowest id, so the
    * choice is deterministic). Everything is a max_by aggregation with
    * map-side partial merge; no windows, no sorts.
    *
    * Returns (cluster_id, keep_id): anti-join the corpus against the
    * complement to drop duplicates, or semi-join on keep_id to keep
    * survivors only. */
  def keepBest(clusters: DataFrame, docs: DataFrame, idCol: String,
               priority: Column): DataFrame = {
    val prio = docs.select(col(idCol).cast("long").as("id"),
      priority.as("__prio"))
    clusters.join(prio, Seq("id"))
      .groupBy(col("cluster_id"))
      .agg(max_by(col("id"),
        // struct orders lexicographically: priority DESC then id ASC
        // via negated id — max_by picks the highest-priority, lowest-id
        struct(col("__prio"), (-col("id")).as("neg_id"))).as("keep_id"))
  }

  private def symmetrize(e: DataFrame): DataFrame =
    e.union(e.select(col("v").as("u"), col("u").as("v"))).distinct()

  /** Both directions, duplicates kept — duplicate edges don't change
    * min-aggregations or connectivity, so the mid-round dedup shuffle
    * is skipped; smallStar's closing symmetrize dedups once per round. */
  private def bothWays(e: DataFrame): DataFrame =
    e.union(e.select(col("v").as("u"), col("u").as("v")))

  /** For each u, m = min(Γ(u) ∪ {u}): edges (v, m) for all v ∈ Γ(u),
    * v > u. Connectivity: any u with a smaller neighbor keeps an edge
    * via that neighbor's emission (u > it). */
  private def largeStar(e: DataFrame): DataFrame = {
    val m = e.groupBy(col("u")).agg(least(col("u"), min(col("v"))).as("m"))
    val half = e.join(m, Seq("u"))
      .filter(col("v") > col("u")) // v > u ≥ m, so (v, m) is never a self-loop
      .select(col("v").as("u"), col("m").as("v"))
    bothWays(half)
  }

  /** For each u with smaller neighbors N = {v ∈ Γ(u) : v < u},
    * m = min(N): edges (v, m) for v ∈ N \ {m}, plus (u, m). */
  private def smallStar(e: DataFrame): DataFrame = {
    val smaller = e.filter(col("v") < col("u"))
    val m = smaller.groupBy(col("u")).agg(min(col("v")).as("m"))
    val reattach = smaller.join(m, Seq("u"))
      .filter(col("v") =!= col("m"))
      .select(col("v").as("u"), col("m").as("v"))
    val self = m.select(col("u"), col("m").as("v"))
    symmetrize(reattach.union(self))
  }
}
