package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PageRank over an edge relation — the canonical iterative graph
  * computation a corpus-curation pipeline uses for link-based quality
  * signals (host/page authority weighting a crawl before sampling).
  *
  * Everything is INTEGER fixed-point so the result is bit-reproducible
  * across engines and partitionings (the oracle contract): ranks live
  * in `scale` units (default 10⁶), the damped contribution of a node
  * with out-degree `d` is `(dampNum·rank) div (dampDen·d)` in pure
  * non-negative long math (truncation == floor), and the teleport base
  * is `scale·(dampDen−dampNum)/dampDen`. Summation is integer, so
  * aggregation order cannot perturb the result — the float-sum hazard
  * that makes textbook double-PageRank unverifiable is gone. Dangling
  * nodes (no out-edges) absorb rank without redistributing it — the
  * standard simplified variant; iteration count is FIXED (a mirror of
  * the oracle's chained self-joins), not convergence-tested, which is
  * also how production link-rank jobs run (k sweeps per crawl).
  *
  * Scale design (100 TB of edges): the edge relation is laid out ONCE —
  * hash-partitioned and sorted by `src`, then checkpointed (LogicalRDD
  * preserves partitioning AND ordering) — so every sweep's edge⋈rate
  * sort-merge join needs no exchange and no sort on the E-row side.
  * The rank-dependent contribution rate is computed per SOURCE on the
  * V-row node relation first, so only (src, c) pairs of V rows ship
  * into the sweep; the E-row relation pays exactly ONE shuffle per
  * sweep — the per-destination aggregation, which IS PageRank's
  * irreducible data movement. Per-round lineage is truncated through
  * [[graft.Checkpoints.eager]] (localCheckpoint by default, reliable
  * checkpoint under `spark.graft.checkpoint.dir` for multi-hour jobs)
  * every `checkpointEvery` rounds plus ALWAYS the final round, and a
  * superseded checkpoint is released as soon as the next materializes —
  * the same hygiene as [[graft.dedup.ConnectedComponents]]. Rounds
  * between checkpoints chain lazily: each round's output is consumed
  * exactly once by the next (rate is the only reader of `ranks`), so
  * the un-truncated stretch evaluates every sweep exactly once — unlike
  * the CC star transforms (which read their input 2–3× and measured 3×
  * slower unmaterialized), there is no multiplicative re-execution to
  * guard against, only plan depth and the executor-loss recompute
  * window, both bounded by `checkpointEvery`. Measured r19: each eager
  * round cost one scheduler round-trip of fixed overhead per sweep,
  * which dominated the host-graph rank queries. No driver-side graph
  * state ever exists: the only driver values are loop counters.
  */
object PageRank {

  /** @param edges     directed edge relation; duplicate edges count as
    *                  parallel edges (each carries a contribution) —
    *                  `.distinct()` first for simple-graph semantics.
    * @param scope     register the final round's checkpoint with a
    *                  [[graft.CacheScope.Scoped]] so
    *                  `materializeAndRelease` reclaims it.
    * @param checkpointEvery truncate sweep lineage every this many
    *                  rounds (the final round ALWAYS materializes, so
    *                  the early release of the edge/node checkpoints
    *                  below stays safe). The result is
    *                  interval-independent — pure integer math over the
    *                  same row sets — so this only trades scheduler
    *                  round-trips (one eager job per truncation) against
    *                  plan depth and the recompute window on executor
    *                  loss; 4 chained sweeps is a modest plan and the
    *                  standard k≈10–20 production run keeps a bounded
    *                  failure-recovery cost. PageRankSpec pins
    *                  interval-independence on a graph with dangling
    *                  nodes, a cycle, and parallel edge dedupe upstream.
    * @return (node, pr) for every node appearing as a source or a
    *         destination; pr in `scale` fixed-point units. */
  def run(edges: DataFrame, srcCol: String, dstCol: String,
          iterations: Int, scale: Long = 1000000L,
          dampNum: Long = 85L, dampDen: Long = 100L,
          scope: Option[graft.CacheScope.Scoped] = None,
          checkpointEvery: Int = 4): DataFrame = {
    require(iterations >= 1, "iterations must be >= 1")
    require(dampDen > dampNum && dampNum > 0, "damping must be in (0,1)")
    require(checkpointEvery >= 1, "checkpointEvery must be >= 1")
    val base = scale * (dampDen - dampNum) / dampDen

    // The loop-invariant edge LAYOUT, materialized ONCE: hash-partition
    // + sort by src, then checkpoint — LogicalRDD preserves both, so
    // every sweep's edge⋈rate sort-merge join runs with ZERO exchange
    // and ZERO sort on the edge side (the bucketed-fact-table economics,
    // paid once per run instead of once per sweep). The caller's edge
    // expression (typically itself a join/distinct pipeline) also runs
    // exactly once, here.
    val e = graft.Checkpoints.eager(
      edges.select(col(srcCol).cast("long").as("src"),
        col(dstCol).cast("long").as("dst"))
        .repartition(col("src")).sortWithinPartitions(col("src")))
    // node relation WITH out-degree (0 for pure-destination/dangling
    // nodes) — one aggregation and ONE checkpoint where r18 paid two
    // (a degree agg job plus a distinct-nodes job): the map-side
    // partial agg collapses the union to ~2V rows before its exchange,
    // so the shuffle bytes match the old nodes-distinct alone.
    // Consumed every sweep (the rate join needs outdeg, the dangling
    // left join needs the full node set).
    val nodeInfo = graft.Checkpoints.eager(
      e.select(col("src").as("node"), lit(1L).as("__out"))
        .unionByName(e.select(col("dst").as("node"), lit(0L).as("__out")))
        .groupBy(col("node")).agg(sum(col("__out")).as("outdeg")))
    val nodes = nodeInfo.select(col("node"))

    var ranks = nodes.select(col("node"), lit(scale).as("pr"))
    var prevCk: Option[DataFrame] = None
    for (i <- 1 to iterations) {
      // rank-dependent per-SOURCE rate — V-row join, so the E-row side
      // of the sweep never carries outdeg and the rate join ships V
      // rows, not E. outdeg > 0 keeps exactly the source set (a src has
      // outdeg >= 1 by construction) — same inner-join row set as the
      // old deg relation, and the integer div never sees a zero.
      val rate = nodeInfo.filter(col("outdeg") > 0)
        .join(ranks, Seq("node"))
        .select(col("node").as("src"), call_function("div",
          lit(dampNum) * col("pr"), lit(dampDen) * col("outdeg")).as("c"))
      val next = nodes
        .join(e.join(rate, Seq("src"))
            .groupBy(col("dst").as("node")).agg(sum(col("c")).as("in_c")),
          Seq("node"), "left")
        .select(col("node"), (lit(base) + coalesce(col("in_c"), lit(0L))).as("pr"))
      ranks =
        if (i == iterations || i % checkpointEvery == 0) {
          val ck = graft.Checkpoints.eager(next)
          prevCk.foreach(graft.Checkpoints.release)
          prevCk = Some(ck)
          ck
        } else next
    }
    // e/nodeInfo are superseded once the last round lands (the final
    // round is always checkpointed above); the final ranks checkpoint
    // is the caller's to release (via scope).
    graft.Checkpoints.release(e)
    graft.Checkpoints.release(nodeInfo)
    scope.foreach(_.trackIntermediate(ranks))
    ranks
  }
}
