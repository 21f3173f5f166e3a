package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bounded-hop resolution over a FUNCTIONAL edge relation — the shape
  * shared by server-redirect chains (301/302 → `Location`), alias
  * chains, and any "follow the pointer until it stops" consolidation
  * pass. Reference semantics by analogy to a crawler's redirect
  * resolution (RFC 9110 §15.4: a 3xx response designates one successor
  * URI; UAs follow a bounded number of them).
  *
  * Each start node walks `edges (src, dst)` until it reaches a node
  * with no outgoing edge (settled), revisits a node already on its own
  * path (a LOOP — the walk stops with `is_loop = true` at the revisited
  * node), or exhausts `maxHops`. Edges must be a function (at most one
  * dst per src) — dedupe upstream; the per-URL "canonical capture"
  * dedup is exactly that.
  *
  * Scale shape: the iterative sweep with per-hop lineage truncation
  * ([[graft.Checkpoints.eager]] — the PageRank/SitemapTree discipline).
  * Hop 1 probes EVERY start node against the edge relation (one
  * key-distributed join — the unavoidable "is this node redirected"
  * question); every later hop moves only the still-walking rows, which
  * on real corpora is the small redirect-bearing slice. Loop detection
  * carries each moving row's own path (an array bounded by `maxHops`
  * elements), never a global visited structure — nothing driver-side.
  */
object ChainResolve {

  /** Resolve each `starts (node)` row through `edges (src, dst)`.
    * Output: (node, final_node, hops, is_loop, settled) — `final_node`
    * is where the walk stopped (on a loop: the revisited node; the hop
    * that detects the loop still counts), `settled` is false only when
    * `maxHops` ran out while an outgoing edge remained (chain longer
    * than the budget — RFC 9110's "a client SHOULD detect and intervene
    * in cyclical redirections" generalized to a budget). */
  def resolve(starts: DataFrame, edges: DataFrame, maxHops: Int): DataFrame = {
    require(maxHops >= 1, "maxHops must be at least 1")
    val e = edges.select(col("src").as("__es"), col("dst").as("__ed"))
    def step(from: DataFrame): DataFrame = {
      val j = from.join(e, from("cur") === e("__es"), "left")
      val dst: Column = col("__ed")
      j.select(col("node"),
        when(dst.isNull, col("cur")).otherwise(dst).as("cur"),
        when(dst.isNull, col("hops")).otherwise(col("hops") + 1).as("hops"),
        when(dst.isNull, col("path"))
          .when(array_contains(col("path"), dst), col("path"))
          .otherwise(array_append(col("path"), dst)).as("path"),
        (dst.isNotNull && array_contains(col("path"), dst)).as("is_loop"),
        (dst.isNull || array_contains(col("path"), dst)).as("done"))
    }
    var cur = graft.Checkpoints.eager(
      step(starts.select(col("node"), col("node").as("cur"),
        lit(0L).as("hops"), array(col("node")).as("path"))))
    var hop = 2
    var drained = false
    while (!drained && hop <= maxHops) {
      val moving = cur.filter(!col("done"))
      if (moving.isEmpty) drained = true
      else cur = graft.Checkpoints.eager(
        cur.filter(col("done")).unionByName(step(moving.drop("is_loop", "done"))))
      hop += 1
    }
    cur.select(col("node"), col("cur").as("final_node"), col("hops"),
      col("is_loop"), col("done").as("settled"))
  }
}
