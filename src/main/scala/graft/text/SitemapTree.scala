package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bounded-depth sitemap TREE walk routed by ROOT ELEMENT (r18,
  * VERDICT r17 next #4/#5): the sitemaps.org protocol lets an index
  * name other indexes, and discovery (robots `Sitemap:` lines) hands a
  * crawler a mixed bag of plain sitemaps, indexes, and dead URLs — so
  * a real frontier build cannot route by URL shape. Each level:
  *
  *   1. FETCH the frontier's documents (caller-supplied — a join
  *      against zone captures, a gz member resolution, whatever the
  *      deployment's storage is; URLs the fetch cannot resolve drop);
  *   2. ROUTE by the document's root element: `<urlset>` is a LEAF
  *      (emitted with its discovery path and depth), `<sitemapindex>`
  *      recurses — its `<loc>` children become the next frontier with
  *      the parent's path extended by their document-order ordinal;
  *   3. DEDUPE the next frontier per (host, url), keeping the
  *      lexicographically smallest discovery path (ordinals are
  *      zero-padded to the protocol's 50k-entry width, so
  *      lexicographic = numeric) — an index reachable through two
  *      parents is fetched once, deterministically.
  *
  * Depth is BOUNDED (`maxDepth`) — the PageRank-style iterative sweep
  * with per-level lineage truncation ([[graft.Checkpoints.eager]]), so
  * a cyclic index graph terminates and no level re-runs the previous
  * level's fetch lineage. The walk stops early when a frontier empties
  * (one cheap count job per level over a host-cardinality relation).
  *
  * Scale shape: each level is one fetch-join + one map-only extraction
  * + one per-(host,url) aggregate — everything key-distributed, nothing
  * driver-side; 10⁸ discovered sitemaps walk level-parallel.
  */
object SitemapTree {

  /** Zero-pad width for path ordinals: the protocol caps an index at
    * 50,000 entries, so 5 digits keep lexicographic = numeric. */
  val OrdWidth = 5

  /** A seed/child ordinal as a path component. */
  def pathComponent(idx: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    lpad(idx.cast("string"), OrdWidth, "0")

  /** Walk from `seeds (host, sm_canon, sm_path)`;
    * `fetch: (host, sm_canon, sm_path) → (host, sm_canon, sm_path, xml)`
    * resolves canonical URLs to document text (inner — unfetchable URLs
    * drop). Returns the LEAF urlset documents:
    * (host, sm_path, depth, xml). */
  def walk(seeds: DataFrame, fetch: DataFrame => DataFrame,
           maxDepth: Int): DataFrame = {
    require(maxDepth >= 0, "maxDepth must be non-negative")
    var frontier = seeds.select(col("host"), col("sm_canon"), col("sm_path"))
    var leaves: Option[DataFrame] = None
    var depth = 0
    var done = false
    while (!done && depth <= maxDepth) {
      val fetched = graft.Checkpoints.eager(
        fetch(frontier)
          .select(col("host"), col("sm_canon"), col("sm_path"), col("xml")))
      val routed = fetched.withColumn("__root",
        lower(regexp_extract(col("xml"), "(?is)<\\s*(urlset|sitemapindex)", 1)))
      val leaf = routed.filter(col("__root") === "urlset")
        .select(col("host"), col("sm_path"),
          lit(depth.toLong).as("depth"), col("xml"))
      leaves = Some(leaves.map(_.unionByName(leaf)).getOrElse(leaf))
      if (depth == maxDepth) done = true
      else {
        val refs = Sitemaps.locs(
            routed.filter(col("__root") === "sitemapindex")
              .select(col("host"), col("sm_path"), col("xml")),
            col("xml"))
          .select(col("host"), col("loc_canon").as("sm_canon"),
            concat(col("sm_path"), lit("/"),
              pathComponent(col("loc_idx"))).as("sm_path"))
        frontier = refs.groupBy(col("host"), col("sm_canon"))
          .agg(min(col("sm_path")).as("sm_path"))
        if (frontier.isEmpty) done = true
      }
      depth += 1
    }
    leaves.get
  }
}
