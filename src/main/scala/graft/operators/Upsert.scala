package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Keyed snapshot upsert — latest-wins merge of an update batch into a
  * snapshot (the incremental-refresh primitive: CDC compaction, corpus
  * re-crawls, feature-store refresh). The reference's pipeline rewrites a
  * whole day per run (etl-olho-vivo-ingestao-posicoes.py:70 overwrites the
  * day file); at 100 TB a full rewrite is untenable and merge-by-key is
  * the operation that replaces it.
  *
  * Shape: `upsert(snapshot, updates)` = per key, the row with the highest
  * version among snapshot ∪ updates — new keys insert, existing keys
  * update, ties break by the version columns' lexicographic struct order.
  *
  * Scale design: NOT a full-outer join (two sorted/shuffled sides plus
  * null-merge logic) — a `unionByName` followed by ONE hash aggregation
  * with `max_by(payload, version)`. max_by is a declarative aggregate, so
  * Spark plans partial aggregation before the exchange: each map task
  * forwards at most one candidate row per key it saw, and the shuffle
  * carries keys × candidates, not rows. With AQE the post-agg partition
  * count adapts to the merged key cardinality.
  */
object Upsert {

  /** Latest-wins merge. `snapshot` and `updates` must share a schema (by
    * name); `keys` identify an entity; `version` columns order revisions
    * (compared as a struct, lexicographically, e.g. Seq(ts, seq_no)).
    *
    * DETERMINISM CONTRACT: `version` must totally order the revisions of
    * a key — include a unique column (sequence number, event id) as the
    * last component. Two candidates with EQUAL version structs resolve
    * to whichever partial max_by saw first, which varies run to run;
    * the gates therefore version on (ts, event_id). */
  def latestWins(snapshot: DataFrame, updates: DataFrame,
                 keys: Seq[String], version: Seq[String]): DataFrame =
    compact(snapshot.unionByName(updates), keys, version)

  /** Compact a raw change stream to one latest row per key — the snapshot
    * bootstrap, and the single-input form of the same aggregation. */
  def compact(changes: DataFrame, keys: Seq[String],
              version: Seq[String]): DataFrame = {
    require(keys.nonEmpty && version.nonEmpty, "keys and version required")
    val payload = changes.columns.filterNot(keys.contains).toSeq
    require(version.forall(payload.contains),
      "version columns must be non-key columns")
    changes
      .groupBy(keys.map(col): _*)
      .agg(max_by(struct(payload.map(col): _*),
        struct(version.map(col): _*)).as("__latest"))
      .select(keys.map(col) ++ payload.map(c => col(s"__latest.`$c`").as(c)): _*)
  }
}
