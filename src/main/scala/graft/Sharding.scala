package graft

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.functions._

/** The ONE k×-corpus synthesis scaffold shared by every scale harness
  * (ScaleProbe, ScaleBench, PairProbe): id-offset shards with a
  * deterministic per-shard perturbation so cross-shard rows are near-
  * not byte-dups. Shared on purpose — the harnesses' published numbers
  * (SCALE10/SCALE30, probe notes) are only comparable if they scale
  * the SAME synthetic corpus; a scaffold tweak in one file must reach
  * all of them. */
object Sharding {

  /** k shards of `base`: shard s offsets `idCol` by `s × span` and
    * applies `perturb(s)` to the listed columns (all other columns
    * pass through unchanged). */
  def sharded(base: DataFrame, idCol: String, k: Int, span: Long)
             (perturb: Int => Seq[(String, Column)]): DataFrame =
    (0 until k).map { s =>
      perturb(s).foldLeft(
        base.withColumn(idCol, col(idCol) + lit(s * span))) {
        case (df, (name, c)) => df.withColumn(name, c)
      }
    }.reduce(_ unionByName _)

  /** Documents: doc_id offset by corpus size, per-shard text marker
    * (near-dup copies — the dedup chains' stress shape). */
  def documents(docs: DataFrame, k: Int): DataFrame =
    sharded(docs, "doc_id", k, docs.count())(s => Seq(
      "text" -> concat(col("text"), lit(s" shard$s marker$s"))))

  /** Documents, DISTINCT mode: every token is shard-salted (injective
    * per-token rewrite, so the shingle-equality structure WITHIN a shard
    * is exactly the base corpus's), which zeroes cross-shard word-n-gram
    * overlap. This is the realistic corpus growth law — duplication rate
    * held constant as the corpus grows (each shard contributes only the
    * base corpus's own near-dup structure) — against which the dedup
    * chain should scale ~linearly; `documents` above is the adversarial
    * stress shape where every base doc's k copies all pair up (~k²
    * candidate pairs). Scale harnesses publish both. */
  def documentsDistinct(docs: DataFrame, k: Int): DataFrame =
    sharded(docs, "doc_id", k, docs.count())(s => Seq(
      "text" -> array_join(
        transform(split(col("text"), "\\s+"),
          w => concat(lit(s"s${s}_"), w)), " ")))

  /** Embeddings: vec_id offset by corpus size, +s·1e-4 coordinate
    * perturbation (cosine ≈ 1 across shards — semantic-dedup stress). */
  def embeddings(emb: DataFrame, k: Int): DataFrame =
    sharded(emb, "vec_id", k, emb.count())(s => Seq(
      "embedding" -> transform(col("embedding"),
        x => (x.cast("double") + lit(s * 1e-4)).cast("float"))))

  /** Lineitem: both join keys offset → k isolated co-occurrence
    * components (the graph harness shape). Both spans are derived from
    * the base data's own key maxima (a fixed orderkey span would
    * silently collide shards — merging components and distorting the
    * harness numbers — on any base with keys above it). */
  def lineitem(li: DataFrame, k: Int): DataFrame = {
    val maxes = li.agg(max(col("l_partkey")), max(col("l_orderkey"))).head()
    val pSpan = maxes.getLong(0) + 1
    val oSpan = maxes.getLong(1) + 1
    sharded(li, "l_orderkey", k, oSpan)(s => Seq(
      "l_partkey" -> (col("l_partkey") + lit(s * pSpan))))
  }

  /** Events: event and user ids offset → k× users, sessions scale
    * linearly. */
  def events(ev: DataFrame, k: Int): DataFrame = {
    val users = ev.agg(max(col("user_id"))).head().getLong(0) + 1
    sharded(ev, "event_id", k, ev.count())(s => Seq(
      "user_id" -> (col("user_id") + lit(s * users))))
  }
}
