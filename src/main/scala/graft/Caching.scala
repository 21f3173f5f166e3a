package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Cache-lifetime management for operators that persist internal
  * intermediates (posting lists, LSH signature relations).
  *
  * A lazy operator cannot unpersist its own intermediates — they must
  * outlive the caller's action — so the LIFETIME is the caller's choice:
  *
  *   - [[CacheScope.unmanaged]] (operator default): persists stay until
  *     `spark.catalog.clearCache()` or session end. Right for
  *     interactive sessions that re-consume the same operator output.
  *   - [[CacheScope.scoped]] + `materializeAndRelease`: execute the
  *     plan once into an eager checkpoint (downstream actions read the
  *     checkpoint — no recompute), then unpersist every intermediate
  *     registered in the scope, even on failure. Nothing is left behind
  *     in the session CacheManager; the checkpoint's own blocks are
  *     reclaimed by Spark's ContextCleaner once the returned frame is
  *     unreferenced. Materialization goes through [[Checkpoints.eager]]:
  *     localCheckpoint by default, reliable `checkpoint` when
  *     `spark.graft.checkpoint.dir` is set (recompute-on-executor-loss
  *     vs durability is the caller's conf choice, not a code edit).
  *
  * Every gate query entry uses the scoped form, so a full
  * `SparkEntry.queries` sweep leaves the CacheManager empty
  * (CachingSpec asserts this).
  */
trait CacheScope {
  /** Persist an operator-internal intermediate under this scope. */
  def cache(df: DataFrame): DataFrame
}

object CacheScope {

  /** Session-lifetime persists; caller manages clearCache(). */
  val unmanaged: CacheScope = new CacheScope {
    override def cache(df: DataFrame): DataFrame =
      df.persist(StorageLevel.MEMORY_AND_DISK)
  }

  def scoped(): Scoped = new Scoped

  /** Single-threaded use only: one scope belongs to one query build. */
  final class Scoped extends CacheScope {
    private val frames = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    private val produced = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    private val intermediates = scala.collection.mutable.ArrayBuffer.empty[DataFrame]

    override def cache(df: DataFrame): DataFrame = {
      frames += df
      df.persist(StorageLevel.MEMORY_AND_DISK)
    }

    /** Register an eagerly-CHECKPOINTED intermediate (e.g. an iterative
      * operator's final round): its backing files are deleted as soon as
      * [[materializeAndRelease]] finishes — the result's own checkpoint
      * no longer reads from it. Without this, a reliable-mode query that
      * checkpoints mid-build leaks one |data|-sized directory per call
      * until the blunt session-wide [[Checkpoints.releaseAll]]. */
    def trackIntermediate(ck: DataFrame): DataFrame = {
      intermediates += ck
      ck
    }

    /** Run `result` to completion (eager checkpoint), release every
      * cached intermediate, return the materialized frame. Intermediates
      * are released even when the action throws — a failed query must
      * not leave session-lifetime persists behind. Uses a reliable
      * `checkpoint` when [[Checkpoints.DirKey]] is configured,
      * `localCheckpoint` otherwise. The checkpoint is tracked by this
      * scope; see [[releaseConsumed]]. */
    def materializeAndRelease(result: DataFrame): DataFrame = {
      val ck =
        try Checkpoints.eager(result)
        finally {
          frames.foreach(_.unpersist(blocking = false))
          frames.clear()
          intermediates.foreach(Checkpoints.release)
          intermediates.clear()
        }
      produced += ck
      ck
    }

    /** Caller's consumption signal: delete the reliable-checkpoint files
      * behind every frame this scope materialized. In reliable mode each
      * `materializeAndRelease` leaves one checkpoint on the configured
      * dir for the caller to consume; a sweep harness cleans those with
      * the blunt session-wide [[Checkpoints.releaseAll]], but a library
      * caller running scoped queries CONCURRENTLY must release only its
      * own — this is that per-scope release. No-op in localCheckpoint
      * mode (ContextCleaner reclaims blocks). The materialized frames
      * must not be re-consumed afterwards. */
    def releaseConsumed(): Unit = {
      produced.foreach(Checkpoints.release)
      produced.clear()
    }
  }
}
