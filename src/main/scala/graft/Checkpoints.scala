package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The durable-checkpoint seam: every operator that truncates lineage
  * (scoped cache release, connected-components rounds) materializes
  * through [[eager]] instead of calling `localCheckpoint` directly.
  *
  * By default [[eager]] takes an eager `localCheckpoint` — right for
  * local mode and for interactive clusters where recompute-on-executor-
  * loss is an acceptable trade for speed. For long-running 100 TB jobs
  * set [[DirKey]] in the session conf (runtime-settable, no restart):
  * materialization switches to a RELIABLE `checkpoint` written under
  * that directory (HDFS/S3), which survives executor loss — the
  * standard posture for multi-hour iterative jobs where losing round
  * state means re-running from the scan.
  */
object Checkpoints {

  /** Session conf key: directory for reliable checkpoints. Unset or
    * empty → localCheckpoint. */
  val DirKey = "spark.graft.checkpoint.dir"

  def configuredDir(spark: SparkSession): Option[String] =
    spark.conf.getOption(DirKey).filter(_.trim.nonEmpty)

  // last DirKey value applied to the SparkContext: getCheckpointDir
  // returns dir/<uuid>, so the conf value itself must be tracked to
  // detect a mid-session change (which must take effect, not be
  // silently ignored)
  private val applied = new java.util.concurrent.atomic.AtomicReference[String](null)

  /** Eagerly materialize `df`, truncating lineage: reliable
    * `checkpoint` when [[DirKey]] is set, `localCheckpoint` otherwise.
    * The SparkContext checkpoint dir follows the conf value, including
    * mid-session changes. */
  def eager(df: DataFrame): DataFrame =
    configuredDir(df.sparkSession) match {
      case Some(d) =>
        val sc = df.sparkSession.sparkContext
        if (sc.getCheckpointDir.isEmpty || applied.get != d) {
          sc.setCheckpointDir(d)
          applied.set(d)
        }
        df.checkpoint(eager = true)
      case None =>
        df.localCheckpoint(eager = true)
    }

  /** Delete a SUPERSEDED reliable checkpoint's files. Spark only
    * auto-cleans checkpoints when
    * spark.cleaner.referenceTracking.cleanCheckpoints is set BEFORE the
    * context starts (default false), so an iterative operator that
    * checkpoints every round would otherwise accumulate rounds × |data|
    * under the checkpoint dir for the life of the job — call this on
    * round N's frame once round N+1 is materialized. No-op for
    * localCheckpoint frames (block-based; the ContextCleaner reclaims
    * them) and for frames that aren't checkpoints at all. */
  def release(df: DataFrame): Unit =
    df.queryExecution.analyzed match {
      case l: org.apache.spark.sql.execution.LogicalRDD =>
        l.rdd.getCheckpointFile.foreach { p =>
          val path = new org.apache.hadoop.fs.Path(p)
          path.getFileSystem(df.sparkSession.sparkContext.hadoopConfiguration)
            .delete(path, true): Unit
        }
      case _ => ()
    }
}
