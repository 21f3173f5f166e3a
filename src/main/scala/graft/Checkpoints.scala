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

  // last DirKey value applied, PER SparkContext: getCheckpointDir
  // returns dir/<uuid>, so the conf value itself must be tracked to
  // detect a mid-session change (which must take effect, not be
  // silently ignored). Keyed by context — a process hosting several
  // contexts (parallel test suites) must not let one context's dir
  // suppress another's setCheckpointDir. The map doubles as the lock
  // for the check-and-set.
  //
  // CONTRACT: one configured checkpoint dir per SparkContext at a time.
  // The checkpoint dir is context-level state, so two sessions of the
  // SAME context concurrently running eager() with DIFFERENT DirKey
  // values cannot both be honored — the applications are serialized
  // here, but a checkpoint started after the other session's set lands
  // under that session's dir. Mid-session changes are fine when eager()
  // calls don't overlap.
  private val applied =
    new java.util.WeakHashMap[org.apache.spark.SparkContext, String]()

  // Reliable-checkpoint files created by eager() that have not been
  // release()d yet, per context. Operators release the rounds they
  // supersede themselves; the checkpoint a query RETURNS, though,
  // outlives the operator (the caller still has to consume it), so a
  // long session sweeping many queries would otherwise accumulate one
  // checkpoint per query per run — releaseAll() is the sweep-level
  // cleanup for exactly that caller.
  private val live = new java.util.WeakHashMap[
    org.apache.spark.SparkContext, scala.collection.mutable.Set[String]]()

  private def checkpointFile(df: DataFrame): Option[String] =
    df.queryExecution.analyzed match {
      case l: org.apache.spark.sql.execution.LogicalRDD => l.rdd.getCheckpointFile
      case _ => None
    }

  /** Dev-only plan archiving (PlanDump): when the system property
    * `graft.plandump.dir` is set, every plan [[eager]] is about to
    * materialize is ALSO written (formatted) to a numbered file under
    * that directory — checkpoint-materialized queries otherwise show
    * only a LogicalRDD scan to explain(), hiding the machinery the
    * optimization evidence needs. Never set by Bench/Verify/driver. */
  val PlanDumpProp = "graft.plandump.dir"
  private val planDumpSeq = new java.util.concurrent.atomic.AtomicInteger(0)

  private def dumpPlan(df: DataFrame): Unit =
    Option(System.getProperty(PlanDumpProp)).filter(_.nonEmpty).foreach { d =>
      val n = planDumpSeq.incrementAndGet()
      val w = new java.io.PrintWriter(f"$d/ck$n%02d.txt")
      try w.println(df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
      finally w.close()
    }

  /** Eagerly materialize `df`, truncating lineage: reliable
    * `checkpoint` when [[DirKey]] is set, `localCheckpoint` otherwise.
    * The SparkContext checkpoint dir follows the conf value, including
    * mid-session changes. */
  def eager(df: DataFrame): DataFrame = {
    dumpPlan(df)
    eagerImpl(df)
  }

  private def eagerImpl(df: DataFrame): DataFrame =
    configuredDir(df.sparkSession) match {
      case Some(d) =>
        val sc = df.sparkSession.sparkContext
        applied.synchronized {
          if (sc.getCheckpointDir.isEmpty || applied.get(sc) != d) {
            sc.setCheckpointDir(d)
            applied.put(sc, d)
          }
        }
        val ck = df.checkpoint(eager = true)
        checkpointFile(ck).foreach { p =>
          live.synchronized {
            var s = live.get(sc)
            if (s == null) { s = scala.collection.mutable.Set.empty[String]; live.put(sc, s) }
            s += p: Unit
          }
        }
        ck
      case None =>
        df.localCheckpoint(eager = true)
    }

  private def delete(spark: SparkSession, p: String): Unit = {
    val path = new org.apache.hadoop.fs.Path(p)
    path.getFileSystem(spark.sparkContext.hadoopConfiguration)
      .delete(path, true): Unit
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
    checkpointFile(df).foreach { p =>
      live.synchronized {
        Option(live.get(df.sparkSession.sparkContext)).foreach(_ -= p)
      }
      delete(df.sparkSession, p)
    }

  /** Delete EVERY still-live reliable checkpoint of this session's
    * context — the end-of-consumption cleanup for callers that sweep
    * many queries (Verify/Bench do this between queries, alongside
    * clearCache): once a query's output has been written/collected, the
    * checkpoint it returned has served its purpose. Frames returned by
    * earlier eager() calls must not be re-consumed afterwards. */
  def releaseAll(spark: SparkSession): Unit = {
    val paths = live.synchronized {
      Option(live.get(spark.sparkContext)) match {
        case Some(s) => val snap = s.toVector; s.clear(); snap
        case None    => Vector.empty
      }
    }
    paths.foreach(delete(spark, _))
  }
}
