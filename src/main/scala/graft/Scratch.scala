package graft

import org.apache.spark.sql.SparkSession

/** Dev-only harness: time a subset of gate queries (args) on a given SF
  * dir, optionally printing the formatted plan. Not part of the driver
  * contract. Usage: runMain graft.Scratch <sfDir> [explain] q43 q45 ... */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val explain = args.contains("explain")
    val names = args.drop(1).filterNot(_ == "explain")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_PARTS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftExtensions.register(spark)
    // SPARK_GRAFT_STAGES=1 → per-stage wall/task summary after each run
    if (sys.env.contains("SPARK_GRAFT_STAGES"))
      spark.sparkContext.addSparkListener(
        new org.apache.spark.scheduler.SparkListener {
          // per-stage max/sum task durations — straggler visibility
          private val maxMs = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
          private val sumMs = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
          override def onTaskEnd(
              te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
            val d = te.taskInfo.duration
            maxMs.merge(te.stageId, d, math.max(_, _)): Unit
            sumMs.merge(te.stageId, d, _ + _): Unit
            if (d > 2000)
              println(f"    TASK stage=${te.stageId} idx=${te.taskInfo.index} " +
                f"${d / 1e3}%.1fs records=${Option(te.taskMetrics).map(_.inputMetrics.recordsRead).getOrElse(-1L)}")
          }
          override def onStageCompleted(
              sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
            val i = sc.stageInfo
            val wall = (i.completionTime.getOrElse(0L) -
              i.submissionTime.getOrElse(0L)) / 1e3
            val mx = maxMs.getOrDefault(i.stageId, 0L) / 1e3
            val sm = sumMs.getOrDefault(i.stageId, 0L) / 1e3
            if (wall > 1.0)
              println(f"  STAGE ${i.stageId}%4d ${i.numTasks}%5d tasks " +
                f"wall=$wall%7.1fs maxTask=$mx%6.1fs sumTask=$sm%7.1fs  " +
                i.name.takeWhile(_ != '\n').take(80))
          }
        })
    val sel = SparkEntry.queries.filter { case (k, _) =>
      names.isEmpty || names.exists(k.startsWith) }
    sel.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val df = fn(spark, sfDir)
      if (explain) { println(s"===== $name plan"); df.explain("formatted") }
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      val t1 = (System.nanoTime() - t0) / 1e9
      // second run to split plan-vs-execute and caching effects
      val t0b = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      val t1b = (System.nanoTime() - t0b) / 1e9
      println(f"$name%-22s run1=$t1%8.2fs run2=$t1b%8.2fs")
    }
    spark.stop()
  }
}
