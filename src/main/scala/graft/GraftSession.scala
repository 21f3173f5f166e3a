package graft

import org.apache.spark.sql.SparkSession

/** Central SparkSession factory so Bench/Verify/tests/jobs share one
  * scale-aware configuration.
  *
  * Design notes (100 TB north star):
  *  - `spark.sql.shuffle.partitions` is sized to the local core count here;
  *    on a real cluster AQE (`spark.sql.adaptive.enabled`) re-coalesces
  *    post-shuffle partitions, so the static value only seeds the first
  *    shuffle. All operators in this library key their shuffles on
  *    low-skew columns and rely on AQE skew-join splitting otherwise.
  *  - Session timezone is pinned to UTC: the reference pipeline parses
  *    naive UTC timestamps (reference: etl-olho-vivo-ingestao-posicoes.py:58
  *    runs on Lambda with TZ=UTC), and the DuckDB oracle also runs in UTC.
  */
object GraftSession {

  /** Monitor for temporary session-global conf changes (e.g. a streaming
    * query resizing `spark.sql.shuffle.partitions` to its state volume,
    * a test setting the durable checkpoint dir). A SparkSession is shared
    * across concurrent callers via getOrCreate, so any set→use→restore
    * span must hold this lock or unrelated work plans with the temporary
    * value. Test suites alias this same object (SparkTestBase). */
  val sessionConfLock: Object = new Object

  def local(cores: String = "*", shufflePartitions: Option[Int] = None): SparkSession = {
    val parts = shufflePartitions.getOrElse(
      if (cores == "*") Runtime.getRuntime.availableProcessors() else cores.toInt)
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .appName("graft")
      .withExtensions(new graft.functions.GraftExtensions)
      .config("spark.sql.shuffle.partitions", parts.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.ui.enabled", "false")
      // The driver testdata's `events` table carries parquet TIMESTAMP(NANOS),
      // which Spark only reads as a raw long (SPARK-40819). Tables.events()
      // rebuilds a proper TimestampType column from it.
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftExtensions.register(spark)
    spark
  }

  /** Apply the must-have configs to an externally built session (e.g. the
    * driver's own). Runtime-settable confs + function registration only. */
  def tune(spark: SparkSession): SparkSession = {
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    graft.functions.GraftExtensions.register(spark)
    spark
  }
}
