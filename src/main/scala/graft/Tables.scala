package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Schema-pinned loaders for the driver testdata under
  * `/root/testdata/sf{0.001,0.01,0.1}` — tables region, nation, customer,
  * supplier, part, orders, lineitem, events, documents, embeddings
  * (see TESTDATA.md).
  *
  * Loaders go through `spark.read.parquet` with the file's own schema
  * (parquet is self-describing; we do NOT infer from data) and normalize
  * the one irregular table: `events` carries parquet TIMESTAMP(NANOS),
  * unreadable by Spark's converter, so it is read as a raw nanosecond long
  * (spark.sql.legacy.parquet.nanosAsLong, set in GraftSession) and rebuilt
  * here into a proper micros TimestampType plus the exact ns long.
  *
  * Scale note: at 100 TB these reads become partitioned-directory scans;
  * nothing here materializes or collects — every loader returns a lazy
  * DataFrame whose filters/projections push into the parquet scan.
  */
object Tables {

  val starTables: Seq[String] =
    Seq("region", "nation", "customer", "supplier", "part", "orders", "lineitem")
  val allTables: Seq[String] =
    starTables ++ Seq("events", "documents", "embeddings")

  def path(dir: String, name: String): String = s"$dir/$name.parquet"

  def table(spark: SparkSession, dir: String, name: String): DataFrame = name match {
    case "events" => events(spark, dir)
    case _        => spark.read.parquet(path(dir, name))
  }

  def region(spark: SparkSession, dir: String): DataFrame     = table(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame     = table(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame   = table(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame   = table(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame       = table(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame     = table(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame   = table(spark, dir, "lineitem")
  def documents(spark: SparkSession, dir: String): DataFrame  = table(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "embeddings")

  /** Spread a narrow scan across the cluster's cores before CPU-heavy
    * per-row stages. The testdata ships as single-row-group parquet →
    * one input split, so expression-heavy stages (signatures, cosines)
    * would otherwise run single-threaded; on a real cluster multi-file
    * inputs make this a no-op decision (`getNumPartitions` already ≥
    * parallelism). Rows unchanged. */
  def spread(spark: SparkSession, df: DataFrame): DataFrame = {
    val target = spark.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < target) df.repartition(target) else df
  }

  /** `events` with: `ts_ns` (exact nanosecond epoch, LongType), `ts`
    * (TimestampType, micros), `ts_sec` (epoch seconds, LongType) — the
    * three granularities different operators want.
    *
    * Schema-adaptive: driver builds have shipped `ts` both as parquet
    * TIMESTAMP(NANOS) (readable only as a raw long via
    * spark.sql.legacy.parquet.nanosAsLong — SPARK-40819) and as
    * micros-precision TIMESTAMP_NTZ (naive UTC). Both normalize to the
    * same three-column contract; the session TZ is pinned UTC so the
    * NTZ→instant cast is the identity the DuckDB oracle applies. */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(path(dir, "events"))
    val tsField = raw.schema("ts").dataType
    val withNs = tsField match {
      case org.apache.spark.sql.types.LongType => // TIMESTAMP(NANOS) as raw ns long
        raw.withColumnRenamed("ts", "ts_ns")
          .withColumn("ts", timestamp_micros(expr("ts_ns div 1000")))
      case org.apache.spark.sql.types.TimestampType |
           org.apache.spark.sql.types.TimestampNTZType =>
        // micros precision; session TZ pinned UTC makes the NTZ cast
        // the identity instant mapping
        raw.withColumn("ts", col("ts").cast("timestamp"))
          .withColumn("ts_ns", unix_micros(col("ts")) * lit(1000L))
      case other =>
        // loud, not a silent `.cast("timestamp")` → nulls: a third
        // driver ts format (string? INT96?) must fail at the reader
        // seam, where the fix belongs — that is this round's lesson
        // from the NANOS→NTZ surprise
        throw new IllegalStateException(
          s"events.ts has unsupported parquet type ${other.catalogString}; " +
            "extend Tables.events for this driver build")
    }
    withNs.withColumn("ts_sec", expr("ts_ns div 1000000000"))
  }
}
