package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Schema-enforced readers and layout-aware writers (reference S3–S8,
  * SURVEY.md §2.1). Every read declares its schema — never inferSchema —
  * so missing fields surface as typed nulls instead of type drift
  * (§1.3), and every write is partitioned for downstream pruning.
  */
object IO {

  /** JSON scan with per-document corrupt isolation (reference F2):
    * PERMISSIVE mode routes broken documents into `_corrupt_record`
    * (the schema must carry that field). */
  def readJson(spark: SparkSession, schema: StructType, path: String,
               multiLine: Boolean = true): DataFrame =
    spark.read
      .schema(schema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .option("multiLine", multiLine.toString)
      .json(path)

  def readParquet(spark: SparkSession, schema: StructType, path: String): DataFrame =
    spark.read.schema(schema).parquet(path)

  def readCsv(spark: SparkSession, schema: StructType, path: String): DataFrame =
    spark.read.schema(schema).option("header", "true").csv(path)

  /** Hive-partitioned parquet sink (reference S7's manual
    * `raw/YYYY-MM/pos-YYYY-MM-DD` date keying as real partitioning —
    * downstream reads prune on the partition columns). */
  def writePartitionedParquet(df: DataFrame, path: String,
                              partitionCols: Seq[String]): Unit =
    df.write.mode("overwrite").partitionBy(partitionCols: _*).parquet(path)

  /** Hive-partitioned JSON landing zone (reference S3's
    * `posicoes/year=/month=/day=/hour=/` scheme — get-bus-data.py:65
    * already uses k=v keys, i.e. Hive partitioning by accident). */
  def writePartitionedJson(df: DataFrame, path: String,
                           partitionCols: Seq[String]): Unit =
    df.write.mode("overwrite").partitionBy(partitionCols: _*).json(path)

  /** Headered CSV sink (reference S8 — the three analytical outputs). */
  def writeCsv(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").option("header", "true").csv(path)

  /** ORC scan/sink (beyond the reference's formats — completes the
    * columnar-format surface; ORC ships in spark-sql). Same posture as
    * parquet: declared schema on read, partitioned writes for pruning. */
  def readOrc(spark: SparkSession, schema: StructType, path: String): DataFrame =
    spark.read.schema(schema).orc(path)

  def writePartitionedOrc(df: DataFrame, path: String,
                          partitionCols: Seq[String]): Unit =
    df.write.mode("overwrite").partitionBy(partitionCols: _*).orc(path)

  /** Small-file compaction: rewrite a parquet dataset into
    * size-targeted files. Streaming/poll-style ingestion (the
    * reference's per-poll JSON → per-batch parquet) accumulates
    * thousands of KB-scale files per day; at 100 TB the resulting
    * driver listing + task-per-file overhead dominates scan time, so
    * periodic compaction is a standard maintenance pass.
    *
    * The output file count comes from the INPUT's actual byte size
    * (filesystem listing, no data pass), and the rewrite uses
    * `coalesce` — merging adjacent splits WITHOUT a shuffle — so the
    * cost is one read + one write. Returns the output file count. */
  def compactParquet(spark: SparkSession, schema: StructType,
                     inPath: String, outPath: String,
                     targetFileBytes: Long = 128L * 1024 * 1024): Int = {
    require(targetFileBytes > 0)
    val df = readParquet(spark, schema, inPath)
    val hadoopConf = spark.sparkContext.hadoopConfiguration
    val totalBytes = df.inputFiles.map { f =>
      val p = new org.apache.hadoop.fs.Path(f)
      p.getFileSystem(hadoopConf).getFileStatus(p).getLen
    }.sum
    val planned = math.max(1L, (totalBytes + targetFileBytes - 1) / targetFileBytes)
      .min(Int.MaxValue).toInt
    df.coalesce(planned).write.mode("overwrite").parquet(outPath)
    // Report the file count actually COMMITTED, by listing the output:
    // probing the plan's RDD before the write would (a) materialize
    // upstream stages a second time under AQE and (b) report a
    // partitioning AQE may re-decide for the write's own execution.
    val outDir = new org.apache.hadoop.fs.Path(outPath)
    outDir.getFileSystem(hadoopConf).listStatus(outDir)
      .count(st => st.getPath.getName.startsWith("part-"))
  }
}
