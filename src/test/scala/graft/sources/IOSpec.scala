package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.olhovivo.SparkTestBase

class IOSpec extends SparkTestBase {
  import spark.implicits._

  test("orc round-trip preserves values; partition column prunes the scan") {
    val dir = Files.createTempDirectory("graft_orc").toString
    val df = Seq(
      ("2024-01-01", 1L, 1.5),
      ("2024-01-01", 2L, 2.5),
      ("2024-01-02", 3L, 3.5)
    ).toDF("day", "id", "v")
    IO.writePartitionedOrc(df, dir, Seq("day"))

    val schema = StructType(Seq(
      StructField("id", LongType), StructField("v", DoubleType),
      StructField("day", StringType)))
    val back = IO.readOrc(spark, schema, dir)
    assert(back.count() == 3)
    val day1 = back.filter(col("day") === "2024-01-01")
    assert(day1.collect().map(_.getAs[Long]("id")).sorted.toSeq == Seq(1L, 2L))
    // partition pruning: the filtered plan reads one partition directory
    val planStr = day1.queryExecution.executedPlan.toString
    assert(planStr.contains("PartitionFilters"), s"no partition filters:\n$planStr")
  }

  test("compaction merges a many-small-file dataset without losing rows") {
    val in = scratchDir("compact-in").toString
    val out = scratchDir("compact-out").toString
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("v", StringType)))
    // 24 tiny files — the poll-ingestion shape
    spark.range(0, 2400).select(col("id"), concat(lit("v"), col("id")).as("v"))
      .repartition(24).write.mode("overwrite").parquet(in)
    val inFiles = IO.readParquet(spark, schema, in).inputFiles.length
    assert(inFiles == 24, s"fixture expected 24 files, got $inFiles")
    // a large target → everything fits one file
    val n = IO.compactParquet(spark, schema, in, out, targetFileBytes = 1L << 30)
    assert(n == 1)
    val compacted = IO.readParquet(spark, schema, out)
    assert(compacted.inputFiles.length == 1)
    assert(compacted.count() == 2400)
    assert(compacted.agg(sum(col("id"))).head.getLong(0) == 2399L * 2400 / 2)
    // a small target splits the rewrite into multiple sized files
    val out2 = scratchDir("compact-out2").toString
    val n2 = IO.compactParquet(spark, schema, in, out2, targetFileBytes = 8192)
    assert(n2 > 1, s"8 KiB target over ~24 small files must yield several outputs, got $n2")
    assert(IO.readParquet(spark, schema, out2).count() == 2400)
  }

  test("orc declared schema surfaces missing fields as typed nulls, not drift") {
    val dir = Files.createTempDirectory("graft_orc2").toString
    Seq((1L, "x")).toDF("id", "present").write.mode("overwrite").orc(dir)
    val schema = StructType(Seq(
      StructField("id", LongType),
      StructField("missing_col", StringType)))
    val back = IO.readOrc(spark, schema, dir).collect()
    assert(back.length == 1 && back.head.getLong(0) == 1L && back.head.isNullAt(1))
  }
}
