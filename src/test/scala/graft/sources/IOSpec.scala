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

  test("schema evolution: widened declared schema reads old+new parquet with typed nulls") {
    // the 100 TB reality: a long-lived table gains columns; files written
    // before the change must stay readable with the WIDENED schema, the
    // missing column surfacing as typed nulls per-file (the same posture
    // the engine takes for missing JSON fields — declared schema, never
    // inference)
    val dir = Files.createTempDirectory("graft_evolve").toString
    Seq((1L, "a")).toDF("id", "v1")
      .write.mode("overwrite").parquet(s"$dir/p=old")
    Seq((2L, "b", 9.5)).toDF("id", "v1", "v2_added")
      .write.mode("overwrite").parquet(s"$dir/p=new")
    val widened = StructType(Seq(
      StructField("id", LongType),
      StructField("v1", StringType),
      StructField("v2_added", DoubleType)))
    val back = IO.readParquet(spark, widened, s"$dir/p=*")
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), Option(r.get(2))))).toMap
    assert(back(1L) == (("a", None)))        // old file: typed null
    assert(back(2L) == (("b", Some(9.5))))   // new file: real value
  }
}
