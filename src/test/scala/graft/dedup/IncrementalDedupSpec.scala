package graft.dedup

import org.apache.spark.sql.functions._

import graft.olhovivo.SparkTestBase

/** Two-batch incremental dedup: day 1 builds the parquet signature
  * store; day 2 is probed against it without touching day-1 text. */
class IncrementalDedupSpec extends SparkTestBase {
  import spark.implicits._

  private val day1 = Seq(
    (10L, "the quick brown fox jumps over the lazy dog and keeps running"),
    (11L, "completely unrelated text about spark catalyst optimizers"),
    (12L, "ab") // too short to shingle — exact-only path
  ).toDF("doc_id", "text")

  private val day2 = Seq(
    (20L, "the quick brown fox jumps over the lazy dog and keeps running"), // exact dup of 10
    (21L, "the quick brown fox jumps over the lazy cat and keeps running"), // near dup of 10
    (22L, "entirely new content that matches nothing in the store"),        // unique
    (23L, "ab"),                                                            // exact dup of 12 (short doc)
    (24L, "xy")                                                             // unique short doc
  ).toDF("doc_id", "text")

  test("exact dups, near dups, uniques, and short docs classify against the store") {
    val storePath = scratchDir("sigstore").resolve("store").toString
    IncrementalDedup.signatureStore(day1, "doc_id", $"text")
      .write.parquet(storePath)
    val store = spark.read.parquet(storePath)
    // short doc stored with null sig, still exact-matchable
    assert(store.filter($"doc_id" === 12L && $"sig".isNull).count() == 1)

    val got = IncrementalDedup.dedupAgainstStore(day2, store, "doc_id", $"text")
      .collect().map(r => r.getLong(0) -> ((r.getString(1), Option(r.get(2))))).toMap
    assert(got(20L) == ("exact_dup", Some(10L)), s"got ${got(20L)}")
    assert(got(21L)._1 == "near_dup" && got(21L)._2.contains(10L), s"got ${got(21L)}")
    assert(got(22L) == ("unique", None), s"got ${got(22L)}")
    assert(got(23L) == ("exact_dup", Some(12L)), s"got ${got(23L)}")
    assert(got(24L) == ("unique", None), s"got ${got(24L)}")
  }

  test("store append round-trip: day-2 uniques join the store and dedup day 3") {
    val base = scratchDir("sigstore2")
    val storePath = base.resolve("store").toString
    IncrementalDedup.signatureStore(day1, "doc_id", $"text")
      .write.parquet(storePath)
    val uniques = day2.join(
      IncrementalDedup.dedupAgainstStore(day2, spark.read.parquet(storePath),
        "doc_id", $"text").filter($"status" === "unique").select($"doc_id"),
      Seq("doc_id"), "left_semi")
    IncrementalDedup.signatureStore(uniques, "doc_id", $"text")
      .write.mode("append").parquet(storePath)
    val day3 = Seq(
      (30L, "entirely new content that matches nothing in the store"), // dup of day-2 unique 22
      (31L, "never seen before anywhere")
    ).toDF("doc_id", "text")
    val got = IncrementalDedup.dedupAgainstStore(day3, spark.read.parquet(storePath),
        "doc_id", $"text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got(30L) == "exact_dup")
    assert(got(31L) == "unique")
  }
}
