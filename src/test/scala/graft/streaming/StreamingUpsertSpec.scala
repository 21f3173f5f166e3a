package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.olhovivo.SparkTestBase
import graft.operators.Upsert

/** Streaming CDC compaction: the final snapshot equals the one-shot
  * batch compaction regardless of micro-batch boundaries, and the
  * ping-pong publisher leaves only the two version directories. */
class StreamingUpsertSpec extends SparkTestBase {
  import spark.implicits._

  test("foreachBatch upsert converges to the batch compaction; two versions on disk") {
    val zone = Files.createTempDirectory("su_zone").toString
    val snap = Files.createTempDirectory("su_snap").toString
    val changes = (0 until 40)
      .map(i => (s"k${i % 7}", i.toLong, s"p$i"))
      .toDF("k", "seq", "payload")
    // one file per partition + maxFilesPerTrigger=1 → many micro-batches
    changes.repartition(5).write.mode("overwrite").json(zone)
    val stream = spark.readStream
      .schema("k STRING, seq LONG, payload STRING")
      .option("maxFilesPerTrigger", "1")
      .json(zone)
    val sink = new StreamingUpsert(spark, snap, Seq("k"), Seq("seq"))
    val q = stream.writeStream
      .foreachBatch((b: DataFrame, id: Long) => sink.mergeBatch(b, id))
      .start()
    try q.processAllAvailable()
    finally q.stop()
    val got = sink.snapshot().select($"k", $"seq", $"payload")
      .collect().map(_.toSeq).toSet
    val want = Upsert.compact(changes, Seq("k"), Seq("seq"))
      .select($"k", $"seq", $"payload").collect().map(_.toSeq).toSet
    assert(got == want)
    assert(got.size == 7) // one row per key
    // only the v0/v1 ping-pong dirs + the durable pointer exist
    val versions = new java.io.File(snap).listFiles.map(_.getName).toSet
    assert(versions.subsetOf(Set("v0", "v1", "_LIVE")), s"unexpected: $versions")
  }

  test("restart resumes from the durable pointer, not an empty snapshot") {
    val snap = Files.createTempDirectory("su_restart").toString
    val sink1 = new StreamingUpsert(spark, snap, Seq("k"), Seq("seq"))
    sink1.mergeBatch(Seq(("a", 1L, "x"), ("b", 2L, "y")).toDF("k", "seq", "payload"), 0)
    // a NEW instance (new JVM after failure) must see the published state
    val sink2 = new StreamingUpsert(spark, snap, Seq("k"), Seq("seq"))
    assert(sink2.snapshotPath == sink1.snapshotPath)
    sink2.mergeBatch(Seq(("a", 3L, "z")).toDF("k", "seq", "payload"), 1)
    val got = sink2.snapshot().collect()
      .map(r => r.getString(0) -> r.getString(2)).toMap
    assert(got == Map("a" -> "z", "b" -> "y")) // b survived the restart
  }

  test("checkpointed restart: offsets skip consumed files, snapshot carries over") {
    // phase 1: two zone files exist; the query checkpoints its offsets
    // and the sink publishes a durable snapshot. phase 2: a NEW query
    // (new sink instance — a new JVM in production) on the SAME
    // checkpoint dir sees only the file added in between, and merges it
    // onto the restored snapshot rather than starting empty.
    val zone = Files.createTempDirectory("su_ckpt_zone").toString
    val ckpt = Files.createTempDirectory("su_ckpt_meta").toString
    val snap = Files.createTempDirectory("su_ckpt_snap").toString
    def writeFile(name: String, rows: Seq[(String, Long, String)]): Unit = {
      val content = rows.map { case (k, s, p) =>
        s"""{"k":"$k","seq":$s,"payload":"$p"}""" }.mkString("\n")
      java.nio.file.Files.writeString(
        new java.io.File(zone, name).toPath, content): Unit
    }
    writeFile("f1.json", Seq(("a", 1L, "a1"), ("b", 1L, "b1")))
    writeFile("f2.json", Seq(("a", 2L, "a2")))
    def runOnce(): Unit = {
      val sink = new StreamingUpsert(spark, snap, Seq("k"), Seq("seq"))
      val q = spark.readStream
        .schema("k STRING, seq LONG, payload STRING")
        .option("maxFilesPerTrigger", "1")
        .json(zone)
        .writeStream
        .option("checkpointLocation", ckpt)
        .foreachBatch((b: org.apache.spark.sql.DataFrame, id: Long) =>
          sink.mergeBatch(b, id))
        .start()
      try q.processAllAvailable() finally q.stop()
    }
    runOnce()
    val afterPhase1 = new StreamingUpsert(spark, snap, Seq("k"), Seq("seq"))
      .snapshot().collect().map(r => r.getString(0) -> r.getString(2)).toMap
    assert(afterPhase1 == Map("a" -> "a2", "b" -> "b1"))
    // between runs: one more file lands
    writeFile("f3.json", Seq(("c", 1L, "c1"), ("a", 3L, "a3")))
    runOnce()
    val afterPhase2 = new StreamingUpsert(spark, snap, Seq("k"), Seq("seq"))
      .snapshot().collect().map(r => r.getString(0) -> r.getString(2)).toMap
    // b survived the restart (no reprocessing of f1/f2 needed), a and c advanced
    assert(afterPhase2 == Map("a" -> "a3", "b" -> "b1", "c" -> "c1"))
  }

  test("batch replay is idempotent — the exactly-once-on-retry posture") {
    // foreachBatch redelivers a batch after a failure/restart with the
    // SAME batchId; latest-wins merging makes the re-merge a no-op, so
    // the sink tolerates at-least-once delivery without dedup bookkeeping
    val snap = Files.createTempDirectory("su_retry").toString
    val sink = new StreamingUpsert(spark, snap, Seq("k"), Seq("seq"))
    val b0 = Seq(("a", 1L, "x"), ("b", 2L, "y")).toDF("k", "seq", "payload")
    val b1 = Seq(("a", 3L, "z")).toDF("k", "seq", "payload")
    sink.mergeBatch(b0, 0)
    sink.mergeBatch(b1, 1)
    val once = sink.snapshot().collect().map(_.toSeq).toSet
    sink.mergeBatch(b1, 1) // replay
    assert(sink.snapshot().collect().map(_.toSeq).toSet == once)
  }
}
