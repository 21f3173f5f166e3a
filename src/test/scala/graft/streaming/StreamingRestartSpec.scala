package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.olhovivo.SparkTestBase

/** Restart-from-checkpoint for the two STATEFUL streaming shapes the
  * gate runs one-shot (q89 session windows, q94 stream-stream join): at
  * 100 TB these are multi-hour queries that WILL restart, and the
  * checkpoint must carry (a) source offsets, (b) operator state, and
  * (c) the file sink's exactly-once commit log. Each test kills the
  * query mid-stream, adds data, restarts on the SAME checkpoint, and
  * asserts the final committed output equals an UNINTERRUPTED run of
  * the identical query over the complete input — the only acceptable
  * definition of "survived the restart".
  *
  * State-restoration is load-bearing in both: the session test holds
  * every phase-1 session in state (1-day watermark, nothing emitted
  * before the sentinel) and SPLITS one session across the restart; the
  * join test delivers purchases after the restart that only match
  * clicks buffered in phase-1 join state.
  */
class StreamingRestartSpec extends SparkTestBase {

  private def writeJson(dir: java.io.File, name: String, rows: Seq[String],
                        mtime: Long): Unit = {
    dir.mkdirs()
    val f = new java.io.File(dir, name)
    java.nio.file.Files.writeString(f.toPath, rows.mkString("\n")): Unit
    require(f.setLastModified(mtime), s"cannot set mtime on $f")
  }

  /** Committed rows only: reading the directory honors the file sink's
    * _spark_metadata exactly-once log. */
  private def committed(path: String): Set[Seq[Any]] =
    spark.read.parquet(path).collect().map(_.toSeq).toSet

  test("session windows: kill, add files, restart == uninterrupted run") {
    val base = scratchDir("sess-restart").toFile
    val zone = new java.io.File(base, "zone")
    val t0 = 1700000000L
    def sessionRows(s: Int, extraAt: Option[Long] = None): Seq[String] =
      (for (u <- 0 until 4; k <- 0 until 3)
        yield s"""{"user_id":$u,"event_id":${s * 100 + u * 10 + k},"ets":${t0 + s * 4000 + k * 400},"value":1.5}""") ++
        extraAt.toSeq.flatMap(t =>
          (0 until 4).map(u => s"""{"user_id":$u,"event_id":${900 + u},"ets":$t,"value":1.5}"""))
    val now = System.currentTimeMillis()
    def run(ckpt: String, out: String): Unit = {
      val stream = spark.readStream
        .schema("user_id LONG, event_id LONG, ets LONG, value DOUBLE")
        .option("maxFilesPerTrigger", "1")
        .json(zone.toString)
        .withColumn("event_time", timestamp_seconds(col("ets")))
        .withWatermark("event_time", "1 day")
      val q = stream
        .groupBy(session_window(col("event_time"), "30 minutes"), col("user_id"))
        .agg(count(lit(1)).as("n_events"), round(sum(col("value")), 2).as("sum_value"))
        .select(col("user_id"),
          unix_timestamp(col("session_window.start")).as("start_sec"),
          col("n_events"), col("sum_value"))
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .start()
      try q.processAllAvailable() finally q.stop()
    }
    // phase 1: sessions 0 and 1 — with the 1-day watermark NOTHING is
    // emitted yet; all of it lives in the state store at the kill point
    writeJson(zone, "f1.json", sessionRows(0), now - 40000)
    writeJson(zone, "f2.json", sessionRows(1), now - 30000)
    val ckpt = new java.io.File(base, "ckpt").toString
    val out = new java.io.File(base, "out").toString
    run(ckpt, out)
    // between runs: session 1 CONTINUES (gap 400 < 1800 onto restored
    // state), session 2 arrives whole, and the far-future sentinel
    // closes every session for append emission
    writeJson(zone, "f3.json",
      sessionRows(2, extraAt = Some(t0 + 4000 + 2 * 400 + 400)), now - 20000)
    writeJson(zone, "zz_sentinel.json",
      Seq(s"""{"user_id":-1,"event_id":-1,"ets":${t0 + 86400L * 10},"value":0.0}"""),
      now - 10000)
    run(ckpt, out) // restart on the SAME checkpoint
    val restarted = committed(out)
    // uninterrupted reference: identical query, fresh checkpoint+output,
    // over the now-complete zone
    val refOut = new java.io.File(base, "ref_out").toString
    run(new java.io.File(base, "ref_ckpt").toString, refOut)
    val uninterrupted = committed(refOut)
    assert(restarted == uninterrupted,
      s"restarted run diverged: ${restarted.size} vs ${uninterrupted.size} rows")
    // the boundary-split session merged: session 1 has 4 events (3+1)
    val sess1 = spark.read.parquet(out)
      .filter(col("user_id") === 0 && col("start_sec") === (t0 + 4000))
      .select(col("n_events")).collect().map(_.getLong(0)).toSeq
    assert(sess1 == Seq(4L),
      s"session split across the restart did not merge onto restored state: $sess1")
    assert(restarted.count(_.head != -1L) == 12,
      s"expected 12 real sessions, got ${restarted.count(_.head != -1L)}")
  }

  test("streaming dedup: duplicate state survives the restart") {
    // the q77 shape (StreamingDedup.dedupStream): a duplicate of a
    // PHASE-1 document arriving after the restart must be dropped by
    // RESTORED dedup state — re-emitting it would double-ingest at
    // 100 TB every time a multi-hour ingestion query restarts
    val base = scratchDir("dedup-restart").toFile
    val zone = new java.io.File(base, "zone")
    val t0 = 1700000000L
    def row(id: Long, text: String, ets: Long): String =
      s"""{"doc_id":$id,"text":"$text","ets":$ets}"""
    val now = System.currentTimeMillis()
    def run(ckpt: String, out: String): Unit = {
      val stream = spark.readStream
        .schema("doc_id LONG, text STRING, ets LONG")
        .option("maxFilesPerTrigger", "1")
        .json(zone.toString)
        .withColumn("event_time", timestamp_seconds(col("ets")))
      val q = StreamingDedup
        .dedupStream(stream, col("text"), "event_time", "1 day")
        .select(col("doc_id"), col("text"))
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .start()
      try q.processAllAvailable() finally q.stop()
    }
    // phase 1: three distinct texts plus an in-phase duplicate of "aa"
    writeJson(zone, "f1.json",
      Seq(row(1, "aa", t0), row(2, "bb", t0 + 10)), now - 40000)
    writeJson(zone, "f2.json",
      Seq(row(3, "aa", t0 + 20), row(4, "cc", t0 + 30)), now - 30000)
    val ckpt = new java.io.File(base, "ckpt").toString
    val out = new java.io.File(base, "out").toString
    run(ckpt, out)
    val phase1 = committed(out)
    assert(phase1.map(_(1)) == Set[Any]("aa", "bb", "cc"),
      s"phase 1 must emit one row per distinct text: $phase1")
    // between runs: a duplicate of phase-1 "bb" (within the watermark)
    // and a genuinely new "dd"
    writeJson(zone, "f3.json",
      Seq(row(5, "bb", t0 + 40), row(6, "dd", t0 + 50)), now - 20000)
    run(ckpt, out) // restart on the SAME checkpoint
    val restarted = committed(out)
    // uninterrupted reference over the complete zone
    val refOut = new java.io.File(base, "ref_out").toString
    run(new java.io.File(base, "ref_ckpt").toString, refOut)
    val ref = committed(refOut)
    assert(restarted.map(_(1)) == ref.map(_(1)),
      s"restarted dedup diverged: $restarted vs $ref")
    assert(restarted.map(_(1)) == Set[Any]("aa", "bb", "cc", "dd"),
      s"doc 5 (dup of restored 'bb') must be dropped, 'dd' kept: $restarted")
    assert(restarted.size == 4, s"expected 4 survivors, got ${restarted.size}")
  }

  test("stream-stream join: kill, add files, restart == uninterrupted run") {
    val base = scratchDir("ssjoin-restart").toFile
    val zone = new java.io.File(base, "zone")
    val clicksDir = new java.io.File(zone, "clicks")
    val purchDir = new java.io.File(zone, "purchases")
    val t0 = 1700000000L
    def row(id: Long, u: Long, ts: Long): String =
      s"""{"event_id":$id,"user_id":$u,"ts_sec":$ts}"""
    val now = System.currentTimeMillis()
    def run(ckpt: String, out: String): Unit = {
      def side(dir: java.io.File, idAs: String, userAs: String, tsAs: String,
               timeAs: String) = spark.readStream
        .schema("event_id LONG, user_id LONG, ts_sec LONG")
        .option("maxFilesPerTrigger", "1")
        .json(dir.toString)
        .withColumn("event_time", timestamp_seconds(col("ts_sec")))
        .withWatermark("event_time", "1 hour")
        .select(col("event_id").as(idAs), col("user_id").as(userAs),
          col("ts_sec").as(tsAs), col("event_time").as(timeAs))
      val clicks = side(clicksDir, "click_id", "user_id", "click_ts", "click_time")
      val purchases = side(purchDir, "purchase_id", "p_user_id", "purchase_ts", "purchase_time")
      val q = clicks.join(purchases,
          col("user_id") === col("p_user_id") &&
            col("purchase_time") >= col("click_time") &&
            col("purchase_time") <= col("click_time") + expr("INTERVAL 1 HOUR"))
        .select(col("click_id"), col("purchase_id"), col("user_id"),
          (col("purchase_ts") - col("click_ts")).as("gap_sec"))
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .start()
      try q.processAllAvailable() finally q.stop()
    }
    // phase 1: all clicks, purchases for users 0-1 only — the join
    // emits (0,1) matches and BUFFERS every click in state
    writeJson(clicksDir, "c1.json",
      (0L until 5L).map(u => row(1000 + u, u, t0 + u * 100)), now - 40000)
    writeJson(purchDir, "p1.json",
      (0L until 2L).map(u => row(2000 + u, u, t0 + u * 100 + 600)), now - 40000)
    val ckpt = new java.io.File(base, "ckpt").toString
    val out = new java.io.File(base, "out").toString
    run(ckpt, out)
    val phase1 = committed(out)
    assert(phase1.map(_.head).subsetOf(Set[Any](1000L, 1001L)),
      s"phase 1 emitted unexpected clicks: $phase1")
    // between runs: purchases for users 2-3 (in-window → must match the
    // RESTORED click state) and user 4 out-of-window (no match)
    writeJson(purchDir, "p2.json",
      (2L until 4L).map(u => row(2000 + u, u, t0 + u * 100 + 1200)) :+
        row(2004, 4, t0 + 4 * 100 + 7200), now - 20000)
    run(ckpt, out) // restart on the SAME checkpoint
    val restarted = committed(out)
    // uninterrupted reference over the complete zone
    val refOut = new java.io.File(base, "ref_out").toString
    run(new java.io.File(base, "ref_ckpt").toString, refOut)
    assert(restarted == committed(refOut),
      "restarted join diverged from the uninterrupted run")
    // users 0-3 matched exactly once; the cross-restart matches (2,3)
    // prove click state survived; user 4's purchase was out of window
    assert(restarted.map(r => (r(2), r(3))) ==
      Set[(Any, Any)]((0L, 600L), (1L, 600L), (2L, 1200L), (3L, 1200L)))
  }
}
