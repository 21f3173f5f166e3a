package graft.queries

import graft.functions.Fx
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.Portable
import graft.operators.{AsOfJoin, RangeJoin, Scd2, Sessionize, Upsert}

/** Temporal operator coverage over `events`: sessionization
  * (gaps-and-islands), as-of join (union+carry-forward), and bucketized
  * range join — the three operators the reference's sort+shift hints at
  * but never generalizes (SURVEY.md §2.3).
  */
object Temporal {

  type Q = (SparkSession, String) => DataFrame

  private val eCte =
    """WITH e AS (
      |  SELECT event_id, user_id, epoch_ns(ts) // 1000000000 AS ts_sec,
      |         epoch_ns(ts) AS ts_ns, event_type, value
      |  FROM events)
      |""".stripMargin

  def q70Sessionize(s: SparkSession, dir: String): DataFrame =
    Sessionize.sessionStats(
      Tables.events(s, dir), "user_id", "ts_sec", 1800, "value",
      orderTiebreak = Seq(col("event_id")))

  val q70Sql: String = eCte +
    s""", f AS (
      |  SELECT *, CASE WHEN lag(ts_sec) OVER w IS NULL
      |                   OR ts_sec - lag(ts_sec) OVER w > 1800
      |                 THEN 1 ELSE 0 END AS flag
      |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_sec, event_id)),
      |sess AS (
      |  SELECT *, sum(flag) OVER (PARTITION BY user_id ORDER BY ts_sec, event_id
      |                            ROWS UNBOUNDED PRECEDING) - 1 AS session_id
      |  FROM f)
      |SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
      |  count(*) AS n_events, min(ts_sec) AS start_time, max(ts_sec) AS end_time,
      |  ${Fx.fxSql("sum(value)", 2)} AS sum_value
      |FROM sess GROUP BY user_id, session_id""".stripMargin

  /** Each error event matched to the user's latest prior (≤, within 1h)
    * purchase event. ns timestamps are unique per user → deterministic. */
  def q71AsofJoin(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val errors = ev.filter(col("event_type") === "error")
      .select(col("event_id"), col("user_id"), col("ts_ns"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts_ns"))
    AsOfJoin.asofJoin(errors, purchases, "user_id", "ts_ns", "ts_ns",
        rightCols = Seq("event_id", "ts_ns"),
        toleranceSec = Some(3600L * 1000000000L), joinType = "inner")
      .select(col("event_id"), col("user_id"), col("asof_event_id"),
        expr("(ts_ns - asof_ts_ns) div 1000000000").as("gap_sec"))
  }

  val q71Sql: String = eCte +
    """SELECT l.event_id, l.user_id, r.event_id AS asof_event_id,
      |  (l.ts_ns - r.ts_ns) // 1000000000 AS gap_sec
      |FROM (SELECT * FROM e WHERE event_type = 'error') l
      |ASOF JOIN (SELECT * FROM e WHERE event_type = 'purchase') r
      |  ON l.user_id = r.user_id AND l.ts_ns >= r.ts_ns
      |WHERE l.ts_ns - r.ts_ns <= 3600000000000""".stripMargin

  /** q71 through the NATIVE as-of path (plans.AsOfMergeJoinExec — one
    * hash exchange + sort per side, O(1)-state merge) instead of the
    * union+window rewrite. Identical semantics, identical oracle. The
    * strategy is installed by GraftExtensions (builder `.withExtensions`
    * or `register()`'s experimental-methods seam). */
  def q74AsofNative(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val errors = ev.filter(col("event_type") === "error")
      .select(col("event_id"), col("user_id"), col("ts_ns"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("asof_event_id"), col("user_id").as("asof_user_id"),
        col("ts_ns").as("asof_ts_ns"))
    AsOfJoin.asofMergeJoin(errors, purchases,
        leftKeys = Seq("user_id"), rightKeys = Seq("asof_user_id"),
        leftTime = "ts_ns", rightTime = "asof_ts_ns",
        tolerance = Some(3600L * 1000000000L), joinType = "inner")
      .select(col("event_id"), col("user_id"), col("asof_event_id"),
        expr("(ts_ns - asof_ts_ns) div 1000000000").as("gap_sec"))
  }

  /** For every event: how many events follow it on the same user within
    * 600 s (bucketized range self-join, zeros kept). */
  def q72RangeCount(s: SparkSession, dir: String): DataFrame =
    RangeJoin.countFollowing(
      Tables.events(s, dir).select(col("event_id"), col("user_id"), col("ts_sec")),
      "user_id", "ts_sec", "event_id", 600L)

  val q72Sql: String = eCte +
    """SELECT a.event_id, a.user_id, a.ts_sec,
      |  count(b.event_id) AS n_following
      |FROM e a LEFT JOIN e b
      |  ON a.user_id = b.user_id
      | AND b.ts_sec > a.ts_sec AND b.ts_sec <= a.ts_sec + 600
      |GROUP BY a.event_id, a.user_id, a.ts_sec""".stripMargin

  /** Interval overlap self-join (operators.RangeJoin.intervalOverlapJoin):
    * deterministic intervals [ts_sec, ts_sec + |⌊value⌋| % 240] per
    * event; pairs of same-user events whose intervals intersect.
    * floor-then-cast on both engines (a bare ::BIGINT would ROUND in
    * DuckDB while Spark casts truncate). */
  def q76IntervalOverlap(s: SparkSession, dir: String): DataFrame = {
    val iv = Tables.events(s, dir).select(
      col("event_id").as("eid"), col("user_id"), col("ts_sec").as("s0"),
      (col("ts_sec") + abs(floor(col("value")).cast("long")) % 240).as("e0"))
    RangeJoin.intervalOverlapJoin(iv, "user_id", "s0", "e0", "eid",
      bucketWidth = 240L, maxLen = 240L)
  }

  val q76Sql: String = eCte +
    """, iv AS (
      |  SELECT event_id AS id, user_id, ts_sec AS s,
      |    ts_sec + abs(CAST(floor(value) AS BIGINT)) % 240 AS e
      |  FROM e)
      |SELECT a.user_id, a.id AS id_a, b.id AS id_b
      |FROM iv a JOIN iv b
      |  ON a.user_id = b.user_id AND a.id < b.id
      | AND a.s <= b.e AND b.s <= a.e""".stripMargin

  /** Spark's built-in session_window (30-min gap) — the declarative
    * twin of q70's gaps-and-islands; also the shape the streaming
    * variant aggregates with. Oracle: the same islands, built by hand. */
  def q73SessionWindow(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"), Fx.fx(sum(col("value")), 2).as("sum_value"))
      .select(col("user_id"),
        unix_timestamp(col("session_window.start")).as("start_sec"),
        col("n_events"), col("sum_value"))

  /** Session-window semantics: window extends while gaps < 30 min; the
    * window CLOSES at last_event + 30min. Start = first event's ts
    * (micros precision — Spark truncates the ns). Islands form on
    * strict gap ≥ 1800s in MICROseconds. */
  val q73Sql: String =
    s"""WITH e AS (
      |  SELECT user_id, event_id, epoch_ns(ts) // 1000 AS ts_us, value FROM events),
      |f AS (
      |  -- event_id tiebreak in BOTH windows, the q89 lesson: ts_us is
      |  -- unique per user in the current testdata, but two windows that
      |  -- each sort a tied key alone may order ties differently and
      |  -- split a phantom island - cheap insurance against a future
      |  -- testdata build colliding
      |  SELECT *, CASE WHEN lag(ts_us) OVER w IS NULL
      |                   OR ts_us - lag(ts_us) OVER w >= 1800000000
      |                 THEN 1 ELSE 0 END AS flag
      |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)),
      |sess AS (
      |  SELECT *, sum(flag) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
      |                            ROWS UNBOUNDED PRECEDING) AS sid
      |  FROM f)
      |SELECT user_id, min(ts_us) // 1000000 AS start_sec,
      |  count(*) AS n_events, ${Fx.fxSql("sum(value)", 2)} AS sum_value
      |FROM sess GROUP BY user_id, sid""".stripMargin

  /** Keyed upsert (operators.Upsert): a snapshot compacted from the
    * even-event_id half of the stream, merged latest-wins with the odd
    * half as the update batch — new users insert, existing users update.
    * Net result ≡ latest event per user over the whole stream, which is
    * what the oracle states directly. */
  def q80Upsert(s: SparkSession, dir: String): DataFrame = {
    // µs timestamps: DuckDB's parquet reader truncates TIMESTAMP(NANOS)
    // to micros, so exposing (or versioning by) raw ts_ns would diverge
    // in the last three digits. event_id breaks any µs tie.
    val ev = Tables.events(s, dir).select(
      col("event_id"), col("user_id"), expr("ts_ns div 1000").as("ts_us"),
      col("event_type"), Fx.fx(col("value"), 2).as("value"))
    val snapshot = Upsert.compact(ev.filter(col("event_id") % 2 === 0),
      Seq("user_id"), Seq("ts_us", "event_id"))
    Upsert.latestWins(snapshot, ev.filter(col("event_id") % 2 =!= 0),
      Seq("user_id"), Seq("ts_us", "event_id"))
  }

  val q80Sql: String =
    s"""WITH e AS (
      |  SELECT event_id, user_id, epoch_ns(ts) // 1000 AS ts_us, event_type,
      |         ${Fx.fxSql("value", 2)} AS value
      |  FROM events)
      |SELECT user_id, event_id, ts_us, event_type, value FROM e
      |QUALIFY row_number() OVER (
      |  PARTITION BY user_id ORDER BY ts_us DESC, event_id DESC) = 1""".stripMargin

  /** SCD-2 history (operators.Scd2): each user's event_type timeline as
    * half-open validity intervals; consecutive same-type events compress.
    * The open current interval has null valid_to. */
  def q81Scd2(s: SparkSession, dir: String): DataFrame =
    // event_id tiebreak: ts_us is unique per user in the testdata, but
    // a same-µs tie with different event_type would make the
    // change-point set engine-nondeterministic (same posture as q80)
    Scd2.intervalize(
      Tables.events(s, dir).withColumn("ts_us", expr("ts_ns div 1000")),
      Seq("user_id"), "ts_us", "event_type", tiebreak = Seq("event_id"))

  val q81Sql: String =
    """WITH e AS (
      |  SELECT user_id, event_id, epoch_ns(ts) // 1000 AS ts_us, event_type
      |  FROM events),
      |c AS (
      |  SELECT *, lag(event_type) OVER (
      |    PARTITION BY user_id ORDER BY ts_us, event_id) AS prev
      |  FROM e),
      |ch AS (SELECT * FROM c WHERE prev IS NULL OR prev <> event_type)
      |SELECT user_id, event_type, ts_us AS valid_from,
      |  lead(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us, event_id) AS valid_to
      |FROM ch""".stripMargin

  /** Gap-filled 30-min series (operators.Resample): per sampled user, a
    * complete bucket grid over their own span — counts zero-fill, the
    * per-bucket sum forward-fills (both shapes a feature pipeline
    * needs; 10.8k of the 11.3k rows at sf0.01 are generated gaps). */
  def q95GapFill(s: SparkSession, dir: String): DataFrame = {
    val agg = Tables.events(s, dir)
      .filter(col("user_id") % 20 === 0)
      .select(col("user_id"),
        graft.functions.Portable.bucket30mStart(col("ts_sec")).as("b"),
        col("value"))
      .groupBy(col("user_id"), col("b"))
      .agg(count(lit(1)).as("n"), Fx.fx(sum(col("value")), 2).as("sum_value"))
    graft.operators.Resample.gapFill(agg, Seq("user_id"), "b", 1800L,
      zeroFill = Map("n" -> lit(0L), "sum_value" -> lit(0.0)),
      ffill = Seq("sum_value"))
  }

  val q95Sql: String =
    s"""WITH e AS (
      |  SELECT user_id,
      |    (epoch_ns(ts) // 1000000000 // 1800) * 1800 AS b,
      |    value
      |  FROM events WHERE user_id % 20 = 0),
      |agg AS (
      |  SELECT user_id, b, count(*) AS n, ${Fx.fxSql("sum(value)", 2)} AS sum_value
      |  FROM e GROUP BY 1, 2),
      |spans AS (SELECT user_id, min(b) AS lo, max(b) AS hi FROM agg GROUP BY 1),
      |grid AS (
      |  SELECT user_id, unnest(generate_series(lo, hi, 1800)) AS b FROM spans),
      |j AS (
      |  SELECT g.user_id, g.b, a.n, a.sum_value
      |  FROM grid g LEFT JOIN agg a ON g.user_id = a.user_id AND g.b = a.b)
      |SELECT user_id, b, coalesce(n, 0) AS n,
      |  coalesce(sum_value, 0.0) AS sum_value,
      |  last_value(sum_value IGNORE NULLS) OVER (
      |    PARTITION BY user_id ORDER BY b ROWS UNBOUNDED PRECEDING) AS sum_value_ffill
      |FROM j""".stripMargin

  /** Incremental aggregate maintenance (operators.AggMaintenance): the
    * event stream split into three refresh batches, each reduced to a
    * per-user state, states merged, presentation derived — result must
    * equal the one-shot aggregate (the oracle). Values quantize to
    * integer cents first so every component sum is EXACT and the merged
    * result is bit-identical to the rebuild regardless of batch
    * boundaries (same posture as q93). */
  def q97AggMaintenance(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.AggMaintenance
    val ev = Tables.events(s, dir).select(col("user_id"), col("event_id"),
      floor(col("value") * 100 + lit(0.5)).cast("long").as("vc"))
    val states = (0 until 3).map(i =>
      AggMaintenance.state(ev.filter(pmod(col("event_id"), lit(3)) === i),
        Seq("user_id"), "vc"))
    // avg is rounded in INTEGER 10⁻⁴ units (half away from zero), not
    // via Fx.fx(double): a mean landing exactly on a .00005 boundary
    // rounds differently across engines (Spark rounds the shortest
    // decimal repr, DuckDB the binary value — observed at sf0.1:
    // 49.19125 → 49.1913 vs 49.1912). Integer u is identical on both
    // sides, so u/10000.0 is the same double bit pattern.
    val avgU = when(col("agg_sum") < 0, -1L).otherwise(lit(1L)) *
      call_function("div",
        abs(col("agg_sum")) * 200 + col("agg_n"), col("agg_n") * 2)
    AggMaintenance.merge(states, Seq("user_id"))
      .select(col("user_id"), col("agg_n").as("n"),
        Fx.fx(col("agg_sum") / 100.0, 2).as("sum_value"),
        (avgU / 10000.0).as("avg_value"),
        Fx.fx(col("agg_min") / 100.0, 2).as("min_value"),
        Fx.fx(col("agg_max") / 100.0, 2).as("max_value"))
  }

  val q97Sql: String =
    s"""WITH v AS (
      |  SELECT user_id, CAST(floor(value * 100 + 0.5) AS BIGINT) AS vc
      |  FROM events)
      |SELECT user_id, count(vc) AS n,
      |  ${Fx.fxSql("sum(vc) / 100.0", 2)} AS sum_value,
      |  (CASE WHEN sum(vc) < 0 THEN -1 ELSE 1 END)
      |    * ((abs(sum(vc)) * 200 + count(vc)) // (2 * count(vc)))
      |    / 10000.0 AS avg_value,
      |  ${Fx.fxSql("min(vc) / 100.0", 2)} AS min_value,
      |  ${Fx.fxSql("max(vc) / 100.0", 2)} AS max_value
      |FROM v GROUP BY user_id""".stripMargin

  // ------------------------------------------------ q112 snapshot diff

  /** q112: table-versioning diff ([[graft.operators.SnapshotDiff]]).
    * Two snapshots are derived deterministically from `documents`
    * (membership and mutation are content-hash functions, portable to
    * the oracle): the "old" snapshot drops doc_ids hashing to bucket 9,
    * the "new" snapshot drops bucket 0 and rewrites the text of docs
    * whose mutation hash lands on 0 mod 7. The diff itself is ONE
    * co-partitioned full-outer join comparing h60 text fingerprints —
    * (key, 8-byte hash) through the shuffle, never the documents. */
  def q112SnapshotDiff(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val hb = pmod(Portable.h60(col("doc_id").cast("string")), lit(10L))
    val mb = pmod(Portable.h60(concat(col("doc_id").cast("string"),
      lit(":mut"))), lit(7L))
    val oldSnap = docs.filter(hb < 9).select(col("doc_id"), col("text"))
    val newSnap = docs.filter(hb >= 1)
      .select(col("doc_id"),
        when(mb === 0, concat(col("text"), lit("~")))
          .otherwise(col("text")).as("text"))
    graft.operators.SnapshotDiff.diff(oldSnap, newSnap, "doc_id",
      Portable.h60(col("text")))
  }

  private def h60Sql(e: String): String =
    s"('0x' || substr(md5($e), 1, 15))::BIGINT"

  val q112Sql: String = {
    s"""WITH h AS (
       |  SELECT doc_id, text,
       |    ${h60Sql("doc_id::VARCHAR")} % 10 AS hb,
       |    ${h60Sql("doc_id::VARCHAR || ':mut'")} % 7 AS mb
       |  FROM documents),
       |a AS (SELECT doc_id, ${h60Sql("text")} AS fp_old FROM h WHERE hb < 9),
       |b AS (SELECT doc_id,
       |        ${h60Sql("CASE WHEN mb = 0 THEN text || '~' ELSE text END")} AS fp_new
       |      FROM h WHERE hb >= 1)
       |SELECT coalesce(a.doc_id, b.doc_id) AS doc_id, a.fp_old, b.fp_new,
       |  CASE WHEN a.doc_id IS NULL THEN 'added'
       |       WHEN b.doc_id IS NULL THEN 'removed'
       |       WHEN a.fp_old <> b.fp_new THEN 'changed'
       |       ELSE 'unchanged' END AS status
       |FROM a FULL JOIN b ON a.doc_id = b.doc_id""".stripMargin
  }

  val queries: Map[String, Q] = Map(
    "q112_snapshot_diff" -> q112SnapshotDiff,
    "q97_agg_maintenance" -> q97AggMaintenance,
    "q95_gapfill"        -> q95GapFill,
    "q70_sessionize"     -> q70Sessionize,
    "q71_asof_join"      -> q71AsofJoin,
    "q72_range_count"    -> q72RangeCount,
    "q73_session_window" -> q73SessionWindow,
    "q74_asof_native"    -> q74AsofNative,
    "q76_interval_overlap" -> q76IntervalOverlap,
    "q80_upsert"         -> q80Upsert,
    "q81_scd2"           -> q81Scd2,
  )

  val oracles: Map[String, String] = Map(
    "q112_snapshot_diff" -> q112Sql,
    "q97_agg_maintenance" -> q97Sql,
    "q95_gapfill"        -> q95Sql,
    "q80_upsert"         -> q80Sql,
    "q81_scd2"           -> q81Sql,
    "q70_sessionize"     -> q70Sql,
    "q71_asof_join"      -> q71Sql,
    "q74_asof_native"    -> q71Sql,
    "q76_interval_overlap" -> q76Sql,
    "q72_range_count"    -> q72Sql,
    "q73_session_window" -> q73Sql,
  )
}
