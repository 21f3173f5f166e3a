package graft.queries

import graft.functions.Fx
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.Portable

/** Remaining surface coverage: pivot (conditional aggregation), the
  * reference's string/path functions (K1 scheme), multimodal metadata
  * extraction over binary payloads, and approximate distinct (rows-only
  * check — sketches are engine-specific by design).
  */
object Extras {

  type Q = (SparkSession, String) => DataFrame

  private val EventTypes = Seq("click", "error", "purchase", "signup", "view")

  /** Pivot: per-user event-type counts as columns. */
  def q14Pivot(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(col("user_id"))
      .pivot("event_type", EventTypes)
      .agg(count(lit(1)))
      .na.fill(0L, EventTypes)

  val q14Sql: String = {
    val arms = EventTypes.map(t =>
      s"count(*) FILTER (WHERE event_type = '$t') AS $t").mkString(",\n  ")
    s"""SELECT user_id,
       |  $arms
       |FROM events GROUP BY user_id""".stripMargin
  }

  /** The reference's K1 path-interpolation surface (get-bus-data.py:65,
    * ingestao:26,31, velocidades:68–81) as string functions:
    * date_format/concat/lpad over order dates. */
  def q15StringPaths(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir).select(
      col("o_orderkey"),
      concat(lit("raw/"), date_format(col("o_orderdate"), "yyyy-MM"),
        lit("/pos-"), date_format(col("o_orderdate"), "yyyy-MM-dd"),
        lit(".parquet")).as("path"),
      lpad(col("o_orderkey").cast("string"), 12, "0").as("key_padded"),
      upper(col("o_orderpriority")).as("prio_uc"),
      substring(col("o_orderpriority"), 1, 1).as("prio_code"))

  val q15Sql: String =
    """SELECT o_orderkey,
      |  'raw/' || strftime(o_orderdate, '%Y-%m') || '/pos-' ||
      |    strftime(o_orderdate, '%Y-%m-%d') || '.parquet' AS path,
      |  lpad(CAST(o_orderkey AS VARCHAR), 12, '0') AS key_padded,
      |  upper(o_orderpriority) AS prio_uc,
      |  substr(o_orderpriority, 1, 1) AS prio_code
      |FROM orders""".stripMargin

  /** Multimodal metadata extraction: documents as opaque binary payloads
    * (text bytes stand in for image/audio blobs) with typed metadata —
    * byte length, content hash, and hash-derived dimensions in pure
    * column math (real decode of real payloads is gated separately:
    * q62/q63 run graft.multimodal.JvmCodec on synthesized BMP/WAV). */
  def q60MultimodalMeta(s: SparkSession, dir: String): DataFrame = {
    val h = Portable.h60(col("text"))
    Tables.documents(s, dir).select(
      col("doc_id"),
      when(col("doc_id") % 3 === 0, "image")
        .when(col("doc_id") % 3 === 1, "audio")
        .otherwise("video").as("kind"),
      length(col("text").cast("binary")).cast("long").as("byte_len"),
      h.as("content_hash"),
      (h % 640 + 1).cast("int").as("width"),
      (h % 480 + 1).cast("int").as("height"))
  }

  val q60Sql: String = {
    val h = "('0x' || substr(md5(text), 1, 15))::BIGINT"
    s"""SELECT doc_id,
       |  CASE WHEN doc_id % 3 = 0 THEN 'image'
       |       WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END AS kind,
       |  CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
       |  $h AS content_hash,
       |  CAST($h % 640 + 1 AS INTEGER) AS width,
       |  CAST($h % 480 + 1 AS INTEGER) AS height
       |FROM documents""".stripMargin
  }

  /** Media header sniffing end to end: synthesize REAL format headers
    * (PNG/GIF/WAV magic + dimensions/sample-rate at their true offsets,
    * built with unhex/lpad byte assembly — all codegen) from document
    * columns, then parse them back with MediaHeaders.sniff. The oracle
    * recomputes the EXPECTED metadata arithmetically from doc_id, so a
    * mis-parse (wrong offset, endianness, magic) shows as a row
    * mismatch — a true roundtrip check, not rows-only. */
  def q61MediaSniff(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.Bytes.{beU32, leU16, leU32}
    val w = (col("doc_id") % 640 + 1).cast("long")
    val hgt = (col("doc_id") % 480 + 1).cast("long")
    val rate = (col("doc_id") % 48000 + 8000).cast("long")
    // PNG: magic + IHDR length/tag, then BE32 width/height at 17/21
    val png = concat(unhex(lit("89504E470D0A1A0A0000000D49484452")),
      beU32(w), beU32(hgt))
    // GIF89a: magic, then LE16 width/height at 7/9
    val gif = concat(unhex(lit("474946383961")), leU16(w), leU16(hgt))
    // WAV: RIFF size WAVEfmt , fmt size, PCM mono, LE32 sample rate at 25
    val wav = concat(unhex(lit("52494646")), leU32(lit(36L)),
      unhex(lit("57415645666D7420")), leU32(lit(16L)),
      unhex(lit("01000100")), leU32(rate))
    val jpeg = concat(unhex(lit("FFD8FFE0")), col("text").cast("binary"))
    val payload = when(col("doc_id") % 5 === 0, png)
      .when(col("doc_id") % 5 === 1, gif)
      .when(col("doc_id") % 5 === 2, wav)
      .when(col("doc_id") % 5 === 3, jpeg)
      .otherwise(col("text").cast("binary")) // prose bytes: no magic
    // stage the payload once — sniff's per-field when-chains would
    // otherwise each re-inline the whole synthesis tree (same staging
    // as q79)
    Tables.documents(s, dir)
      .select(col("doc_id"), payload.as("payload"))
      .select(col("doc_id"),
        graft.multimodal.MediaHeaders.sniff(col("payload")).as("m"))
      .select(col("doc_id"), col("m.format").as("format"),
        col("m.width").as("width"), col("m.height").as("height"),
        col("m.sample_rate").as("sample_rate"))
  }

  /** Video-container sniffing end to end — the codec-free metadata
    * path for the video modality: MP4 ftyp (format + major brand), AVI
    * with the canonical hdrl/avih layout (dimensions AND total frame
    * count at their spec offsets — video length without a codec), and
    * the WebM/Matroska EBML magic, all synthesized in column space and
    * parsed back by MediaHeaders. Oracle recomputes everything
    * arithmetically from doc_id. */
  def q79VideoSniff(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.Bytes.leU32
    val w = (col("doc_id") % 640 + 1).cast("long")
    val hgt = (col("doc_id") % 480 + 1).cast("long")
    val frames = (col("doc_id") % 1000 + 1).cast("long")
    // ftyp box: BE32 size, "ftyp", 4-char major brand, minor version
    val brand = when(col("doc_id") % 4 === 0, lit("isom"))
      .when(col("doc_id") % 4 === 1, lit("mp41"))
      .when(col("doc_id") % 4 === 2, lit("mp42"))
      .otherwise(lit("avc1"))
    val mp4 = concat(unhex(lit("00000014")), unhex(lit("66747970")),
      brand.cast("binary"), unhex(lit("00000000")))
    // canonical AVI main header: RIFF size "AVI " LIST size "hdrl"
    // "avih" cb, then the ten avih LE32 fields (frames is #5,
    // width/height #9/#10 — offsets 49/65/69)
    val avi = concat(unhex(lit("52494646")), leU32(lit(64L)),
      unhex(lit("41564920")), unhex(lit("4C495354")), leU32(lit(52L)),
      unhex(lit("6864726C")), unhex(lit("61766968")), leU32(lit(40L)),
      leU32(lit(33333L)), leU32(lit(0L)), leU32(lit(0L)), leU32(lit(0L)),
      leU32(frames), leU32(lit(0L)), leU32(lit(1L)), leU32(lit(0L)),
      leU32(w), leU32(hgt))
    val webm = concat(unhex(lit("1A45DFA3")), unhex(lit("0102030405")))
    val payload = when(col("doc_id") % 3 === 0, mp4)
      .when(col("doc_id") % 3 === 1, avi)
      .otherwise(webm)
    // stage the payload once: sniff + mp4Brand would otherwise each
    // inline the full synthesis tree into their when-chains, doubling
    // the generated code for no gain
    Tables.documents(s, dir)
      .select(col("doc_id"), payload.as("payload"))
      .select(col("doc_id"),
        graft.multimodal.MediaHeaders.sniff(col("payload")).as("m"),
        graft.multimodal.MediaHeaders.mp4Brand(col("payload")).as("brand"))
      .select(col("doc_id"), col("m.format").as("format"), col("brand"),
        col("m.width").as("width"), col("m.height").as("height"),
        col("m.frames").as("frames"))
  }

  val q79Sql: String =
    """SELECT doc_id,
      |  CASE WHEN doc_id % 3 = 0 THEN 'mp4'
      |       WHEN doc_id % 3 = 1 THEN 'avi'
      |       ELSE 'webm' END AS format,
      |  CASE WHEN doc_id % 3 = 0 THEN
      |    CASE WHEN doc_id % 4 = 0 THEN 'isom'
      |         WHEN doc_id % 4 = 1 THEN 'mp41'
      |         WHEN doc_id % 4 = 2 THEN 'mp42'
      |         ELSE 'avc1' END
      |  ELSE '' END AS brand,
      |  CASE WHEN doc_id % 3 = 1 THEN doc_id % 640 + 1 ELSE 0 END AS width,
      |  CASE WHEN doc_id % 3 = 1 THEN doc_id % 480 + 1 ELSE 0 END AS height,
      |  CASE WHEN doc_id % 3 = 1 THEN doc_id % 1000 + 1 ELSE 0 END AS frames
      |FROM documents""".stripMargin

  val q61Sql: String =
    """SELECT doc_id,
      |  CASE WHEN doc_id % 5 = 0 THEN 'png'
      |       WHEN doc_id % 5 = 1 THEN 'gif'
      |       WHEN doc_id % 5 = 2 THEN 'wav'
      |       WHEN doc_id % 5 = 3 THEN 'jpeg'
      |       ELSE 'unknown' END AS format,
      |  CASE WHEN doc_id % 5 IN (0, 1) THEN doc_id % 640 + 1
      |       ELSE 0 END AS width,
      |  CASE WHEN doc_id % 5 IN (0, 1) THEN doc_id % 480 + 1
      |       ELSE 0 END AS height,
      |  CASE WHEN doc_id % 5 = 2 THEN doc_id % 48000 + 8000
      |       ELSE 0 END AS sample_rate
      |FROM documents""".stripMargin

  /** The SQL entry path: a TPC-H-Q3-flavor query submitted as SQL text
    * through spark.sql over registered temp views — proving the engine's
    * parser/analyzer surface, not just the DataFrame API. The oracle is
    * the IDENTICAL statement (written in the ANSI subset both engines
    * parse the same way). */
  def q16SqlQ3(s: SparkSession, dir: String): DataFrame = {
    Tables.customer(s, dir).createOrReplaceTempView("customer")
    Tables.orders(s, dir).createOrReplaceTempView("orders")
    Tables.lineitem(s, dir).createOrReplaceTempView("lineitem")
    s.sql(q16Sql)
  }

  val q16Sql: String =
    s"""SELECT l_orderkey,
      |  sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
      |      * (100 - CAST(floor(l_discount * 100 + 0.5) AS BIGINT))) / CAST(10000 AS DOUBLE) AS revenue,
      |  o_orderdate, o_orderpriority
      |FROM customer
      |JOIN orders ON c_custkey = o_custkey
      |JOIN lineitem ON l_orderkey = o_orderkey
      |WHERE c_mktsegment = 'BUILDING'
      |  AND o_orderdate < TIMESTAMP '1995-03-15 00:00:00'
      |  AND l_shipdate > TIMESTAMP '1995-03-15 00:00:00'
      |GROUP BY l_orderkey, o_orderdate, o_orderpriority
      |ORDER BY revenue DESC, l_orderkey LIMIT 20""".stripMargin

  /** Correlated scalar subquery (decorrelated by Catalyst into an
    * aggregate + join): customers above their segment's average balance.
    * One SQL text serves both engines. */
  def q17ScalarSubquery(s: SparkSession, dir: String): DataFrame = {
    Tables.customer(s, dir).createOrReplaceTempView("customer")
    s.sql(q17Sql)
  }

  val q17Sql: String =
    s"""SELECT c_custkey, c_mktsegment, c_acctbal, ${Fx.fxSqlPortable("seg_avg", 2)} AS seg_avg
      |FROM (
      |  SELECT c.c_custkey, c.c_mktsegment, c.c_acctbal,
      |    (SELECT sum(CAST(floor(c2.c_acctbal * 100 + 0.5) AS BIGINT))
      |      / (count(*) * CAST(100 AS DOUBLE)) FROM customer c2
      |     WHERE c2.c_mktsegment = c.c_mktsegment) AS seg_avg
      |  FROM customer c) t
      |WHERE c_acctbal > seg_avg""".stripMargin

  /** IN-subquery with HAVING (plans as a left-semi join on an
    * aggregated subquery). */
  def q18InSubquery(s: SparkSession, dir: String): DataFrame = {
    Tables.supplier(s, dir).createOrReplaceTempView("supplier")
    Tables.customer(s, dir).createOrReplaceTempView("customer")
    s.sql(q18Sql)
  }

  val q18Sql: String =
    """SELECT s_suppkey, s_name FROM supplier
      |WHERE s_nationkey IN (
      |  SELECT c_nationkey FROM customer
      |  GROUP BY c_nationkey HAVING count(*) > 5)""".stripMargin

  /** Salted two-phase aggregation (operators.SkewedAggregate): output
    * must equal the plain GROUP BY — which IS the oracle. */
  def q19SaltedAgg(s: SparkSession, dir: String): DataFrame =
    graft.operators.SkewedAggregate.saltedSumCount(
      Tables.lineitem(s, dir),
      keys = Seq("l_returnflag", "l_linestatus"),
      sums = Map("l_quantity" -> "sum_qty"),
      countName = "n", saltBuckets = 32)
      .select(col("l_returnflag"), col("l_linestatus"), col("n"),
        Fx.fx(col("sum_qty"), 2).as("sum_qty"))

  val q19Sql: String =
    s"""SELECT l_returnflag, l_linestatus, count(*) AS n,
      |  ${Fx.fxSql("sum(l_quantity)", 2)} AS sum_qty
      |FROM lineitem GROUP BY l_returnflag, l_linestatus""".stripMargin

  /** Deterministic content-hash train/val/test split
    * (operators.DataSplit): same doc → same split on any cluster/run,
    * unlike randomSplit. */
  def q34DataSplit(s: SparkSession, dir: String): DataFrame =
    graft.operators.DataSplit.withSplit(
      Tables.documents(s, dir), col("text"),
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
      .select(col("doc_id"), col("split"))

  val q34Sql: String = {
    val h = "('0x' || substr(md5(text), 1, 15))::BIGINT % 10000"
    s"""SELECT doc_id,
       |  CASE WHEN $h < 8000 THEN 'train'
       |       WHEN $h < 9000 THEN 'val'
       |       ELSE 'test' END AS split
       |FROM documents""".stripMargin
  }

  // ------------------------------------------- q37/q38 corpus sampling

  /** Deterministic stratified sample: first 20 docs per source in
    * salted-content-hash order (operators.Sampling). */
  def q37StratifiedSample(s: SparkSession, dir: String): DataFrame =
    graft.operators.Sampling.stratifiedSample(
        Tables.documents(s, dir), col("source"), col("text"), col("doc_id"),
        n = 20, salt = "q37")
      .select(col("doc_id"), col("source"), col("sample_rank").cast("long").as("sample_rank"))

  val q37Sql: String =
    """SELECT doc_id, source, rnk AS sample_rank FROM (
      |  SELECT doc_id, source, row_number() OVER (
      |    PARTITION BY source
      |    ORDER BY ('0x' || substr(md5(text || 'q37'), 1, 15))::BIGINT, doc_id) AS rnk
      |  FROM documents) t
      |WHERE rnk <= 20""".stripMargin

  /** Per-source token budget: docs in salted-hash order until the
    * running token count passes 2000 (inclusive). */
  def q38TokenBudget(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
      .withColumn("n_tokens",
        graft.text.TextAnalysis.tokenCount(col("text")).cast("long"))
    graft.operators.Sampling.tokenBudgetSample(
        docs, col("source"), col("text"), col("doc_id"), col("n_tokens"),
        budget = 2000L, salt = "q38")
      .select(col("doc_id"), col("source"), col("n_tokens"), col("cum_tokens"))
  }

  val q38Sql: String =
    """WITH t AS (
      |  SELECT doc_id, source, text,
      |    len(list_filter(string_split_regex(text, '\s+'), x -> x <> '')) AS n_tokens
      |  FROM documents)
      |SELECT doc_id, source, n_tokens, CAST(cum_tokens AS BIGINT) AS cum_tokens FROM (
      |  SELECT *, sum(n_tokens) OVER (
      |    PARTITION BY source
      |    ORDER BY ('0x' || substr(md5(text || 'q38'), 1, 15))::BIGINT, doc_id
      |    ROWS UNBOUNDED PRECEDING) AS cum_tokens
      |  FROM t) x
      |WHERE cum_tokens <= 2000""".stripMargin

  // ------------------------------------------------ q48 curation pipeline

  /** End-to-end corpus curation — the composition a training-data
    * pipeline actually ships: quality gate (≥ 10 tokens) → exact dedup
    * to the canonical (min-id) doc per identical content → deterministic
    * train/val/test split. Each stage is an already-gated operator; this
    * entry pins the COMPOSITION (filters commute with the dedup window,
    * split stays a pure row function). */
  def q48Curation(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.documents(s, dir)
      .withColumn("n_tokens",
        graft.text.TextAnalysis.tokenCount(col("text")).cast("long"))
      .filter(col("n_tokens") >= 10)
    val canonical = docs
      .withColumn("rn", row_number().over(
        Window.partitionBy(Portable.h60(col("text"))).orderBy(col("doc_id"))))
      .filter(col("rn") === 1)
    graft.operators.DataSplit.withSplit(canonical, col("text"),
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
      .select(col("doc_id"), col("n_tokens"), col("split"))
  }

  val q48Sql: String = {
    val h = "('0x' || substr(md5(text), 1, 15))::BIGINT % 10000"
    """WITH t AS (
      |  SELECT doc_id, text,
      |    len(list_filter(string_split_regex(text, '\s+'), x -> x <> '')) AS n_tokens
      |  FROM documents),
      |flt AS (SELECT * FROM t WHERE n_tokens >= 10),
      |canon AS (
      |  SELECT *, row_number() OVER (
      |    PARTITION BY ('0x' || substr(md5(text), 1, 15))::BIGINT
      |    ORDER BY doc_id) AS rn
      |  FROM flt)
      |SELECT doc_id, n_tokens,
      |""".stripMargin +
      s"""  CASE WHEN $h < 8000 THEN 'train'
         |       WHEN $h < 9000 THEN 'val'
         |       ELSE 'test' END AS split
         |FROM canon WHERE rn = 1""".stripMargin
  }

  /** Approximate distinct (HLL++): the raw sketch estimate is
    * engine-specific and can never hash-match a DuckDB twin, so the
    * COMPARED columns are the exact count plus a `within_tolerance`
    * boolean checking the sketch's error BOUND: rsd 0.02 means a
    * standard error of 2%, so the estimate must land within ±6%
    * (3σ) of the exact count. The oracle computes the exact twin and a
    * literal TRUE — an estimator outside its contract flips the boolean
    * and fails the hash. */
  def q90ApproxDistinct(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .groupBy(col("o_orderpriority"))
      .agg(
        countDistinct(col("o_custkey")).as("exact_customers"),
        (abs(approx_count_distinct(col("o_custkey"), 0.02) -
            countDistinct(col("o_custkey"))).cast("double") <=
          lit(0.06) * countDistinct(col("o_custkey")))
          .as("within_tolerance"))

  val q90Sql: String =
    """SELECT o_orderpriority,
      |  count(DISTINCT o_custkey) AS exact_customers,
      |  TRUE AS within_tolerance
      |FROM orders GROUP BY o_orderpriority""".stripMargin

  val queries: Map[String, Q] = Map(
    "q14_pivot"           -> q14Pivot,
    "q15_string_paths"    -> q15StringPaths,
    "q16_sql_q3"          -> q16SqlQ3,
    "q17_scalar_subquery" -> q17ScalarSubquery,
    "q18_in_subquery"     -> q18InSubquery,
    "q19_salted_agg"      -> q19SaltedAgg,
    "q34_data_split"      -> q34DataSplit,
    "q37_stratified_sample" -> q37StratifiedSample,
    "q38_token_budget"    -> q38TokenBudget,
    "q48_curation"        -> q48Curation,
    "q60_multimodal_meta" -> q60MultimodalMeta,
    "q61_media_sniff"     -> q61MediaSniff,
    "q79_video_sniff"     -> q79VideoSniff,
    "q90_approx_distinct" -> q90ApproxDistinct,
  )

  val oracles: Map[String, String] = Map(
    "q14_pivot"           -> q14Sql,
    "q15_string_paths"    -> q15Sql,
    "q16_sql_q3"          -> q16Sql,
    "q17_scalar_subquery" -> q17Sql,
    "q18_in_subquery"     -> q18Sql,
    "q19_salted_agg"      -> q19Sql,
    "q34_data_split"      -> q34Sql,
    "q37_stratified_sample" -> q37Sql,
    "q38_token_budget"    -> q38Sql,
    "q48_curation"        -> q48Sql,
    "q60_multimodal_meta" -> q60Sql,
    "q61_media_sniff"     -> q61Sql,
    "q79_video_sniff"     -> q79Sql,
    "q90_approx_distinct" -> q90Sql,
  )
}
