package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.Bytes._
import graft.multimodal.JvmCodec

/** REAL-decode roundtrip gates: synthesize complete, valid media files
  * (BMP images, PCM WAV audio) in column space from document columns,
  * run them through the actual JDK codecs (graft.multimodal.JvmCodec),
  * and emit integer-exact decode results. The oracle recomputes the
  * EXPECTED pixels/samples arithmetically from doc_id — if the decoder
  * misreads a header field, row padding, endianness, or sample sign,
  * the gate fails. This is decode correctness proven end to end, not a
  * stubbed seam.
  *
  * Scale posture: synthesis and decode are both map-only (the decode a
  * partition-local mapPartitions, the same batched shape as
  * Multimodal.decodeFeatures); no shuffle anywhere.
  */
object MultimodalOps {

  type Q = (SparkSession, String) => DataFrame

  // not private: the Dataset encoder's generated projection code must
  // be able to reach the class
  case class Payload(doc_id: Long, payload: Array[Byte])

  /** 2×2 24-bit uncompressed BMP per document: pixel (r,g,b) values
    * are (p+4i, p+4i+1, p+4i+2) for p = doc_id % 64, i ∈ 0..3 — so the
    * decoded channel sums are 4p+24 / 4p+28 / 4p+32 exactly. Rows are
    * bottom-up and padded to 4 bytes, as the format requires. */
  def q62ImageDecode(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val p = (col("doc_id") % 64).cast("long")
    // BGR byte order within a pixel
    def px(base: org.apache.spark.sql.Column) =
      concat(u8(base + 2), u8(base + 1), u8(base))
    val rowPad = unhex(lit("0000"))
    val pixelData = concat(
      px(p + 8), px(p + 12), rowPad, // bottom image row first
      px(p), px(p + 4), rowPad)
    val header = concat(
      unhex(lit("424D")),            // "BM"
      leU32(lit(70L)),               // file size 54 + 16
      unhex(lit("00000000")),        // reserved
      leU32(lit(54L)),               // pixel data offset
      leU32(lit(40L)),               // BITMAPINFOHEADER size
      leU32(lit(2L)), leU32(lit(2L)), // width, height
      leU16(lit(1L)), leU16(lit(24L)), // planes, bpp
      leU32(lit(0L)),                // BI_RGB (uncompressed)
      leU32(lit(16L)),               // image size
      leU32(lit(0L)), leU32(lit(0L)), leU32(lit(0L)), leU32(lit(0L)))
    // spread: the per-row ImageIO decode is the CPU cost — on the
    // single-split testdata it would otherwise run in ONE task
    Tables.spread(s, Tables.documents(s, dir))
      .select(col("doc_id"), concat(header, pixelData).as("payload"))
      .as[Payload]
      .mapPartitions(_.map { r =>
        val st = JvmCodec.decodeImage(r.payload, 16).getOrElse(
          sys.error(s"doc ${r.doc_id}: synthesized BMP failed to decode"))
        (r.doc_id, st.width.toLong, st.height.toLong, st.sumR, st.sumG, st.sumB)
      })
      .toDF("doc_id", "width", "height", "sum_r", "sum_g", "sum_b")
  }

  val q62Sql: String =
    """SELECT doc_id, 2::BIGINT AS width, 2::BIGINT AS height,
      |  4 * (doc_id % 64) + 24 AS sum_r,
      |  4 * (doc_id % 64) + 28 AS sum_g,
      |  4 * (doc_id % 64) + 32 AS sum_b
      |FROM documents""".stripMargin

  /** 16-bit mono PCM WAV per document at 8 kHz: four samples
    * (s, −s, 2s, −2s) for s = doc_id % 1000 + 1 — decoded peak is 2s
    * and Σ|sample| is 6s exactly; the negative samples prove two's
    * complement handling on both the writer and the reader side. */
  def q63AudioDecode(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val smp = (col("doc_id") % 1000 + 1).cast("long")
    val data = concat(leS16(smp), leS16(-smp), leS16(smp * 2), leS16(-smp * 2))
    val header = concat(
      unhex(lit("52494646")),        // "RIFF"
      leU32(lit(44L)),               // 36 + data size
      unhex(lit("57415645666D7420")), // "WAVEfmt "
      leU32(lit(16L)),               // fmt chunk size
      leU16(lit(1L)), leU16(lit(1L)), // PCM, mono
      leU32(lit(8000L)),             // sample rate
      leU32(lit(16000L)),            // byte rate
      leU16(lit(2L)), leU16(lit(16L)), // block align, bits
      unhex(lit("64617461")),        // "data"
      leU32(lit(8L)))                // data size
    Tables.spread(s, Tables.documents(s, dir))
      .select(col("doc_id"), concat(header, data).as("payload"))
      .as[Payload]
      .mapPartitions(_.map { r =>
        val st = JvmCodec.decodeAudio(r.payload, 16).getOrElse(
          sys.error(s"doc ${r.doc_id}: synthesized WAV failed to decode"))
        (r.doc_id, st.sampleRate.toLong, st.channels.toLong,
          st.nFrames, st.peak, st.sumAbs)
      })
      .toDF("doc_id", "sample_rate", "channels", "n_samples", "peak", "sum_abs")
  }

  val q63Sql: String =
    """SELECT doc_id, 8000::BIGINT AS sample_rate, 1::BIGINT AS channels,
      |  4::BIGINT AS n_samples,
      |  2 * (doc_id % 1000 + 1) AS peak,
      |  6 * (doc_id % 1000 + 1) AS sum_abs
      |FROM documents""".stripMargin

  // encoder's generated code must reach the class (same note as Payload)
  case class IdOnly(doc_id: Long)

  /** COMPRESSED-format roundtrip: an 8×8 image with doc_id-derived
    * pixels is PNG-encoded executor-side by the JDK encoder (deflate —
    * PNG is the one common image format NOT constructible in column
    * space), sniffed to prove the payload really carries a PNG
    * signature, then decoded by the same JvmCodec path as q62. Pixel
    * values stay < 256 so the channel sums close over doc_id with no
    * modular wraparound: r=p+i, g=2p+i, b=p+2i for p = doc_id % 64,
    * i ∈ 0..63 → Σr = 64p+2016, Σg = 128p+2016, Σb = 64p+4032.
    *
    * Scale posture: encode and decode are adjacent map-only steps in
    * ONE pipelined stage (no shuffle, no driver traffic) — the exact
    * shape a 100 TB re-encode/feature pass would take. */
  def q66PngRoundtrip(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.spread(s, Tables.documents(s, dir))
      .select(col("doc_id")).as[IdOnly]
      .mapPartitions(_.map { r =>
        val p = (r.doc_id % 64).toInt
        val pixels = Array.tabulate(64) { i =>
          ((p + i) << 16) | ((2 * p + i) << 8) | (p + 2 * i)
        }
        Payload(r.doc_id, JvmCodec.encodePng(pixels, 8, 8))
      })
      .mapPartitions(_.map { r =>
        val fmt = JvmCodec.sniffFormat(r.payload)
        val st = JvmCodec.decodeImage(r.payload, 16).getOrElse(
          sys.error(s"doc ${r.doc_id}: JDK-encoded PNG failed to decode"))
        (r.doc_id, fmt, st.width.toLong, st.height.toLong,
          st.sumR, st.sumG, st.sumB)
      })
      .toDF("doc_id", "fmt", "width", "height", "sum_r", "sum_g", "sum_b")
  }

  val q66Sql: String =
    """SELECT doc_id, 'png' AS fmt, 8::BIGINT AS width, 8::BIGINT AS height,
      |  64 * (doc_id % 64) + 2016 AS sum_r,
      |  128 * (doc_id % 64) + 2016 AS sum_g,
      |  64 * (doc_id % 64) + 4032 AS sum_b
      |FROM documents""".stripMargin

  /** FRAME SAMPLING over multi-frame media — the video posture scaled
    * down to what the JDK can honestly codec: each document becomes a
    * real 4-frame animated GIF (frame f is 4×4 solid (p+f, p+2f, p+3f),
    * p = doc_id % 64 — one color per frame, so the palettized encode is
    * lossless), and the decoder counts all frames but DECODES only
    * every 2nd (frames 0 and 2). Expected sums close over doc_id:
    * Σr = 16·(2p+2), Σg = 16·(2p+4), Σb = 16·(2p+6). */
  def q67GifFrameSample(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.spread(s, Tables.documents(s, dir))
      .select(col("doc_id")).as[IdOnly]
      .mapPartitions(_.map { r =>
        val p = (r.doc_id % 64).toInt
        val frames = Seq.tabulate(4) { f =>
          Array.fill(16)(((p + f) << 16) | ((p + 2 * f) << 8) | (p + 3 * f))
        }
        Payload(r.doc_id, JvmCodec.encodeGif(frames, 4, 4))
      })
      .mapPartitions(_.map { r =>
        val fmt = JvmCodec.sniffFormat(r.payload)
        val st = JvmCodec.decodeFrames(r.payload, sampleEvery = 2).getOrElse(
          sys.error(s"doc ${r.doc_id}: JDK-encoded GIF failed to decode"))
        (r.doc_id, fmt, st.nFrames.toLong, st.sampledFrames.toLong,
          st.sumR, st.sumG, st.sumB)
      })
      .toDF("doc_id", "fmt", "n_frames", "sampled_frames",
        "sum_r", "sum_g", "sum_b")
  }

  val q67Sql: String =
    """SELECT doc_id, 'gif' AS fmt, 4::BIGINT AS n_frames,
      |  2::BIGINT AS sampled_frames,
      |  16 * (2 * (doc_id % 64) + 2) AS sum_r,
      |  16 * (2 * (doc_id % 64) + 4) AS sum_g,
      |  16 * (2 * (doc_id % 64) + 6) AS sum_b
      |FROM documents""".stripMargin

  /** Decode + RESIZE: 8×8 PNGs with per-axis gradients (r=p+x+y,
    * g=2p+x, b=p+2y for p = doc_id % 64 — all < 256) downsample to 4×4
    * by the integer nearest-neighbor mapping (samples source pixels
    * (2x, 2y)), so the resized channel sums close over doc_id:
    * Σr = 16p+96, Σg = 32p+48, Σb = 16p+96. The thumbnail/normalize
    * step of an image-corpus pipeline, proven through a real codec. */
  def q69ImageResize(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.spread(s, Tables.documents(s, dir))
      .select(col("doc_id")).as[IdOnly]
      .mapPartitions(_.map { r =>
        val p = (r.doc_id % 64).toInt
        val pixels = Array.tabulate(64) { i =>
          val x = i % 8; val y = i / 8
          ((p + x + y) << 16) | ((2 * p + x) << 8) | (p + 2 * y)
        }
        Payload(r.doc_id, JvmCodec.encodePng(pixels, 8, 8))
      })
      .mapPartitions(_.map { r =>
        val st = JvmCodec.decodeResizeStats(r.payload, 4, 4).getOrElse(
          sys.error(s"doc ${r.doc_id}: PNG failed to decode for resize"))
        (r.doc_id, st.width.toLong, st.height.toLong, st.sumR, st.sumG, st.sumB)
      })
      .toDF("doc_id", "width", "height", "sum_r", "sum_g", "sum_b")
  }

  val q69Sql: String =
    """SELECT doc_id, 4::BIGINT AS width, 4::BIGINT AS height,
      |  16 * (doc_id % 64) + 96 AS sum_r,
      |  32 * (doc_id % 64) + 48 AS sum_g,
      |  16 * (doc_id % 64) + 96 AS sum_b
      |FROM documents""".stripMargin

  val queries: Map[String, Q] = Map(
    "q62_image_decode" -> q62ImageDecode,
    "q63_audio_decode" -> q63AudioDecode,
    "q66_png_roundtrip" -> q66PngRoundtrip,
    "q67_gif_frame_sample" -> q67GifFrameSample,
    "q69_image_resize" -> q69ImageResize,
  )

  val oracles: Map[String, String] = Map(
    "q62_image_decode" -> q62Sql,
    "q63_audio_decode" -> q63Sql,
    "q66_png_roundtrip" -> q66Sql,
    "q67_gif_frame_sample" -> q67Sql,
    "q69_image_resize" -> q69Sql,
  )
}
