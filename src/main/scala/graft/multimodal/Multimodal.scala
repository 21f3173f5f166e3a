package graft.multimodal

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column handling: media as opaque `binary` payloads with a
  * typed metadata struct, and a batched decode/feature-extract stage.
  *
  * Decode is REAL for every format the JDK can decode natively
  * ([[JvmCodec]]: PNG/JPEG/GIF/BMP via javax.imageio, 16-bit PCM WAV
  * via javax.sound.sampled — no external libraries). Payloads the JVM
  * has no codec for (video containers, or the prose-byte stand-ins in
  * `documents`) fall back to the deterministic [[FakeCodec]] so the
  * pipeline shape stays total; the routing is a per-record magic-byte
  * sniff, so undecodable payloads never pay a codec attempt.
  * Header-level metadata needs NO codec at all: [[MediaHeaders]] parses
  * format/dimensions/sample-rate from fixed-offset header bytes with
  * codegen'd built-ins.
  *
  * Scale notes: decode is partition-local (map-only, no shuffle); batch
  * size bounds peak memory per task exactly like `maxRecordsPerBatch`
  * does for Arrow batches; payloads stay byte arrays end-to-end (no
  * string conversions of binary data).
  */
object Multimodal {

  case class MediaRecord(
      media_id: Long,
      kind: String,            // image | audio | video
      payload: Array[Byte],    // opaque encoded bytes
      source: String,
      declared_bytes: Long)

  case class MediaFeatures(
      media_id: Long,
      kind: String,
      byte_len: Int,
      width: Int,              // image/video; 0 for audio
      height: Int,
      duration_ms: Double,     // audio/video; 0 for image
      feature: Array[Float])   // fixed-dim content embedding

  val FeatureDim = 16

  /** Fallback codec for payloads the JVM cannot decode (video, prose
    * bytes): a deterministic fake keyed on content bytes, keeping the
    * decode stage total and shape-stable. Decodable formats never reach
    * it — [[decode]] routes them to [[JvmCodec]]. */
  object FakeCodec {
    def decode(r: MediaRecord): MediaFeatures = {
      val h = r.payload.foldLeft(1125899906842597L)((acc, b) => acc * 31 + (b & 0xff))
      val pos = math.abs(h)
      val isImage = r.kind == "image"
      val isAudio = r.kind == "audio"
      val feature = Array.tabulate(FeatureDim) { i =>
        // deterministic pseudo-feature in [-1, 1)
        val x = pos * (i + 1) * 2654435761L
        ((x >>> 11).toDouble / (1L << 53).toDouble * 2.0 - 1.0).toFloat
      }
      MediaFeatures(
        media_id = r.media_id,
        kind = r.kind,
        byte_len = r.payload.length,
        width = if (isAudio) 0 else (pos % 640 + 1).toInt,
        height = if (isAudio) 0 else (pos % 480 + 1).toInt,
        duration_ms = if (isImage) 0.0 else (pos % 600000).toDouble,
        feature = feature)
    }
  }

  /** Documents → media records (text bytes stand in for encoded blobs;
    * deterministic kind assignment). */
  def fromDocuments(spark: SparkSession, docs: DataFrame): Dataset[MediaRecord] = {
    import spark.implicits._
    docs.select(
      col("doc_id").as("media_id"),
      when(col("doc_id") % 3 === 0, "image")
        .when(col("doc_id") % 3 === 1, "audio")
        .otherwise("video").as("kind"),
      col("text").cast("binary").as("payload"),
      col("source"),
      col("n_chars").as("declared_bytes"))
      .as[MediaRecord]
  }

  /** One record through the right codec: real JVM decode for
    * image/audio formats the JDK supports, deterministic fake for
    * everything else (including payloads that carry a known magic but
    * are truncated/corrupt — decode returns None and the record still
    * produces a row). */
  def decode(r: MediaRecord): MediaFeatures =
    JvmCodec.sniffFormat(r.payload) match {
      case "png" | "gif" | "jpeg" | "bmp" =>
        JvmCodec.decodeImage(r.payload, FeatureDim).map { st =>
          MediaFeatures(r.media_id, r.kind, r.payload.length,
            st.width, st.height, 0.0, st.feature)
        }.getOrElse(FakeCodec.decode(r))
      case "wav" =>
        JvmCodec.decodeAudio(r.payload, FeatureDim).map { st =>
          MediaFeatures(r.media_id, r.kind, r.payload.length, 0, 0,
            st.nFrames * 1000.0 / math.max(st.sampleRate, 1), st.feature)
        }.getOrElse(FakeCodec.decode(r))
      case _ => FakeCodec.decode(r)
    }

  /** Batched partition-local decode: groups the partition iterator into
    * `batchSize` chunks (the Arrow-batch shape a Python `mapInPandas`
    * stage would see) and decodes chunk-by-chunk. Lazy iterators
    * throughout — one batch resident per task at a time. */
  def decodeFeatures(ds: Dataset[MediaRecord], batchSize: Int = 256): Dataset[MediaFeatures] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        // batch boundary = where a native/vectorized codec would take
        // the whole chunk in one call
        batch.iterator.map(decode)
      }
    }
  }

  /** Payload sanity used by tests: round-trip the fake payload. */
  def payloadText(r: MediaRecord): String = new String(r.payload, StandardCharsets.UTF_8)
}
