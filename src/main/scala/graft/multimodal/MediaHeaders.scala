package graft.multimodal

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** REAL media header sniffing over opaque binary payloads — format
  * detection plus the metadata that lives in fixed-offset headers
  * (PNG/GIF dimensions, WAV sample rate), parsed with nothing but
  * codegen'd built-ins (`substring` on binary → `hex` → `conv`).
  *
  * This is the part of multimodal handling that does NOT need a codec:
  * at 100 TB, filtering "images smaller than 32×32" or "audio below
  * 16 kHz" by full decode wastes the cluster — headers answer it with
  * a few bytes per row, map-only, inside whole-stage codegen. Full
  * pixel/sample decode stays behind the documented codec seam
  * (Multimodal.FakeCodec).
  *
  * Formats: PNG (8-byte magic; IHDR width/height, big-endian at fixed
  * offsets 17/21), GIF87a/89a (LE16 dims at 7/9), WAV (RIFF....WAVE;
  * fmt sample rate LE32 at 25), JPEG (magic only — its dimensions live
  * in variable-offset SOF segments, which need a scan, not a header
  * peek). Truncated payloads fall back to `unknown`/zeros.
  */
object MediaHeaders {

  private def u8(bin: Column, pos: Int): Column =
    conv(hex(substring(bin, pos, 1)), 16, 10).cast("long")

  /** Big-endian unsigned 32-bit at 1-based byte offset. */
  private def beU32(bin: Column, pos: Int): Column =
    conv(hex(substring(bin, pos, 4)), 16, 10).cast("long")

  private def leU16(bin: Column, pos: Int): Column =
    u8(bin, pos) + u8(bin, pos + 1) * 256L

  private def leU32(bin: Column, pos: Int): Column =
    u8(bin, pos) + u8(bin, pos + 1) * 256L +
      u8(bin, pos + 2) * 65536L + u8(bin, pos + 3) * 16777216L

  private def isPng(bin: Column): Column =
    length(bin) >= 24 && hex(substring(bin, 1, 8)) === "89504E470D0A1A0A"

  private def isGif(bin: Column): Column =
    length(bin) >= 10 && hex(substring(bin, 1, 4)) === "47494638"

  private def isJpeg(bin: Column): Column =
    length(bin) >= 3 && hex(substring(bin, 1, 3)) === "FFD8FF"

  private def isWav(bin: Column): Column =
    length(bin) >= 28 && hex(substring(bin, 1, 4)) === "52494646" &&
      hex(substring(bin, 9, 8)) === "57415645666D7420"

  def format(bin: Column): Column =
    when(isPng(bin), "png")
      .when(isGif(bin), "gif")
      .when(isWav(bin), "wav")
      .when(isJpeg(bin), "jpeg")
      .otherwise("unknown")

  /** struct(format, width, height, sample_rate); 0 where the format
    * doesn't carry the field (or needs a segment scan — JPEG dims). */
  def sniff(bin: Column): Column = struct(
    format(bin).as("format"),
    when(isPng(bin), beU32(bin, 17))
      .when(isGif(bin), leU16(bin, 7)).otherwise(0L).as("width"),
    when(isPng(bin), beU32(bin, 21))
      .when(isGif(bin), leU16(bin, 9)).otherwise(0L).as("height"),
    when(isWav(bin), leU32(bin, 25)).otherwise(0L).as("sample_rate"))
}
