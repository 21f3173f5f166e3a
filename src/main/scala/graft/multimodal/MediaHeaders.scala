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

  /** ISO BMFF (MP4 family): an ftyp box leads the file — size(4) then
    * "ftyp" then the 4-char major brand. Dimensions live deep inside
    * moov (a box walk, not a header peek) so only format + brand are
    * sniffable. */
  private def isMp4(bin: Column): Column =
    length(bin) >= 12 && hex(substring(bin, 5, 4)) === "66747970"

  /** AVI in the canonical layout the spec mandates for the main
    * header: RIFF….AVI LIST….hdrl avih — which pins dwTotalFrames /
    * dwWidth / dwHeight to fixed LE32 offsets 49/65/69. The tag chain
    * is verified, not assumed. */
  private def isAvi(bin: Column): Column =
    length(bin) >= 12 && hex(substring(bin, 1, 4)) === "52494646" &&
      hex(substring(bin, 9, 4)) === "41564920"

  private def isAviCanonical(bin: Column): Column =
    isAvi(bin) && length(bin) >= 72 &&
      hex(substring(bin, 13, 4)) === "4C495354" &&
      hex(substring(bin, 21, 8)) === "6864726C61766968"

  /** Matroska/WebM: the EBML magic. */
  private def isWebm(bin: Column): Column =
    length(bin) >= 4 && hex(substring(bin, 1, 4)) === "1A45DFA3"

  def format(bin: Column): Column =
    when(isPng(bin), "png")
      .when(isGif(bin), "gif")
      .when(isWav(bin), "wav")
      .when(isMp4(bin), "mp4")
      .when(isAvi(bin), "avi")
      .when(isWebm(bin), "webm")
      .when(isJpeg(bin), "jpeg")
      .otherwise("unknown")

  /** MP4 major brand ("isom", "mp42", …); empty for everything else. */
  def mp4Brand(bin: Column): Column =
    when(isMp4(bin), substring(bin, 9, 4).cast("string")).otherwise("")

  /** struct(format, width, height, sample_rate, frames); 0 where the
    * format doesn't carry the field (or needs a segment scan — JPEG
    * dims, MP4 moov). `frames` is AVI dwTotalFrames — video length
    * without ever touching a codec. */
  def sniff(bin: Column): Column = struct(
    format(bin).as("format"),
    when(isPng(bin), beU32(bin, 17))
      .when(isGif(bin), leU16(bin, 7))
      .when(isAviCanonical(bin), leU32(bin, 65)).otherwise(0L).as("width"),
    when(isPng(bin), beU32(bin, 21))
      .when(isGif(bin), leU16(bin, 9))
      .when(isAviCanonical(bin), leU32(bin, 69)).otherwise(0L).as("height"),
    when(isWav(bin), leU32(bin, 25)).otherwise(0L).as("sample_rate"),
    when(isAviCanonical(bin), leU32(bin, 49)).otherwise(0L).as("frames"))
}
