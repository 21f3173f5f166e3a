package graft.multimodal

import org.apache.spark.sql.functions._

import graft.olhovivo.SparkTestBase

class MediaHeadersSpec extends SparkTestBase {
  import spark.implicits._

  private def payloadsDf(payloads: Seq[Array[Byte]]) =
    payloads.zipWithIndex.map { case (p, i) => (i.toLong, p) }
      .toDF("id", "payload")

  private def sniff(payloads: Seq[Array[Byte]]) =
    payloadsDf(payloads)
      .select(col("id"), MediaHeaders.sniff(col("payload")).as("s"))
      .select(col("id"), col("s.format"), col("s.width"), col("s.height"),
        col("s.sample_rate"))
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap

  private def be32(v: Int): Array[Byte] =
    Array((v >>> 24).toByte, (v >>> 16).toByte, (v >>> 8).toByte, v.toByte)
  private def le16(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
  private def le32(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)

  test("real headers: png dims, gif dims, wav sample rate, jpeg magic") {
    val png = Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a) ++
      be32(13) ++ "IHDR".getBytes ++ be32(640) ++ be32(480) ++
      Array[Byte](8, 6, 0, 0, 0)
    val gif = "GIF89a".getBytes ++ le16(320) ++ le16(200) ++
      Array[Byte](0, 0, 0)
    val wav = "RIFF".getBytes ++ le32(36) ++ "WAVEfmt ".getBytes ++
      le32(16) ++ le16(1) ++ le16(2) ++ le32(44100) ++ le32(176400) ++
      le16(4) ++ le16(16)
    val jpeg = Array[Byte](0xff.toByte, 0xd8.toByte, 0xff.toByte,
      0xe0.toByte, 0, 16) ++ "JFIF".getBytes
    val got = sniff(Seq(png, gif, wav, jpeg))
    assert(got(0L) == (("png", 640L, 480L, 0L)), s"png: ${got(0L)}")
    assert(got(1L) == (("gif", 320L, 200L, 0L)), s"gif: ${got(1L)}")
    assert(got(2L) == (("wav", 0L, 0L, 44100L)), s"wav: ${got(2L)}")
    assert(got(3L) == (("jpeg", 0L, 0L, 0L)), s"jpeg: ${got(3L)}")
  }

  test("large dimensions cross the byte boundaries correctly") {
    val png = Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a) ++
      be32(13) ++ "IHDR".getBytes ++ be32(65537) ++ be32(70000) ++
      Array[Byte](8, 6, 0, 0, 0)
    val gif = "GIF87a".getBytes ++ le16(65535) ++ le16(4097) ++
      Array[Byte](0, 0, 0)
    val got = sniff(Seq(png, gif))
    assert(got(0L) == (("png", 65537L, 70000L, 0L)))
    assert(got(1L) == (("gif", 65535L, 4097L, 0L)))
  }

  test("video containers: mp4 brand, canonical avi dims + frames, webm magic") {
    val mp4 = be32(20) ++ "ftypmp42".getBytes ++ be32(0)
    val avi = "RIFF".getBytes ++ le32(64) ++ "AVI LIST".getBytes ++ le32(52) ++
      "hdrlavih".getBytes ++ le32(40) ++
      le32(33333) ++ le32(0) ++ le32(0) ++ le32(0) ++
      le32(777) ++ le32(0) ++ le32(1) ++ le32(0) ++ le32(1920) ++ le32(1080)
    val webm = Array[Byte](0x1a, 0x45.toByte, 0xdf.toByte, 0xa3.toByte, 1, 2)
    // AVI detected but NOT canonical (no hdrl chain) → no dims claimed
    val aviOdd = "RIFF".getBytes ++ le32(64) ++ "AVI JUNK".getBytes ++
      Array.fill[Byte](60)(7)
    val rows = payloadsDf(Seq(mp4, avi, webm, aviOdd))
      .select(col("id"), MediaHeaders.sniff(col("payload")).as("s"),
        MediaHeaders.mp4Brand(col("payload")).as("b"))
      .select(col("id"), col("s.format"), col("s.width"), col("s.height"),
        col("s.frames"), col("b"))
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getString(5))))
      .toMap
    assert(rows(0L) == (("mp4", 0L, 0L, 0L, "mp42")))
    assert(rows(1L) == (("avi", 1920L, 1080L, 777L, "")))
    assert(rows(2L) == (("webm", 0L, 0L, 0L, "")))
    assert(rows(3L) == (("avi", 0L, 0L, 0L, "")))
  }

  test("truncated and garbage payloads are unknown with zero fields") {
    val got = sniff(Seq(
      Array[Byte](0x89.toByte, 'P', 'N'),   // truncated png magic
      "GIF8".getBytes,                       // truncated gif header
      "plain text bytes".getBytes,
      Array.empty[Byte]))
    got.values.foreach(v => assert(v == (("unknown", 0L, 0L, 0L)), s"got $v"))
  }
}
