package graft.multimodal

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream

import javax.imageio.ImageIO
import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}

import graft.olhovivo.SparkTestBase

/** The REAL decode path: known pixels/samples written with the JDK's
  * own encoders must come back exactly through JvmCodec — across
  * formats (the PNG and BMP encodings of the same image decode to the
  * same stats), with correct two's complement audio, and None (never a
  * wrong answer) for garbage. */
class JvmCodecSpec extends SparkTestBase {

  private def testImage: BufferedImage = {
    val img = new BufferedImage(3, 2, BufferedImage.TYPE_3BYTE_BGR)
    val pix = Seq(
      (0, 0, 0x010203), (1, 0, 0x102030), (2, 0, 0xFF0000),
      (0, 1, 0x00FF00), (1, 1, 0x0000FF), (2, 1, 0x808080))
    pix.foreach { case (x, y, rgb) => img.setRGB(x, y, rgb) }
    img
  }

  private def encode(img: BufferedImage, fmt: String): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    assert(ImageIO.write(img, fmt, out), s"no $fmt writer")
    out.toByteArray
  }

  // expected channel sums of testImage
  private val ExpR = 0x01 + 0x10 + 0xFF + 0x00 + 0x00 + 0x80
  private val ExpG = 0x02 + 0x20 + 0x00 + 0xFF + 0x00 + 0x80
  private val ExpB = 0x03 + 0x30 + 0x00 + 0x00 + 0xFF + 0x80

  test("png and bmp encodings of the same pixels decode identically") {
    for (fmt <- Seq("png", "bmp")) {
      val st = JvmCodec.decodeImage(encode(testImage, fmt), 16)
        .getOrElse(fail(s"$fmt did not decode"))
      assert((st.width, st.height) == (3, 2), fmt)
      assert((st.sumR, st.sumG, st.sumB) == ((ExpR, ExpG, ExpB)), fmt)
      assert(st.feature.length == 16 && math.abs(st.feature.sum - 1.0f) < 1e-5,
        s"$fmt: histogram fractions must sum to 1")
    }
  }

  test("encodePng roundtrips arbitrary packed pixels bit-exactly") {
    val pixels = Array.tabulate(12)(i => (i * 17 << 16) | (i * 5 << 8) | (255 - i))
    val bytes = JvmCodec.encodePng(pixels, 4, 3)
    assert(JvmCodec.sniffFormat(bytes) == "png")
    val st = JvmCodec.decodeImage(bytes, 16).getOrElse(fail("png did not decode"))
    assert((st.width, st.height) == (4, 3))
    assert(st.sumR == pixels.map(p => (p >> 16) & 0xff).sum.toLong)
    assert(st.sumG == pixels.map(p => (p >> 8) & 0xff).sum.toLong)
    assert(st.sumB == pixels.map(p => p & 0xff).sum.toLong)
    intercept[IllegalArgumentException](JvmCodec.encodePng(pixels, 5, 3))
  }

  test("gif sequence roundtrip: frame count exact, sampling sums only sampled frames") {
    // two 2×2 frames, ≤256 colors each → lossless palettized encode
    val f0 = Array(0x0A141E, 0x0A141E, 0x281E0A, 0x281E0A)
    val f1 = Array(0x505050, 0x505050, 0x505050, 0x505050)
    val bytes = JvmCodec.encodeGif(Seq(f0, f1), 2, 2)
    assert(JvmCodec.sniffFormat(bytes) == "gif")
    def sums(px: Array[Int]) = (
      px.map(p => ((p >> 16) & 0xff).toLong).sum,
      px.map(p => ((p >> 8) & 0xff).toLong).sum,
      px.map(p => (p & 0xff).toLong).sum)
    val (r0, g0, b0) = sums(f0); val (r1, g1, b1) = sums(f1)
    val all = JvmCodec.decodeFrames(bytes, 1).getOrElse(fail("gif did not decode"))
    assert(all == JvmCodec.FrameStats(2, 2, r0 + r1, g0 + g1, b0 + b1))
    val sampled = JvmCodec.decodeFrames(bytes, 2).getOrElse(fail("sampled decode"))
    assert(sampled == JvmCodec.FrameStats(2, 1, r0, g0, b0))
    // any single-frame ImageIO payload is a 1-frame sequence
    val png = JvmCodec.decodeFrames(encode(testImage, "png"), 1)
      .getOrElse(fail("png as sequence"))
    assert(png == JvmCodec.FrameStats(1, 1, ExpR.toLong, ExpG.toLong, ExpB.toLong))
    assert(JvmCodec.decodeFrames("not media".getBytes, 1).isEmpty)
  }

  test("decodeResizeStats samples the exact nearest-neighbor grid") {
    // 3x2 source resized to 2x2: samples (x*3/2, y*2/2) = (0,0),(1,0),(0,1),(1,1)
    val bytes = JvmCodec.encodePng(
      Array(0x010203, 0x102030, 0xFF0000, 0x00FF00, 0x0000FF, 0x808080), 3, 2)
    val st = JvmCodec.decodeResizeStats(bytes, 2, 2).getOrElse(fail("no decode"))
    assert((st.width, st.height) == (2, 2))
    // sampled pixels: 0x010203, 0x102030, 0x00FF00, 0x0000FF
    assert((st.sumR, st.sumG, st.sumB) ==
      ((0x01 + 0x10 + 0x00 + 0x00).toLong,
       (0x02 + 0x20 + 0xFF + 0x00).toLong,
       (0x03 + 0x30 + 0x00 + 0xFF).toLong))
    // upscale is sample-replication, never interpolation
    val up = JvmCodec.decodeResizeStats(
      JvmCodec.encodePng(Array(0x010000, 0x050000), 2, 1), 4, 1).get
    assert(up.sumR == 1 + 1 + 5 + 5)
    assert(JvmCodec.decodeResizeStats("prose".getBytes, 2, 2).isEmpty)
  }

  test("sniffFormat recognizes real encoder output and rejects prose") {
    assert(JvmCodec.sniffFormat(encode(testImage, "png")) == "png")
    assert(JvmCodec.sniffFormat(encode(testImage, "bmp")) == "bmp")
    assert(JvmCodec.sniffFormat(encode(testImage, "gif")) == "gif")
    assert(JvmCodec.sniffFormat(encode(testImage, "jpeg")) == "jpeg")
    assert(JvmCodec.sniffFormat("plain old text".getBytes) == "unknown")
  }

  test("wav roundtrip: JDK-written PCM decodes with exact peak and sum") {
    val samples = Array[Short](100, -100, 2000, -2000, 0, 500)
    val pcm = new Array[Byte](samples.length * 2)
    samples.zipWithIndex.foreach { case (s, i) =>
      pcm(2 * i) = (s & 0xff).toByte
      pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
    }
    val fmt = new AudioFormat(8000f, 16, 1, true, false) // signed, LE
    val out = new ByteArrayOutputStream()
    AudioSystem.write(
      new AudioInputStream(new java.io.ByteArrayInputStream(pcm), fmt, samples.length),
      AudioFileFormat.Type.WAVE, out)
    val st = JvmCodec.decodeAudio(out.toByteArray, 3)
      .getOrElse(fail("wav did not decode"))
    assert(st.sampleRate == 8000 && st.channels == 1)
    assert(st.nFrames == samples.length)
    assert(st.peak == 2000L)
    assert(st.sumAbs == samples.map(s => math.abs(s.toLong)).sum)
    // envelope: middle segment (2000, -2000) has the loudest mean
    assert(st.feature(1) > st.feature(0) && st.feature(1) > st.feature(2))
  }

  test("garbage and truncated payloads decode to None, never wrong stats") {
    assert(JvmCodec.decodeImage("not an image".getBytes, 16).isEmpty)
    assert(JvmCodec.decodeAudio("not audio at all".getBytes, 16).isEmpty)
    val png = encode(testImage, "png")
    assert(JvmCodec.decodeImage(png.take(20), 16).isEmpty, "truncated png")
    val wavHdrOnly = "RIFF1234WAVE".getBytes
    assert(JvmCodec.decodeAudio(wavHdrOnly, 16).isEmpty, "truncated wav")
  }

  test("decodeFeatures routes decodable payloads to the real codec") {
    import spark.implicits._
    val png = encode(testImage, "png")
    val records = Seq(
      Multimodal.MediaRecord(1L, "image", png, "t", png.length.toLong),
      Multimodal.MediaRecord(2L, "video", "prose bytes payload".getBytes, "t", 19L))
    val feats = Multimodal.decodeFeatures(records.toDS(), batchSize = 2)
      .collect().map(f => f.media_id -> f).toMap
    // real decode: true dimensions, not the hash-derived fake's
    assert(feats(1L).width == 3 && feats(1L).height == 2)
    // undecodable payload: fake fallback keeps the stage total
    assert(feats(2L).width >= 1 && feats(2L).feature.length == Multimodal.FeatureDim)
  }
}
