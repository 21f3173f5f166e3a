package graft.multimodal

import java.io.ByteArrayInputStream

/** REAL media decode with zero added dependencies: the JDK ships
  * image codecs (javax.imageio — PNG, JPEG, GIF, BMP) and a WAV reader
  * (javax.sound.sampled), both headless-safe. This replaces the former
  * all-fake codec stub for every format the JVM can decode natively;
  * Multimodal.FakeCodec remains only as the documented fallback for
  * payloads that are not decodable media at all (e.g. the prose-byte
  * stand-ins in `documents`, or video containers, which the JDK has no
  * codec for).
  *
  * Decode outputs are INTEGER-EXACT (channel sums, sample |x| sums,
  * peaks) rather than float means, so a synthesized payload with known
  * content is oracle-checkable by plain arithmetic (q62/q63): the gate
  * proves bytes → decoder → pixels/samples end to end.
  *
  * Features are real content features, not hashes: a luminance
  * histogram (images) and a peak-normalized mean-|amplitude| envelope
  * (audio), both fixed-dim.
  */
object JvmCodec {

  final case class ImageStats(width: Int, height: Int,
                              sumR: Long, sumG: Long, sumB: Long,
                              feature: Array[Float])

  final case class AudioStats(sampleRate: Int, channels: Int,
                              nFrames: Long, peak: Long, sumAbs: Long,
                              feature: Array[Float])

  /** Cheap magic-byte sniff (same signatures MediaHeaders checks in
    * column space) so prose payloads never pay a codec attempt. */
  def sniffFormat(b: Array[Byte]): String = {
    def at(i: Int, v: Int): Boolean = i < b.length && (b(i) & 0xff) == v
    if (at(0, 0x89) && at(1, 'P') && at(2, 'N') && at(3, 'G')) "png"
    else if (at(0, 'G') && at(1, 'I') && at(2, 'F') && at(3, '8')) "gif"
    else if (at(0, 0xff) && at(1, 0xd8) && at(2, 0xff)) "jpeg"
    else if (at(0, 'B') && at(1, 'M')) "bmp"
    else if (at(0, 'R') && at(1, 'I') && at(2, 'F') && at(3, 'F') &&
      at(8, 'W') && at(9, 'A') && at(10, 'V') && at(11, 'E')) "wav"
    else "unknown"
  }

  /** Decode any ImageIO-supported payload: dimensions, per-channel
    * pixel sums, and a `featureDim`-bin luminance histogram (fractions
    * of pixels). None when the payload is not a decodable image. */
  def decodeImage(bytes: Array[Byte], featureDim: Int): Option[ImageStats] =
    try {
      Option(javax.imageio.ImageIO.read(new ByteArrayInputStream(bytes))).map { img =>
        val w = img.getWidth
        val h = img.getHeight
        var sr = 0L; var sg = 0L; var sb = 0L
        val hist = new Array[Long](featureDim)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val rgb = img.getRGB(x, y)
            val r = (rgb >> 16) & 0xff
            val g = (rgb >> 8) & 0xff
            val b = rgb & 0xff
            sr += r; sg += g; sb += b
            // integer Rec.601 luma in [0, 255]
            hist(((r * 299 + g * 587 + b * 114) / 1000 * featureDim) / 256) += 1
            x += 1
          }
          y += 1
        }
        val n = w.toLong * h
        ImageStats(w, h, sr, sg, sb, hist.map(c => c.toFloat / n))
      }
    } catch { case _: Exception => None }

  /** Encode packed 0xRRGGBB pixels (row-major, length w*h) as a real
    * PNG via the JDK encoder — deflate compression, filters and all.
    * The q66 gate uses this executor-side to manufacture COMPRESSED
    * payloads (BMP/WAV are constructible in column space, PNG is not),
    * then proves decodeImage reads them back bit-exactly. */
  def encodePng(pixels: Array[Int], width: Int, height: Int): Array[Byte] = {
    require(pixels.length == width * height,
      s"pixels ${pixels.length} != $width x $height")
    val img = new java.awt.image.BufferedImage(
      width, height, java.awt.image.BufferedImage.TYPE_INT_RGB)
    img.setRGB(0, 0, width, height, pixels, 0, width)
    val out = new java.io.ByteArrayOutputStream()
    if (!javax.imageio.ImageIO.write(img, "png", out))
      sys.error("JDK PNG writer unavailable")
    out.toByteArray
  }

  /** Decode a 16-bit PCM WAV payload: format, frame count, peak |s|,
    * Σ|s|, and a `featureDim`-segment mean-|amplitude| envelope
    * normalized by the peak. None for non-audio or non-16-bit data. */
  def decodeAudio(bytes: Array[Byte], featureDim: Int): Option[AudioStats] =
    try {
      val in = javax.sound.sampled.AudioSystem
        .getAudioInputStream(new ByteArrayInputStream(bytes))
      try {
        val fmt = in.getFormat
        if (fmt.getSampleSizeInBits != 16) None
        else {
          val data = in.readAllBytes()
          val le = !fmt.isBigEndian
          val n = data.length / 2
          var peak = 0L
          var sumAbs = 0L
          val segSum = new Array[Long](featureDim)
          val segN = new Array[Long](featureDim)
          var i = 0
          while (i < n) {
            val lo = data(2 * i) & 0xff
            val hi = data(2 * i + 1) & 0xff
            val v = (if (le) (hi << 8) | lo else (lo << 8) | hi).toShort.toLong
            val a = math.abs(v)
            if (a > peak) peak = a
            sumAbs += a
            val s = ((i.toLong * featureDim) / math.max(n, 1)).toInt
            segSum(s) += a
            segN(s) += 1
            i += 1
          }
          Some(AudioStats(fmt.getSampleRate.toInt, fmt.getChannels,
            n / math.max(fmt.getChannels, 1), peak, sumAbs,
            Array.tabulate(featureDim) { j =>
              if (segN(j) == 0 || peak == 0) 0f
              else (segSum(j).toDouble / segN(j) / peak).toFloat
            }))
        }
      } finally in.close()
    } catch { case _: Exception => None }
}
