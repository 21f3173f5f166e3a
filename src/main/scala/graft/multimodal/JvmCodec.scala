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

  // ImageIO's default stream cache is a TEMP FILE per read/write call —
  // ~1 ms of filesystem churn per payload, which dominates the actual
  // codec work for small media and multiplies into minutes per million
  // rows. In-memory stream caching is strictly better for the
  // byte-array payloads this engine processes. (Process-wide JDK
  // setting; first use of this object on each executor applies it.)
  javax.imageio.ImageIO.setUseCache(false)

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

  final case class FrameStats(nFrames: Int, sampledFrames: Int,
                              sumR: Long, sumG: Long, sumB: Long)

  /** Decode + RESIZE to outW×outH by nearest-neighbor (source pixel
    * (x·w div outW, y·h div outH) — integer floor mapping, so the
    * sampled grid is exact and the resized stats are arithmetic,
    * engine-checkable facts, unlike interpolating resamplers whose
    * float kernels vary by library). Returns the resized image's
    * channel sums. The standard thumbnail/normalize step before
    * feature extraction in an image-corpus pipeline. */
  def decodeResizeStats(bytes: Array[Byte], outW: Int, outH: Int): Option[ImageStats] =
    try {
      require(outW > 0 && outH > 0)
      Option(javax.imageio.ImageIO.read(new ByteArrayInputStream(bytes))).map { img =>
        val w = img.getWidth
        val h = img.getHeight
        var sr = 0L; var sg = 0L; var sb = 0L
        var y = 0
        while (y < outH) {
          val sy = y * h / outH
          var x = 0
          while (x < outW) {
            val rgb = img.getRGB(x * w / outW, sy)
            sr += (rgb >> 16) & 0xff
            sg += (rgb >> 8) & 0xff
            sb += rgb & 0xff
            x += 1
          }
          y += 1
        }
        ImageStats(outW, outH, sr, sg, sb, Array.empty)
      }
    } catch { case _: Exception => None }

  /** Encode frames (each packed 0xRRGGBB, row-major) as a multi-frame
    * GIF89a — the smallest honest stand-in for video the JVM can
    * produce without new dependencies. Frames with ≤256 distinct
    * colors encode losslessly (GIF is palettized).
    *
    * The container is written by hand: the JDK's own GIF writer is NOT
    * usable here — it quantizes direct-color input to a web-safe
    * palette, and even for pre-indexed images its LZW encoder corrupts
    * many shapes (verified in this environment: an 8×4 four-color
    * frame round-trips wrong through ImageIO write→read, while 4×8
    * with identical pixels survives). Each frame gets a local color
    * table of exactly its distinct colors and an LZW stream of literal
    * codes with a clear code re-emitted before every code-width
    * boundary (the standard "uncompressed GIF" technique — a valid
    * stream any conformant decoder, including the JDK reader the
    * decode path uses, reads exactly). */
  def encodeGif(frames: Seq[Array[Int]], width: Int, height: Int): Array[Byte] = {
    require(frames.nonEmpty && frames.forall(_.length == width * height),
      s"each frame must be $width x $height")
    val out = new java.io.ByteArrayOutputStream()
    def w8(v: Int): Unit = out.write(v & 0xff)
    def w16(v: Int): Unit = { w8(v); w8(v >> 8) }
    out.write(Array[Byte]('G', 'I', 'F', '8', '9', 'a'))
    w16(width); w16(height); w8(0); w8(0); w8(0) // no global color table
    frames.foreach { px =>
      val palette = px.distinct
      require(palette.length <= 256,
        s"frame has ${palette.length} distinct colors; GIF allows 256")
      // local color table: 2^bits entries; bits ≥ 2 because the LZW
      // minimum code size must be ≥ 2
      var bits = 2
      while ((1 << bits) < palette.length) bits += 1
      w8(0x2C); w16(0); w16(0); w16(width); w16(height)
      w8(0x80 | (bits - 1))
      palette.foreach { c => w8(c >> 16); w8(c >> 8); w8(c) }
      (palette.length until (1 << bits)).foreach { _ => w8(0); w8(0); w8(0) }
      val minCode = bits
      val clear = 1 << minCode
      val codeSize = minCode + 1
      // after a clear the decoder assigns dictionary codes from
      // clear+2; the code width would grow once 2^(minCode+1) codes
      // exist — i.e. after 2^minCode − 2 literals — so clearing just
      // before that keeps every code exactly codeSize bits
      val budget = (1 << minCode) - 2
      val index = palette.zipWithIndex.toMap
      val codes = Array.newBuilder[Int]
      codes += clear
      var used = 0
      px.foreach { p =>
        if (used == budget) { codes += clear; used = 0 }
        codes += index(p); used += 1
      }
      codes += clear + 1 // end-of-information
      val data = new java.io.ByteArrayOutputStream()
      var cur = 0; var nbits = 0
      codes.result().foreach { c =>
        cur |= c << nbits; nbits += codeSize
        while (nbits >= 8) { data.write(cur & 0xff); cur >>= 8; nbits -= 8 }
      }
      if (nbits > 0) data.write(cur & 0xff)
      w8(minCode)
      val d = data.toByteArray
      var off = 0
      while (off < d.length) {
        val n = math.min(255, d.length - off)
        w8(n); out.write(d, off, n); off += n
      }
      w8(0) // block terminator
    }
    w8(0x3B) // trailer
    out.toByteArray
  }

  /** FRAME SAMPLING over a multi-frame payload (animated GIF; any
    * ImageIO input — a PNG is a 1-frame sequence): count the frames,
    * decode only every `sampleEvery`-th (0, k, 2k, …), and sum the
    * sampled frames' channel sums. The decode cost is proportional to
    * the SAMPLED frames — the property that makes frame sampling the
    * scale posture for video-ish corpora. None when nothing decodes. */
  def decodeFrames(bytes: Array[Byte], sampleEvery: Int): Option[FrameStats] =
    try {
      require(sampleEvery >= 1)
      val iis = javax.imageio.ImageIO.createImageInputStream(
        new ByteArrayInputStream(bytes))
      val readers = javax.imageio.ImageIO.getImageReaders(iis)
      if (!readers.hasNext) { iis.close(); None }
      else {
        val reader = readers.next()
        try {
          reader.setInput(iis)
          val n = reader.getNumImages(true)
          var sr = 0L; var sg = 0L; var sb = 0L
          var sampled = 0
          var i = 0
          while (i < n) {
            val img = reader.read(i)
            var y = 0
            while (y < img.getHeight) {
              var x = 0
              while (x < img.getWidth) {
                val rgb = img.getRGB(x, y)
                sr += (rgb >> 16) & 0xff
                sg += (rgb >> 8) & 0xff
                sb += rgb & 0xff
                x += 1
              }
              y += 1
            }
            sampled += 1
            i += sampleEvery
          }
          Some(FrameStats(n, sampled, sr, sg, sb))
        } finally { reader.dispose(); iis.close() }
      }
    } catch { case _: Exception => None }

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
