package graft.operators

/**
 * Pure-JVM, dependency-free codecs for the multimodal column path
 * (reference: Pyspatialml hands rasters to rasterio/PIL; this container
 * has no codec libs, so the two classic uncompressed formats are
 * implemented from their public specs instead — real header parse,
 * real pixel/sample layout, no stub arithmetic).
 *
 *  - BMP: Windows BITMAPINFOHEADER, 24-bit BI_RGB, bottom-up rows,
 *    4-byte row padding (the format every OS ships a writer for).
 *  - WAV: RIFF/WAVE, PCM 16-bit little-endian, chunk-walked (unknown
 *    chunks skipped, "data" located by tag — not by fixed offset).
 *
 * Both directions are implemented so fixtures can be SYNTHESIZED as
 * honest container bytes; the encode/decode pair is pinned against
 * hand-written golden byte arrays in CodecSpec (a mutual-inverse bug
 * cannot cancel out, because the golden bytes come from the spec
 * document, not from this code).
 */
object Codec {

  /** Decoded image: `pixels` is TOP-DOWN row-major RGB (3 bytes/px). */
  final case class Image(width: Int, height: Int, pixels: Array[Byte])

  /** Decoded audio: PCM samples of channel 0, plus the declared rate. */
  final case class Audio(sampleRate: Int, channels: Int, samples: Array[Short])

  private def u16(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
  private def u32(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) |
      ((b(o + 2) & 0xff) << 16) | ((b(o + 3) & 0xff) << 24)
  private def putU16(b: Array[Byte], o: Int, v: Int): Unit = {
    b(o) = (v & 0xff).toByte; b(o + 1) = ((v >> 8) & 0xff).toByte
  }
  private def putU32(b: Array[Byte], o: Int, v: Int): Unit = {
    b(o) = (v & 0xff).toByte; b(o + 1) = ((v >> 8) & 0xff).toByte
    b(o + 2) = ((v >> 16) & 0xff).toByte; b(o + 3) = ((v >> 24) & 0xff).toByte
  }

  /** BMP row stride: width*3 rounded up to a multiple of 4. */
  def bmpStride(width: Int): Int = (width * 3 + 3) & ~3

  /** Encode TOP-DOWN RGB pixels as a 24-bit bottom-up BI_RGB BMP. */
  def encodeBmp(img: Image): Array[Byte] = {
    val w = img.width; val h = img.height
    require(img.pixels.length == w * h * 3, "pixels must be w*h*3 RGB")
    val stride = bmpStride(w)
    val dataLen = stride * h
    val out = new Array[Byte](54 + dataLen)
    out(0) = 'B'; out(1) = 'M'
    putU32(out, 2, out.length)
    putU32(out, 10, 54)          // pixel data offset
    putU32(out, 14, 40)          // BITMAPINFOHEADER size
    putU32(out, 18, w)
    putU32(out, 22, h)           // positive = bottom-up
    putU16(out, 26, 1)           // planes
    putU16(out, 28, 24)          // bpp
    putU32(out, 30, 0)           // BI_RGB
    putU32(out, 34, dataLen)
    putU32(out, 38, 2835); putU32(out, 42, 2835) // 72 dpi
    var y = 0
    while (y < h) {
      val srcRow = (h - 1 - y) * w * 3 // bottom-up: file row y = image row h-1-y
      val dst = 54 + y * stride
      var x = 0
      while (x < w) {
        // BMP stores B,G,R per pixel
        out(dst + x * 3) = img.pixels(srcRow + x * 3 + 2)
        out(dst + x * 3 + 1) = img.pixels(srcRow + x * 3 + 1)
        out(dst + x * 3 + 2) = img.pixels(srcRow + x * 3)
        x += 1
      }
      y += 1
    }
    out
  }

  /** Decode a 24-bit uncompressed BMP (bottom-up or top-down). Returns
    * None on anything that is not one (wrong magic, compressed, other
    * bpp, truncated pixel array) — a malformed payload must not kill
    * the partition. */
  def decodeBmp(bytes: Array[Byte]): Option[Image] = {
    if (bytes == null || bytes.length < 54 || bytes(0) != 'B' || bytes(1) != 'M')
      return None
    val off = u32(bytes, 10)
    val w = u32(bytes, 18)
    val hRaw = u32(bytes, 22)
    val topDown = hRaw < 0
    val h = math.abs(hRaw)
    val bpp = u16(bytes, 28)
    val comp = u32(bytes, 30)
    if (bpp != 24 || comp != 0 || w <= 0 || h <= 0 || w > (1 << 20) || h > (1 << 20))
      return None
    val stride = bmpStride(w)
    if (off < 54 || off.toLong + stride.toLong * h > bytes.length) return None
    val px = new Array[Byte](w * h * 3)
    var fy = 0
    while (fy < h) {
      val iy = if (topDown) fy else h - 1 - fy
      val src = off + fy * stride
      val dst = iy * w * 3
      var x = 0
      while (x < w) {
        px(dst + x * 3) = bytes(src + x * 3 + 2)     // R
        px(dst + x * 3 + 1) = bytes(src + x * 3 + 1) // G
        px(dst + x * 3 + 2) = bytes(src + x * 3)     // B
        x += 1
      }
      fy += 1
    }
    Some(Image(w, h, px))
  }

  /** Real nearest-neighbor resize over decoded pixels (floor sampling:
    * source index = dst * src / dstDim, the GDAL/stub convention). */
  def resizeNearest(img: Image, dstW: Int, dstH: Int): Image = {
    val out = new Array[Byte](dstW * dstH * 3)
    var y = 0
    while (y < dstH) {
      val sy = y * img.height / dstH
      var x = 0
      while (x < dstW) {
        val sx = x * img.width / dstW
        val s = (sy * img.width + sx) * 3
        val d = (y * dstW + x) * 3
        out(d) = img.pixels(s); out(d + 1) = img.pixels(s + 1); out(d + 2) = img.pixels(s + 2)
        x += 1
      }
      y += 1
    }
    Image(dstW, dstH, out)
  }

  /** Encode mono/interleaved PCM16LE samples as a RIFF/WAVE file. */
  def encodeWav(audio: Audio): Array[Byte] = {
    val n = audio.samples.length
    val dataLen = n * 2
    val out = new Array[Byte](44 + dataLen)
    out(0) = 'R'; out(1) = 'I'; out(2) = 'F'; out(3) = 'F'
    putU32(out, 4, 36 + dataLen)
    out(8) = 'W'; out(9) = 'A'; out(10) = 'V'; out(11) = 'E'
    out(12) = 'f'; out(13) = 'm'; out(14) = 't'; out(15) = ' '
    putU32(out, 16, 16)                      // fmt chunk size
    putU16(out, 20, 1)                       // PCM
    putU16(out, 22, audio.channels)
    putU32(out, 24, audio.sampleRate)
    putU32(out, 28, audio.sampleRate * audio.channels * 2) // byte rate
    putU16(out, 32, audio.channels * 2)      // block align
    putU16(out, 34, 16)                      // bits/sample
    out(36) = 'd'; out(37) = 'a'; out(38) = 't'; out(39) = 'a'
    putU32(out, 40, dataLen)
    var i = 0
    while (i < n) {
      putU16(out, 44 + i * 2, audio.samples(i) & 0xffff)
      i += 1
    }
    out
  }

  /** Decode a PCM16 RIFF/WAVE payload by WALKING chunks (fmt anywhere
    * before data; unknown chunks skipped with odd-length padding, per
    * the RIFF spec). Returns channel-0 samples. None on non-WAV /
    * non-PCM16 / truncated input. */
  def decodeWav(bytes: Array[Byte]): Option[Audio] = {
    if (bytes == null || bytes.length < 44) return None
    if (bytes(0) != 'R' || bytes(1) != 'I' || bytes(2) != 'F' || bytes(3) != 'F' ||
        bytes(8) != 'W' || bytes(9) != 'A' || bytes(10) != 'V' || bytes(11) != 'E')
      return None
    var pos = 12
    var rate = -1; var channels = -1; var bits = -1; var fmtOk = false
    while (pos + 8 <= bytes.length) {
      val tag = new String(bytes, pos, 4, java.nio.charset.StandardCharsets.US_ASCII)
      val len = u32(bytes, pos + 4)
      // Long arithmetic: a corrupt chunk length near Int.MaxValue would
      // wrap `pos + 8 + len` negative and slip past the bound (the
      // decodeBmp guard already does this in Long)
      if (len < 0 || pos.toLong + 8L + len.toLong > bytes.length) return None
      tag match {
        case "fmt " =>
          if (len < 16) return None
          val audioFormat = u16(bytes, pos + 8)
          channels = u16(bytes, pos + 10)
          rate = u32(bytes, pos + 12)
          bits = u16(bytes, pos + 22)
          fmtOk = audioFormat == 1 && bits == 16 && channels >= 1
        case "data" =>
          if (!fmtOk) return None
          val n = len / (2 * channels)
          val samples = new Array[Short](n)
          var i = 0
          while (i < n) {
            // channel 0 of each frame
            samples(i) = u16(bytes, pos + 8 + i * 2 * channels).toShort
            i += 1
          }
          return Some(Audio(rate, channels, samples))
        case _ => // skip (LIST, fact, ...)
      }
      pos += 8 + len + (len & 1) // RIFF pads odd chunks
    }
    None
  }
}
