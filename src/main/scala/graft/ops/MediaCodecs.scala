package graft.ops

import java.util.zip.{CRC32, Deflater, Inflater}

/** REAL pixel/sample codecs for the container formats that need no external
  * codec library — pure JVM, deterministic, allocation-bounded:
  *
  *  - PNG (ISO/IEC 15948): 8-bit greyscale / RGB / RGBA, non-interlaced;
  *    zlib inflate via `java.util.zip.Inflater`, full scanline unfiltering
  *    (None/Sub/Up/Average/Paeth), chunk CRC validation.
  *  - BMP (BITMAPINFOHEADER): 24-bit uncompressed BI_RGB, bottom-up or
  *    top-down.
  *  - WAV (RIFF): PCM 8/16-bit sample extraction.
  *
  * With these, [[Multimodal.DecodeStub]]'s remit shrinks to the
  * entropy-coded formats (JPEG pixels, video frames) that genuinely require
  * a codec library this container lacks.
  *
  * Scale-hardening: every decoder is fail-closed (`None` on anything
  * malformed, truncated or hostile — never a throw) and bounds-checked so
  * crafted headers cannot allocate unboundedly: total pixel count is capped
  * at [[MaxPixels]] and the inflate loop writes into an exact-size output
  * buffer (a compression bomb hits the buffer boundary and is rejected,
  * not materialized).
  *
  * Reference analog: valijson has no media surface; this implements the
  * decode step of SURVEY §2's multimodal pipeline whose header-metadata
  * half lives in `functions/ImageDimsExpr|AudioMetaExpr|VideoMetaExpr`.
  */
object MediaCodecs {

  /** Decoded raster: row-major, channel-interleaved 8-bit samples. */
  final case class DecodedImage(width: Int, height: Int, channels: Int,
                                pixels: Array[Byte])

  /** Decoded PCM audio clip. Samples are sign-normalized: 16-bit LE signed
    * as-is; 8-bit unsigned shifted by -128 (the WAV convention). */
  final case class DecodedAudio(channels: Int, sampleRate: Int, bits: Int,
                                samples: Array[Int])

  /** Pixel-count cap: a crafted 60000×60000 IHDR must not allocate 10 GB.
    * 1<<24 pixels ≈ a 4096×4096 RGBA raster = 64 MB — generous for any
    * thumbnail/feature pipeline; full-size assets should be decoded by a
    * real codec service, not inside an executor task. */
  val MaxPixels: Int = 1 << 24

  // ---- PNG -----------------------------------------------------------------

  private val pngSig = Array[Int](0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A)

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xFF
  private def be32(b: Array[Byte], i: Int): Long =
    ((u8(b, i).toLong << 24) | (u8(b, i + 1) << 16) | (u8(b, i + 2) << 8) | u8(b, i + 3)) & 0xFFFFFFFFL
  private def le16(b: Array[Byte], i: Int): Int = u8(b, i) | (u8(b, i + 1) << 8)
  private def le32(b: Array[Byte], i: Int): Long =
    (u8(b, i).toLong | (u8(b, i + 1).toLong << 8) | (u8(b, i + 2).toLong << 16) | (u8(b, i + 3).toLong << 24)) & 0xFFFFFFFFL

  /** Decode a PNG payload. `None` for: bad signature, unsupported shape
    * (bit depth ≠ 8, palette/16-bit/interlaced), CRC mismatch, truncated
    * chunks, oversized rasters, corrupt deflate streams. */
  def decodePng(bytes: Array[Byte]): Option[DecodedImage] = {
    if (bytes == null || bytes.length < 8 + 25) return None
    var i = 0
    while (i < 8) { if (u8(bytes, i) != pngSig(i)) return None; i += 1 }
    var pos = 8
    var width = -1; var height = -1; var channels = -1
    var sawIhdr = false; var sawIend = false
    val idat = new java.io.ByteArrayOutputStream()
    while (!sawIend) {
      if (pos + 8 > bytes.length) return None
      val len = be32(bytes, pos)
      if (len > Int.MaxValue - 12 || pos + 12 + len > bytes.length) return None
      val l = len.toInt
      val ctype = new String(bytes, pos + 4, 4, java.nio.charset.StandardCharsets.US_ASCII)
      val crc = new CRC32()
      crc.update(bytes, pos + 4, 4 + l)
      if (crc.getValue != be32(bytes, pos + 8 + l)) return None
      val d = pos + 8
      ctype match {
        case "IHDR" =>
          if (l != 13 || sawIhdr) return None
          sawIhdr = true
          val w = be32(bytes, d); val h = be32(bytes, d + 4)
          val bitDepth = u8(bytes, d + 8); val colorType = u8(bytes, d + 9)
          val compression = u8(bytes, d + 10); val filter = u8(bytes, d + 11)
          val interlace = u8(bytes, d + 12)
          if (w < 1 || h < 1 || w * h > MaxPixels) return None
          if (bitDepth != 8 || compression != 0 || filter != 0 || interlace != 0) return None
          channels = colorType match {
            case 0 => 1 // greyscale
            case 2 => 3 // RGB
            case 6 => 4 // RGBA
            case _ => return None // palette / grey+alpha unsupported
          }
          if (w * h * channels.toLong > Int.MaxValue - 16) return None
          width = w.toInt; height = h.toInt
        case "IDAT" =>
          if (!sawIhdr) return None
          idat.write(bytes, d, l)
        case "IEND" => sawIend = true
        case _      => () // ancillary chunk: CRC-checked above, content skipped
      }
      pos += 12 + l
    }
    if (!sawIhdr) return None
    val stride = width * channels
    val raw = new Array[Byte](height * (1 + stride))
    if (!inflateExactly(idat.toByteArray, raw)) return None
    // unfilter scanlines in place into the output raster
    val out = new Array[Byte](height * stride)
    val bpp = channels
    var y = 0
    while (y < height) {
      val ft = u8(raw, y * (1 + stride))
      val rowIn = y * (1 + stride) + 1
      val rowOut = y * stride
      val prevOut = (y - 1) * stride
      var x = 0
      ft match {
        case 0 => // None
          System.arraycopy(raw, rowIn, out, rowOut, stride)
        case 1 => // Sub
          while (x < stride) {
            val left = if (x >= bpp) u8(out, rowOut + x - bpp) else 0
            out(rowOut + x) = ((u8(raw, rowIn + x) + left) & 0xFF).toByte; x += 1
          }
        case 2 => // Up
          while (x < stride) {
            val up = if (y > 0) u8(out, prevOut + x) else 0
            out(rowOut + x) = ((u8(raw, rowIn + x) + up) & 0xFF).toByte; x += 1
          }
        case 3 => // Average
          while (x < stride) {
            val left = if (x >= bpp) u8(out, rowOut + x - bpp) else 0
            val up = if (y > 0) u8(out, prevOut + x) else 0
            out(rowOut + x) = ((u8(raw, rowIn + x) + ((left + up) >> 1)) & 0xFF).toByte; x += 1
          }
        case 4 => // Paeth
          while (x < stride) {
            val left = if (x >= bpp) u8(out, rowOut + x - bpp) else 0
            val up = if (y > 0) u8(out, prevOut + x) else 0
            val ul = if (y > 0 && x >= bpp) u8(out, prevOut + x - bpp) else 0
            out(rowOut + x) = ((u8(raw, rowIn + x) + paeth(left, up, ul)) & 0xFF).toByte; x += 1
          }
        case _ => return None
      }
      y += 1
    }
    Some(DecodedImage(width, height, channels, out))
  }

  private def paeth(a: Int, b: Int, c: Int): Int = {
    val p = a + b - c
    val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
    if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
  }

  /** Inflate `in` into exactly `out.length` bytes: shorter (truncated
    * stream) or longer (decompression bomb relative to the declared dims)
    * both fail — output never exceeds the IHDR-derived size. */
  private def inflateExactly(in: Array[Byte], out: Array[Byte]): Boolean = {
    val inf = new Inflater()
    try {
      inf.setInput(in)
      var off = 0
      while (off < out.length && !inf.finished()) {
        val n = inf.inflate(out, off, out.length - off)
        // n == 0 with output still pending means the stream is exhausted,
        // needs a preset dictionary, or just finished short — all failures
        // here (and returning eagerly also rules out any zero-progress spin)
        if (n == 0) return false
        off += n
      }
      if (off != out.length) return false
      // any trailing uncompressed remainder means the stream disagrees
      // with the declared dimensions
      if (!inf.finished()) {
        val probe = new Array[Byte](1)
        if (inf.inflate(probe, 0, 1) > 0) return false
      }
      true
    } catch { case _: java.util.zip.DataFormatException => false }
    finally inf.end()
  }

  /** Encode an 8-bit raster as a valid PNG (fixture/round-trip support; the
    * serving path is [[decodePng]]). `filterOfRow` picks the per-scanline
    * filter type (0-4) so fixtures exercise every unfilter branch. */
  def encodePng(img: DecodedImage, filterOfRow: Int => Int = _ % 5): Array[Byte] = {
    require(Set(1, 3, 4).contains(img.channels), "channels must be 1, 3 or 4")
    require(img.pixels.length == img.width * img.height * img.channels)
    val stride = img.width * img.channels
    val bpp = img.channels
    val raw = new Array[Byte](img.height * (1 + stride))
    var y = 0
    while (y < img.height) {
      val ft = ((filterOfRow(y) % 5) + 5) % 5
      raw(y * (1 + stride)) = ft.toByte
      val rowOut = y * (1 + stride) + 1
      val row = y * stride
      val prev = (y - 1) * stride
      var x = 0
      while (x < stride) {
        val cur = u8(img.pixels, row + x)
        val left = if (x >= bpp) u8(img.pixels, row + x - bpp) else 0
        val up = if (y > 0) u8(img.pixels, prev + x) else 0
        val ul = if (y > 0 && x >= bpp) u8(img.pixels, prev + x - bpp) else 0
        val enc = ft match {
          case 0 => cur
          case 1 => cur - left
          case 2 => cur - up
          case 3 => cur - ((left + up) >> 1)
          case 4 => cur - paeth(left, up, ul)
        }
        raw(rowOut + x) = (enc & 0xFF).toByte
        x += 1
      }
      y += 1
    }
    val deflater = new Deflater(Deflater.DEFAULT_COMPRESSION)
    deflater.setInput(raw); deflater.finish()
    val comp = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    while (!deflater.finished()) comp.write(buf, 0, deflater.deflate(buf))
    deflater.end()
    val outStream = new java.io.ByteArrayOutputStream()
    outStream.write(pngSig.map(_.toByte), 0, 8)
    def chunk(ctype: String, data: Array[Byte]): Unit = {
      val len = data.length
      outStream.write(Array[Byte]((len >>> 24).toByte, (len >>> 16).toByte,
        (len >>> 8).toByte, len.toByte), 0, 4)
      val tb = ctype.getBytes(java.nio.charset.StandardCharsets.US_ASCII)
      outStream.write(tb, 0, 4)
      outStream.write(data, 0, len)
      val crc = new CRC32(); crc.update(tb); crc.update(data)
      val v = crc.getValue
      outStream.write(Array[Byte]((v >>> 24).toByte, (v >>> 16).toByte,
        (v >>> 8).toByte, v.toByte), 0, 4)
    }
    val colorType = img.channels match { case 1 => 0; case 3 => 2; case 4 => 6 }
    val ihdr = java.nio.ByteBuffer.allocate(13)
    ihdr.putInt(img.width).putInt(img.height)
      .put(8.toByte).put(colorType.toByte).put(0.toByte).put(0.toByte).put(0.toByte)
    chunk("IHDR", ihdr.array())
    chunk("IDAT", comp.toByteArray)
    chunk("IEND", Array.emptyByteArray)
    outStream.toByteArray
  }

  // ---- BMP -----------------------------------------------------------------

  /** Decode a 24-bit uncompressed BI_RGB BMP (BITMAPINFOHEADER), bottom-up
    * (positive height) or top-down (negative). Output is RGB interleaved
    * (BMP stores BGR; this flips to the PNG convention). */
  def decodeBmp(bytes: Array[Byte]): Option[DecodedImage] = {
    if (bytes == null || bytes.length < 54) return None
    if (u8(bytes, 0) != 'B' || u8(bytes, 1) != 'M') return None
    val dataOff = le32(bytes, 10)
    val hdrSize = le32(bytes, 14)
    if (hdrSize < 40) return None
    val w = le32(bytes, 18).toInt
    val hRaw = le32(bytes, 22).toInt // signed: negative = top-down
    val planes = le16(bytes, 26); val bpp = le16(bytes, 28)
    val compression = le32(bytes, 30)
    if (planes != 1 || bpp != 24 || compression != 0) return None
    val topDown = hRaw < 0
    val h = math.abs(hRaw)
    if (w < 1 || h < 1 || w.toLong * h > MaxPixels) return None
    val rowBytes = (w * 3 + 3) & ~3 // rows pad to 4-byte boundaries
    if (dataOff > Int.MaxValue || dataOff + rowBytes.toLong * h > bytes.length) return None
    val off = dataOff.toInt
    val out = new Array[Byte](w * h * 3)
    var y = 0
    while (y < h) {
      val srcRow = off + (if (topDown) y else h - 1 - y) * rowBytes
      var x = 0
      while (x < w) {
        val s = srcRow + x * 3; val d = (y * w + x) * 3
        out(d) = bytes(s + 2); out(d + 1) = bytes(s + 1); out(d + 2) = bytes(s) // BGR→RGB
        x += 1
      }
      y += 1
    }
    Some(DecodedImage(w, h, 3, out))
  }

  /** Encode an RGB raster as a bottom-up 24-bit BMP (fixture support). */
  def encodeBmp(img: DecodedImage): Array[Byte] = {
    require(img.channels == 3, "BMP fixture encoder is 24-bit RGB")
    val rowBytes = (img.width * 3 + 3) & ~3
    val dataSize = rowBytes * img.height
    val total = 54 + dataSize
    val b = java.nio.ByteBuffer.allocate(total).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put('B'.toByte).put('M'.toByte).putInt(total).putInt(0).putInt(54)
    b.putInt(40).putInt(img.width).putInt(img.height)
      .putShort(1).putShort(24).putInt(0).putInt(dataSize)
      .putInt(2835).putInt(2835).putInt(0).putInt(0)
    var y = img.height - 1
    while (y >= 0) { // bottom-up
      var x = 0
      while (x < img.width) {
        val s = (y * img.width + x) * 3
        b.put(img.pixels(s + 2)).put(img.pixels(s + 1)).put(img.pixels(s)) // RGB→BGR
        x += 1
      }
      var pad = rowBytes - img.width * 3
      while (pad > 0) { b.put(0.toByte); pad -= 1 }
      y -= 1
    }
    b.array()
  }

  // ---- WAV PCM -------------------------------------------------------------

  /** Decode a RIFF/WAVE PCM payload's samples (8-bit unsigned or 16-bit
    * signed LE; format tag 1 = PCM only). Multi-channel samples come out
    * frame-interleaved, matching the byte order on disk. */
  def decodeWavPcm(bytes: Array[Byte]): Option[DecodedAudio] = {
    if (bytes == null || bytes.length < 44) return None
    if (!(u8(bytes, 0) == 'R' && u8(bytes, 1) == 'I' && u8(bytes, 2) == 'F' && u8(bytes, 3) == 'F')) return None
    if (!(u8(bytes, 8) == 'W' && u8(bytes, 9) == 'A' && u8(bytes, 10) == 'V' && u8(bytes, 11) == 'E')) return None
    var pos = 12
    var channels = -1; var rate = -1; var bits = -1
    var dataOff = -1; var dataLen = -1
    while (pos + 8 <= bytes.length && (channels < 0 || dataOff < 0)) {
      val id = new String(bytes, pos, 4, java.nio.charset.StandardCharsets.US_ASCII)
      val len = le32(bytes, pos + 4)
      if (len > Int.MaxValue - 8 || pos + 8 + len > bytes.length) return None
      val l = len.toInt
      if (id == "fmt ") {
        if (l < 16) return None
        val tag = le16(bytes, pos + 8)
        if (tag != 1) return None // PCM only; compressed formats stay stubbed
        channels = le16(bytes, pos + 10)
        rate = le32(bytes, pos + 12).toInt
        bits = le16(bytes, pos + 22)
        if (channels < 1 || channels > 64 || rate < 1 || (bits != 8 && bits != 16)) return None
      } else if (id == "data") { dataOff = pos + 8; dataLen = l }
      pos += 8 + l + (l & 1) // chunks are word-aligned
    }
    if (channels < 0 || dataOff < 0) return None
    val bytesPer = bits / 8
    val n = dataLen / bytesPer
    if (n > MaxPixels) return None // same allocation cap as rasters
    val samples = new Array[Int](n)
    var i = 0
    while (i < n) {
      samples(i) =
        if (bits == 8) u8(bytes, dataOff + i) - 128
        else (le16(bytes, dataOff + i * 2) << 16) >> 16 // sign-extend
      i += 1
    }
    Some(DecodedAudio(channels, rate, bits, samples))
  }

  /** Encode PCM samples as a minimal RIFF/WAVE file (fixture support). */
  def encodeWavPcm(audio: DecodedAudio): Array[Byte] = {
    require(audio.bits == 8 || audio.bits == 16)
    val bytesPer = audio.bits / 8
    val dataLen = audio.samples.length * bytesPer
    val b = java.nio.ByteBuffer.allocate(44 + dataLen).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put("RIFF".getBytes).putInt(36 + dataLen).put("WAVE".getBytes)
    b.put("fmt ".getBytes).putInt(16).putShort(1)
      .putShort(audio.channels.toShort).putInt(audio.sampleRate)
      .putInt(audio.sampleRate * audio.channels * bytesPer)
      .putShort((audio.channels * bytesPer).toShort).putShort(audio.bits.toShort)
    b.put("data".getBytes).putInt(dataLen)
    audio.samples.foreach { s =>
      if (audio.bits == 8) b.put(((s + 128) & 0xFF).toByte)
      else b.putShort(s.toShort)
    }
    b.array()
  }
}
