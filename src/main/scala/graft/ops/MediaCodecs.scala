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
          // bound each side BEFORE multiplying: w and h are raw unsigned-32
          // Longs here, and (2^32-1)^2 overflows Long — a crafted IHDR with
          // both dims huge would wrap negative and slip past a product-only
          // cap (the BMP/GIF paths read narrower ints and cannot overflow)
          if (w < 1 || h < 1 || w > MaxPixels || h > MaxPixels ||
              w * h > MaxPixels) return None
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
    * filter type (0-4) so fixtures exercise every unfilter branch.
    * `level` is the zlib effort (any level yields the same decoded raster
    * — PNG is lossless; hot pipeline paths whose output is immediately
    * re-decoded pass BEST_SPEED). */
  def encodePng(img: DecodedImage, filterOfRow: Int => Int = _ % 5,
                level: Int = Deflater.DEFAULT_COMPRESSION): Array[Byte] = {
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
    val deflater = new Deflater(level)
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

  // ---- GIF -----------------------------------------------------------------

  /** Decode the FIRST image of a GIF87a/GIF89a payload to RGB: full LZW
    * decompression (variable code width, clear/end codes, 4096-entry
    * dictionary), global/local color tables, interlaced row ordering.
    * `None` fail-closed on malformed data: bad magic, truncated blocks,
    * out-of-range codes, oversized rasters, missing color table. */
  def decodeGif(bytes: Array[Byte]): Option[DecodedImage] = {
    if (bytes == null || bytes.length < 13 + 10) return None
    val magic = new String(bytes, 0, 6, java.nio.charset.StandardCharsets.US_ASCII)
    if (magic != "GIF87a" && magic != "GIF89a") return None
    val flags = u8(bytes, 10)
    var pos = 13
    var globalTable: Array[Byte] = null
    if ((flags & 0x80) != 0) {
      val n = 2 << (flags & 7) // palette entries
      if (pos + n * 3 > bytes.length) return None
      globalTable = java.util.Arrays.copyOfRange(bytes, pos, pos + n * 3)
      pos += n * 3
    }
    // walk blocks to the first image descriptor
    while (pos < bytes.length) {
      u8(bytes, pos) match {
        case 0x3B => return None // trailer before any image
        case 0x21 =>             // extension: label + sub-blocks
          pos += 2
          var done = false
          while (!done) {
            if (pos >= bytes.length) return None
            val sz = u8(bytes, pos); pos += 1 + sz
            done = sz == 0
          }
        case 0x2C =>
          if (pos + 10 > bytes.length) return None
          val w = le16(bytes, pos + 5); val h = le16(bytes, pos + 7)
          val iFlags = u8(bytes, pos + 9)
          pos += 10
          if (w < 1 || h < 1 || w.toLong * h > MaxPixels) return None
          var table = globalTable
          if ((iFlags & 0x80) != 0) {
            val n = 2 << (iFlags & 7)
            if (pos + n * 3 > bytes.length) return None
            table = java.util.Arrays.copyOfRange(bytes, pos, pos + n * 3)
            pos += n * 3
          }
          if (table == null) return None
          val interlaced = (iFlags & 0x40) != 0
          if (pos >= bytes.length) return None
          val minCode = u8(bytes, pos); pos += 1
          if (minCode < 2 || minCode > 8) return None
          // concatenate the data sub-blocks
          val data = new java.io.ByteArrayOutputStream()
          var done = false
          while (!done) {
            if (pos >= bytes.length) return None
            val sz = u8(bytes, pos); pos += 1
            if (sz == 0) done = true
            else {
              if (pos + sz > bytes.length) return None
              data.write(bytes, pos, sz); pos += sz
            }
          }
          val indices = lzwDecode(data.toByteArray, minCode, w * h).getOrElse(return None)
          val nColors = table.length / 3
          val out = new Array[Byte](w * h * 3)
          val rowOrder: Array[Int] =
            if (!interlaced) Array.range(0, h)
            else {
              val o = new Array[Int](h); var k = 0
              for ((start, step) <- Seq((0, 8), (4, 8), (2, 4), (1, 2)); y <- start until h by step) {
                o(k) = y; k += 1
              }
              o
            }
          var srcRow = 0
          while (srcRow < h) {
            val y = rowOrder(srcRow)
            var x = 0
            while (x < w) {
              val idx = indices(srcRow * w + x) & 0xFF
              if (idx >= nColors) return None
              val d = (y * w + x) * 3
              out(d) = table(idx * 3); out(d + 1) = table(idx * 3 + 1); out(d + 2) = table(idx * 3 + 2)
              x += 1
            }
            srcRow += 1
          }
          return Some(DecodedImage(w, h, 3, out))
        case _ => return None
      }
    }
    None
  }

  /** GIF-flavor LZW decode: `minCode`-sized alphabet, clear/end codes,
    * growing code width to 12 bits. Exactly `expected` indices or None. */
  private def lzwDecode(data: Array[Byte], minCode: Int, expected: Int): Option[Array[Byte]] = {
    val clear = 1 << minCode; val end = clear + 1
    val prefix = new Array[Int](4096); val suffix = new Array[Byte](4096)
    val stack = new Array[Byte](4097)
    val out = new Array[Byte](expected)
    var outPos = 0
    var next = end + 1; var width = minCode + 1
    var oldCode = -1; var firstByte = 0.toByte
    var bitBuf = 0; var bitCnt = 0; var pos = 0
    var i = 0
    while (i < clear) { prefix(i) = -1; suffix(i) = i.toByte; i += 1 }
    while (outPos < expected) {
      while (bitCnt < width) {
        if (pos >= data.length) return None
        bitBuf |= (data(pos) & 0xFF) << bitCnt; bitCnt += 8; pos += 1
      }
      val code = bitBuf & ((1 << width) - 1)
      bitBuf >>>= width; bitCnt -= width
      if (code == clear) { next = end + 1; width = minCode + 1; oldCode = -1 }
      else if (code == end) return if (outPos == expected) Some(out) else None
      else {
        if (code > next || (code == next && oldCode < 0)) return None
        var sp = 0
        var cur = if (code == next) { stack(sp) = firstByte; sp += 1; oldCode } else code
        while (cur >= clear + 2) { // walk the prefix chain down to a root
          stack(sp) = suffix(cur); sp += 1; cur = prefix(cur)
          if (sp > 4096) return None
        }
        // cur is now a root (0..clear-1)
        if (cur < 0 || cur >= clear) return None
        firstByte = suffix(cur)
        stack(sp) = firstByte; sp += 1
        // emit reversed
        while (sp > 0 && outPos < expected) { sp -= 1; out(outPos) = stack(sp); outPos += 1 }
        if (sp > 0) return None // produced more than the raster holds
        if (oldCode >= 0 && next < 4096) {
          prefix(next) = oldCode; suffix(next) = firstByte; next += 1
          if (next < 4096 && (next & (next - 1)) == 0 && width < 12) width += 1
        }
        oldCode = code
      }
    }
    Some(out)
  }

  /** GIF-flavor LZW encode (fixture support): standard string-table builder
    * with clear/end codes and growing code width — output decodes with any
    * conformant GIF reader. */
  private[ops] def lzwEncode(indices: Array[Byte], minCode: Int): Array[Byte] = {
    val clear = 1 << minCode; val end = clear + 1
    val out = new java.io.ByteArrayOutputStream()
    var bitBuf = 0; var bitCnt = 0
    var width = minCode + 1
    def emit(code: Int): Unit = {
      bitBuf |= code << bitCnt; bitCnt += width
      while (bitCnt >= 8) { out.write(bitBuf & 0xFF); bitBuf >>>= 8; bitCnt -= 8 }
    }
    val table = new java.util.HashMap[Long, Integer]()
    var next = end + 1
    emit(clear)
    var curSeq = -1 // table code of the current sequence
    var i = 0
    while (i < indices.length) {
      val k = indices(i) & 0xFF
      if (curSeq < 0) curSeq = k
      else {
        val key = (curSeq.toLong << 12) | k
        val hit = table.get(key)
        if (hit != null) curSeq = hit.intValue()
        else {
          emit(curSeq)
          if (next < 4096) {
            table.put(key, Integer.valueOf(next))
            next += 1
            // width-flip phase: the decoder is always ONE add behind the
            // encoder when reading a code (the KwKwK gap), so the encoder
            // grows its width one add LATER — when next passes 1<<width —
            // while the decoder grows when its own next reaches 1<<width.
            // Cross-checked empirically against the JDK ImageIO GIF codec
            // in both directions (GifCodecSpec).
            if (next == (1 << width) + 1 && width < 12) width += 1
          } else {
            emit(clear); table.clear(); next = end + 1; width = minCode + 1
          }
          curSeq = k
        }
      }
      i += 1
    }
    if (curSeq >= 0) emit(curSeq)
    emit(end)
    if (bitCnt > 0) out.write(bitBuf & 0xFF)
    out.toByteArray
  }

  /** Encode a palette raster as a minimal non-interlaced GIF89a (fixture
    * support): global color table + one image block. `indices` are palette
    * indices; `palette` is RGB-interleaved with a power-of-two entry count
    * between 4 and 256. */
  def encodeGif(width: Int, height: Int, indices: Array[Byte], palette: Array[Byte]): Array[Byte] = {
    require(indices.length == width * height)
    val nColors = palette.length / 3
    require(nColors >= 4 && nColors <= 256 && (nColors & (nColors - 1)) == 0)
    require(palette.length % 3 == 0)
    val sizeBits = Integer.numberOfTrailingZeros(nColors) // 2..8
    val minCode = math.max(2, sizeBits)
    val out = new java.io.ByteArrayOutputStream()
    out.write("GIF89a".getBytes(java.nio.charset.StandardCharsets.US_ASCII))
    def le16w(v: Int): Unit = { out.write(v & 0xFF); out.write((v >> 8) & 0xFF) }
    le16w(width); le16w(height)
    out.write(0x80 | (sizeBits - 1)) // global table present
    out.write(0); out.write(0)       // bg index, aspect
    out.write(palette, 0, palette.length)
    out.write(0x2C)                  // image descriptor
    le16w(0); le16w(0); le16w(width); le16w(height)
    out.write(0)                     // no local table, not interlaced
    out.write(minCode)
    val lzw = lzwEncode(indices, minCode)
    var off = 0
    while (off < lzw.length) {
      val n = math.min(255, lzw.length - off)
      out.write(n); out.write(lzw, off, n); off += n
    }
    out.write(0)    // block terminator
    out.write(0x3B) // trailer
    out.toByteArray
  }

  // ---- JDK ImageIO bridge (JPEG et al.) ------------------------------------

  @transient private lazy val imageIoInit: Unit = {
    // headless + no temp-file disk cache: executor tasks must not write
    // scratch files or touch a display
    System.setProperty("java.awt.headless", "true")
    javax.imageio.ImageIO.setUseCache(false)
  }

  // ONE JPEG ImageReader per executor thread, reused across rows:
  // `ImageIO.read` scans the reader registry, instantiates a reader and
  // disposes it PER CALL — for the small frames a media pipeline decodes
  // by the million, that fixed cost rivals the decode itself. The cached
  // reader is the same registry-first JDK codec ImageIO.read would pick,
  // so the decoded raster is bit-identical; on any failure the thread's
  // reader is discarded and the call falls back to the generic path.
  @transient private lazy val jpegReader =
    new ThreadLocal[javax.imageio.ImageReader] {
      override def initialValue(): javax.imageio.ImageReader = {
        imageIoInit
        val it = javax.imageio.ImageIO.getImageReadersByFormatName("jpeg")
        if (it.hasNext) it.next() else null
      }
    }

  private def readJpegPooled(bytes: Array[Byte]): java.awt.image.BufferedImage = {
    val reader = jpegReader.get()
    if (reader == null)
      return javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    try {
      val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        reader.setInput(iis, true, true)
        reader.read(0)
      } finally {
        try reader.setInput(null) catch { case scala.util.control.NonFatal(_) => () }
        iis.close()
      }
    } catch { case scala.util.control.NonFatal(_) =>
      // a mid-read abort can leave reader state dirty: drop the pooled
      // instance and retry once via the stock path (fail-closed above it)
      try reader.dispose() catch { case scala.util.control.NonFatal(_) => () }
      jpegReader.remove()
      javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    }
  }

  /** Decode via the JDK's BUILT-IN ImageIO codecs (`java.desktop` — part
    * of the JDK itself, not an external dependency): notably baseline and
    * progressive JPEG, which no reasonable pure-Scala reimplementation
    * should shadow. Output is normalized to RGB-interleaved 8-bit;
    * deterministic for a fixed JDK. Fail-closed: `None` on anything the
    * JDK cannot read or that exceeds [[MaxPixels]]. */
  def decodeJdkImage(bytes: Array[Byte]): Option[DecodedImage] = {
    imageIoInit
    if (bytes == null || bytes.length < 4) return None
    try {
      // JPEG fast path (SOI marker): thread-pooled reader, same JDK codec
      val img =
        if ((bytes(0) & 0xFF) == 0xFF && (bytes(1) & 0xFF) == 0xD8)
          readJpegPooled(bytes)
        else javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      if (img == null) return None
      val w = img.getWidth; val h = img.getHeight
      if (w < 1 || h < 1 || w.toLong * h > MaxPixels) return None
      val out = new Array[Byte](w * h * 3)
      val row = new Array[Int](w)
      var y = 0
      while (y < h) {
        img.getRGB(0, y, w, 1, row, 0, w)
        var x = 0
        while (x < w) {
          val v = row(x); val d = (y * w + x) * 3
          out(d) = ((v >> 16) & 0xFF).toByte
          out(d + 1) = ((v >> 8) & 0xFF).toByte
          out(d + 2) = (v & 0xFF).toByte
          x += 1
        }
        y += 1
      }
      Some(DecodedImage(w, h, 3, out))
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** Encode an RGB raster as baseline JPEG via the JDK writer (fixture
    * support; decode is the serving path). */
  def encodeJpeg(img: DecodedImage): Array[Byte] = {
    imageIoInit
    require(img.channels == 3, "JPEG fixture encoder is RGB")
    val bi = new java.awt.image.BufferedImage(img.width, img.height,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < img.height) {
      var x = 0
      while (x < img.width) {
        val s = (y * img.width + x) * 3
        bi.setRGB(x, y, ((img.pixels(s) & 0xFF) << 16) |
          ((img.pixels(s + 1) & 0xFF) << 8) | (img.pixels(s + 2) & 0xFF))
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(bi, "jpeg", bos)
    bos.toByteArray
  }

  // ---- MJPEG AVI (video frames) ---------------------------------------------

  /** Extract the compressed video frames of an MJPEG AVI payload: walks the
    * RIFF structure to the `movi` LIST and returns each `..dc`/`..db` chunk
    * (one JPEG image per frame, decodable with [[decodeJdkImage]]). This is
    * REAL video-frame extraction for the one video codec whose image layer
    * the JDK ships; inter-frame codecs (H.264 etc.) remain the declared
    * stub. Fail-closed `None` on malformed RIFF; the total extracted byte
    * size is capped (4×[[MaxPixels]]) so a crafted header cannot balloon.
    * Frames inside `rec ` grouping LISTs are also collected. */
  def mjpegFrames(bytes: Array[Byte]): Option[IndexedSeq[Array[Byte]]] = {
    if (bytes == null || bytes.length < 24) return None
    def fourCC(i: Int): String =
      new String(bytes, i, 4, java.nio.charset.StandardCharsets.US_ASCII)
    if (fourCC(0) != "RIFF" || fourCC(8) != "AVI ") return None
    val riffLen = le32(bytes, 4)
    if (8 + riffLen > bytes.length) return None
    val limit = (8 + riffLen).toInt
    val frames = Vector.newBuilder[Array[Byte]]
    var total = 0L
    def isFrameChunk(id: String): Boolean =
      id.length == 4 && id(0).isDigit && id(1).isDigit &&
        (id.substring(2) == "dc" || id.substring(2) == "db")
    // walk chunks at one level; recurse into LISTs we care about. Depth is
    // capped: a legal AVI nests at most movi → rec , but a crafted payload
    // of back-to-back nested `LIST…movi` headers (12 bytes per level) would
    // otherwise recurse ~len/12 deep and die in StackOverflowError — an
    // Error no fail-closed caller catches
    def walk(start: Int, end: Int, inMovi: Boolean, depth: Int): Boolean = {
      if (depth > 8) return false
      var pos = start
      while (pos + 8 <= end) {
        val id = fourCC(pos)
        val len = le32(bytes, pos + 4)
        if (len > Int.MaxValue - 8 || pos + 8 + len > end) return false
        val l = len.toInt
        if (id == "LIST") {
          if (l < 4) return false
          val listType = fourCC(pos + 8)
          if (listType == "movi" || (inMovi && listType == "rec "))
            { if (!walk(pos + 12, pos + 8 + l, inMovi = true, depth + 1)) return false }
          // other LISTs (hdrl etc.): skipped, not validated in depth
        } else if (inMovi && isFrameChunk(id)) {
          total += l
          if (total > 4L * MaxPixels) return false
          frames += java.util.Arrays.copyOfRange(bytes, pos + 8, pos + 8 + l)
        }
        pos += 8 + l + (l & 1) // RIFF chunks are word-aligned
      }
      true
    }
    if (!walk(12, limit, inMovi = false, depth = 0)) return None
    val out = frames.result()
    if (out.isEmpty) None else Some(out)
  }

  /** Encode JPEG frames as a minimal MJPEG AVI (fixture support): RIFF →
    * hdrl (avih + strl/strh/strf) + movi with one `00dc` chunk per frame. */
  def encodeMjpegAvi(frames: Seq[Array[Byte]], width: Int, height: Int,
                     fps: Int = 10): Array[Byte] = {
    require(frames.nonEmpty)
    val ascii = java.nio.charset.StandardCharsets.US_ASCII
    def chunk(id: String, data: Array[Byte]): Array[Byte] = {
      val pad = data.length & 1
      val b = java.nio.ByteBuffer.allocate(8 + data.length + pad)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      b.put(id.getBytes(ascii)).putInt(data.length).put(data)
      if (pad == 1) b.put(0.toByte)
      b.array()
    }
    def list(listType: String, children: Array[Byte]): Array[Byte] = {
      val b = java.nio.ByteBuffer.allocate(12 + children.length)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      b.put("LIST".getBytes(ascii)).putInt(4 + children.length)
        .put(listType.getBytes(ascii)).put(children)
      b.array()
    }
    val maxFrame = frames.map(_.length).max
    val avih = java.nio.ByteBuffer.allocate(56).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    avih.putInt(1000000 / fps).putInt(maxFrame * fps).putInt(0)
      .putInt(0) // flags: no idx1 index is written (parsers don't need one)
      .putInt(frames.length).putInt(0).putInt(1).putInt(maxFrame)
      .putInt(width).putInt(height).putInt(0).putInt(0).putInt(0).putInt(0)
    val strh = java.nio.ByteBuffer.allocate(56).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    strh.put("vids".getBytes(ascii)).put("MJPG".getBytes(ascii))
      .putInt(0).putShort(0).putShort(0).putInt(0)
      .putInt(1).putInt(fps).putInt(0).putInt(frames.length)
      .putInt(maxFrame).putInt(-1).putInt(0)
      .putShort(0).putShort(0).putShort(width.toShort).putShort(height.toShort)
    val strf = java.nio.ByteBuffer.allocate(40).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    strf.putInt(40).putInt(width).putInt(height).putShort(1).putShort(24)
      .put("MJPG".getBytes(ascii)).putInt(width * height * 3)
      .putInt(0).putInt(0).putInt(0).putInt(0)
    val hdrl = list("hdrl", chunk("avih", avih.array()) ++
      list("strl", chunk("strh", strh.array()) ++ chunk("strf", strf.array())))
    val movi = list("movi", frames.toArray.flatMap(f => chunk("00dc", f)))
    val body = hdrl ++ movi
    val out = java.nio.ByteBuffer.allocate(12 + body.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put("RIFF".getBytes(ascii)).putInt(4 + body.length)
      .put("AVI ".getBytes(ascii)).put(body)
    out.array()
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

  /** Decode ANY in-reach image format: the pure-JVM parsers first (cheaper,
    * fail-closed), then the JDK's built-in ImageIO for JPEG (sniffed by
    * SOI marker so arbitrary binaries don't pay an ImageIO probe). */
  def decodeImage(bytes: Array[Byte]): Option[DecodedImage] =
    decodePng(bytes)
      .orElse(decodeBmp(bytes))
      .orElse(decodeGif(bytes))
      .orElse {
        if (bytes != null && bytes.length > 2 &&
            (bytes(0) & 0xFF) == 0xFF && (bytes(1) & 0xFF) == 0xD8)
          decodeJdkImage(bytes)
        else None
      }

  /** REAL bilinear resample (pixel-center aligned, clamped edges) of a
    * decoded raster, any channel count. Pixel-center mapping
    * `src = (dst + 0.5) * (srcDim/dstDim) - 0.5` is the standard
    * convention (what imaging libraries call `align_corners=false`);
    * on a channelwise-linear gradient the result is exact up to
    * round-to-nearest, which is what makes closed-form verification of
    * resized fixtures possible. Upscale works too (callers that only
    * shrink cap the scale themselves). */
  /** Max |err| of an RGB raster against per-channel closed-form expected
    * values — the shared verdict kernel of the lossy-decode oracle queries
    * (JPEG decode, MJPEG frames, bilinear resize), which differ only in
    * their expected-gradient functions. Non-RGB input fails the verdict
    * outright (Int.MaxValue) rather than mis-indexing. */
  def maxGradientErr(img: DecodedImage,
                     r: (Int, Int) => Double,
                     g: (Int, Int) => Double,
                     b: (Int, Int) => Double): Int = {
    if (img.channels != 3) return Int.MaxValue
    var maxErr = 0; var y = 0
    while (y < img.height) {
      var x = 0
      while (x < img.width) {
        val d = (y * img.width + x) * 3
        def e(i: Int, expect: Double): Int =
          math.abs((img.pixels(d + i) & 0xFF) - expect).toInt
        val err = math.max(e(0, r(x, y)), math.max(e(1, g(x, y)), e(2, b(x, y))))
        if (err > maxErr) maxErr = err
        x += 1
      }
      y += 1
    }
    maxErr
  }

  def resizeBilinear(img: DecodedImage, targetW: Int, targetH: Int): DecodedImage = {
    require(targetW >= 1 && targetH >= 1 && targetW.toLong * targetH <= MaxPixels)
    if (targetW == img.width && targetH == img.height) return img
    val nc = img.channels
    val out = new Array[Byte](targetW * targetH * nc)
    val sx = img.width.toDouble / targetW
    val sy = img.height.toDouble / targetH
    var ty = 0
    while (ty < targetH) {
      val fy = (ty + 0.5) * sy - 0.5
      val y0 = math.max(0, math.min(img.height - 1, math.floor(fy).toInt))
      val y1 = math.min(img.height - 1, y0 + 1)
      val wy = math.max(0.0, math.min(1.0, fy - y0))
      var tx = 0
      while (tx < targetW) {
        val fx = (tx + 0.5) * sx - 0.5
        val x0 = math.max(0, math.min(img.width - 1, math.floor(fx).toInt))
        val x1 = math.min(img.width - 1, x0 + 1)
        val wx = math.max(0.0, math.min(1.0, fx - x0))
        var c = 0
        while (c < nc) {
          val p00 = img.pixels((y0 * img.width + x0) * nc + c) & 0xFF
          val p01 = img.pixels((y0 * img.width + x1) * nc + c) & 0xFF
          val p10 = img.pixels((y1 * img.width + x0) * nc + c) & 0xFF
          val p11 = img.pixels((y1 * img.width + x1) * nc + c) & 0xFF
          val top = p00 + (p01 - p00) * wx
          val bot = p10 + (p11 - p10) * wx
          val v = top + (bot - top) * wy
          out((ty * targetW + tx) * nc + c) =
            math.max(0, math.min(255, math.round(v).toInt)).toByte
          c += 1
        }
        tx += 1
      }
      ty += 1
    }
    DecodedImage(targetW, targetH, nc, out)
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
