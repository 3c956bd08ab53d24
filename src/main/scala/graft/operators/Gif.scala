package graft.operators

import java.nio.charset.StandardCharsets

/** GIF87a codec, pure Scala — a real LZW implementation (the
  * dictionary-growing, variable-code-width, LSB-first-packed variant
  * GIF specifies), plus the container framing: logical screen
  * descriptor, global color table, image descriptor, 255-byte data
  * sub-blocks, trailer. Lossless, so decoded pixels equal the encoder
  * input exactly and a SQL oracle can recompute decoded statistics.
  *
  * LZW here is the third distinct compression algorithm in the repo's
  * codecs (DEFLATE via the JDK for PNG, DCT+Huffman for JPEG, LZW
  * hand-rolled for GIF).
  */
object Gif {

  private val ClearBase = 256 // 8-bit palette: clear = 256, EOI = 257
  private val MaxCode = 4096

  // ---- LZW (GIF variant: LSB-first, 9..12-bit growing codes) ---------

  private final class LsbBitWriter {
    private val out = new java.io.ByteArrayOutputStream()
    private var acc = 0
    private var nBits = 0
    def put(code: Int, width: Int): Unit = {
      acc |= (code & ((1 << width) - 1)) << nBits
      nBits += width
      while (nBits >= 8) { out.write(acc & 0xff); acc >>>= 8; nBits -= 8 }
    }
    def finish(): Array[Byte] = {
      if (nBits > 0) { out.write(acc & 0xff); acc = 0; nBits = 0 }
      out.toByteArray
    }
  }

  /** GIF-flavor LZW compress of 8-bit symbols. */
  private[operators] def lzwCompress(data: Array[Byte]): Array[Byte] = {
    val clear = ClearBase
    val eoi = clear + 1
    val bw = new LsbBitWriter
    var width = 9
    var next = eoi + 1
    // dictionary: (prefixCode << 8 | byte) -> code
    var dict = new java.util.HashMap[Integer, Integer]()
    bw.put(clear, width)
    var prefix = -1
    var i = 0
    while (i < data.length) {
      val k = data(i) & 0xff
      if (prefix < 0) prefix = k
      else {
        val key = (prefix << 8) | k
        val hit = dict.get(key)
        if (hit != null) prefix = hit
        else {
          bw.put(prefix, width)
          if (next < MaxCode) {
            dict.put(key, next)
            next += 1
            if (next == (1 << width) && width < 12) width += 1
          } else {
            bw.put(clear, width)
            dict = new java.util.HashMap[Integer, Integer]()
            next = eoi + 1
            width = 9
          }
          prefix = k
        }
      }
      i += 1
    }
    if (prefix >= 0) bw.put(prefix, width)
    bw.put(eoi, width)
    bw.finish()
  }

  /** GIF-flavor LZW decompress; None on any malformed stream. */
  private[operators] def lzwDecompress(data: Array[Byte], expected: Int): Option[Array[Byte]] = {
    val clear = ClearBase
    val eoi = clear + 1
    val prefix = new Array[Int](MaxCode)
    val suffix = new Array[Byte](MaxCode)
    val stack = new Array[Byte](MaxCode)
    val out = new Array[Byte](expected)
    var outPos = 0
    var width = 9
    var next = eoi + 1
    var prev = -1
    var acc = 0
    var nBits = 0
    var pos = 0
    def firstChar(c0: Int): Byte = {
      var c = c0
      while (c >= clear) c = prefix(c)
      c.toByte
    }
    def emit(c0: Int): Boolean = { // expand code to output, false on overflow
      var n = 0
      var c = c0
      while (c >= clear) { stack(n) = suffix(c); n += 1; c = prefix(c) }
      stack(n) = c.toByte; n += 1
      if (outPos + n > expected) return false
      while (n > 0) { n -= 1; out(outPos) = stack(n); outPos += 1 }
      true
    }
    while (outPos < expected) {
      while (nBits < width) {
        if (pos >= data.length) return None // truncated stream
        acc |= (data(pos) & 0xff) << nBits
        nBits += 8; pos += 1
      }
      val code = acc & ((1 << width) - 1)
      acc >>>= width; nBits -= width
      if (code == clear) { width = 9; next = eoi + 1; prev = -1 }
      else if (code == eoi) return if (outPos == expected) Some(out) else None
      else if (prev < 0) {
        if (code >= clear) return None // first code must be a root
        if (!emit(code)) return None
        prev = code
      } else {
        if (code > next || (code == next && next >= MaxCode)) return None
        val cur =
          if (code < next) code
          else { // KwKwK: code == next, not yet in the table
            prefix(next) = prev; suffix(next) = firstChar(prev)
            next += 1
            // "early change": the decoder's table is one entry behind
            // the encoder's at read time, so it must widen one early
            if (next == (1 << width) - 1 && width < 12) width += 1
            if (!emit(next - 1)) return None
            prev = next - 1
            -1
          }
        if (cur >= 0) {
          if (next < MaxCode) {
            prefix(next) = prev; suffix(next) = firstChar(cur)
            next += 1
            if (next == (1 << width) - 1 && width < 12) width += 1
          }
          if (!emit(cur)) return None
          prev = cur
        }
      }
    }
    Some(out)
  }

  // ---- container -----------------------------------------------------

  /** Encodes 8-bit pixels as GIF87a with a 256-entry grayscale global
    * color table (index i maps to RGB(i,i,i)). */
  def encodeGifGray(width: Int, height: Int, gray: Array[Byte]): Array[Byte] = {
    require(gray.length == width * height, "gray length must be w*h")
    val out = new java.io.ByteArrayOutputStream(gray.length / 2 + 800)
    out.write("GIF87a".getBytes(StandardCharsets.US_ASCII))
    def u16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    u16(width); u16(height)
    out.write(0xf7) // GCT present, 8-bit color resolution, 256 entries
    out.write(0)    // background color index
    out.write(0)    // aspect ratio
    var i = 0
    while (i < 256) { out.write(i); out.write(i); out.write(i); i += 1 }
    out.write(0x2c) // image descriptor
    u16(0); u16(0); u16(width); u16(height)
    out.write(0)    // no local table, not interlaced
    out.write(8)    // LZW minimum code size
    val lzw = lzwCompress(gray)
    var off = 0
    while (off < lzw.length) { // 255-byte sub-blocks
      val n = math.min(255, lzw.length - off)
      out.write(n)
      out.write(lzw, off, n)
      off += n
    }
    out.write(0)    // block terminator
    out.write(0x3b) // trailer
    out.toByteArray
  }

  case class GifInfo(width: Int, height: Int, meanR: Double, meanG: Double,
                     meanB: Double)

  /** Decodes a GIF87a/89a image (first image block, non-interlaced) to
    * palette-mapped RGB pixels; None on anything malformed. */
  def decodeGifPixels(bytes: Array[Byte]): Option[(Int, Int, Array[Byte])] = {
    if (bytes.length < 13) return None
    val sig = new String(bytes, 0, 6, StandardCharsets.US_ASCII)
    if (sig != "GIF87a" && sig != "GIF89a") return None
    def u16(p: Int): Int = (bytes(p) & 0xff) | ((bytes(p + 1) & 0xff) << 8)
    var pos = 6
    pos += 4 // logical screen w/h (image descriptor carries its own)
    val packed = bytes(pos) & 0xff
    pos += 3
    var palette: Array[Byte] = null
    if ((packed & 0x80) != 0) {
      val n = 1 << ((packed & 0x07) + 1)
      if (pos + 3 * n > bytes.length) return None
      palette = java.util.Arrays.copyOfRange(bytes, pos, pos + 3 * n)
      pos += 3 * n
    }
    // walk blocks to the first image descriptor
    while (pos < bytes.length && (bytes(pos) & 0xff) == 0x21) { // extensions
      pos += 2 // introducer + label
      var bs = if (pos < bytes.length) bytes(pos) & 0xff else -1
      while (bs > 0) {
        pos += 1 + bs
        bs = if (pos < bytes.length) bytes(pos) & 0xff else -1
      }
      if (bs < 0) return None
      pos += 1 // terminator
    }
    if (pos >= bytes.length || (bytes(pos) & 0xff) != 0x2c) return None
    if (pos + 10 > bytes.length) return None
    val w = u16(pos + 5); val h = u16(pos + 7)
    val ipacked = bytes(pos + 9) & 0xff
    pos += 10
    if (w <= 0 || h <= 0) return None
    // long arithmetic: u16 dims reach 65535 each, so w*h overflows Int
    // for crafted headers (negative allocation size downstream). 2^24
    // pixels (4096x4096) bounds the RGB buffer at 48 MB.
    if (w.toLong * h > (1L << 24)) return None
    if ((ipacked & 0x40) != 0) return None // interlaced: out of scope
    if ((ipacked & 0x80) != 0) {           // local color table wins
      val n = 1 << ((ipacked & 0x07) + 1)
      if (pos + 3 * n > bytes.length) return None
      palette = java.util.Arrays.copyOfRange(bytes, pos, pos + 3 * n)
      pos += 3 * n
    }
    if (palette == null) return None
    if (pos >= bytes.length) return None
    val mcs = bytes(pos) & 0xff
    if (mcs != 8) return None // matches the 256-color flavor we emit
    pos += 1
    // concatenate data sub-blocks
    val lzw = new java.io.ByteArrayOutputStream()
    var bs = if (pos < bytes.length) bytes(pos) & 0xff else -1
    while (bs > 0) {
      if (pos + 1 + bs > bytes.length) return None
      lzw.write(bytes, pos + 1, bs)
      pos += 1 + bs
      bs = if (pos < bytes.length) bytes(pos) & 0xff else -1
    }
    if (bs < 0) return None
    lzwDecompress(lzw.toByteArray, w * h).map { idx =>
      val px = new Array[Byte](w * h * 3)
      val maxIdx = palette.length / 3
      var i = 0
      while (i < idx.length) {
        val v = idx(i) & 0xff
        val p = if (v < maxIdx) v * 3 else 0
        px(i * 3) = palette(p); px(i * 3 + 1) = palette(p + 1); px(i * 3 + 2) = palette(p + 2)
        i += 1
      }
      (w, h, px)
    }
  }

  /** Channel-mean summary of a decoded GIF. */
  def decodeGif(bytes: Array[Byte]): Option[GifInfo] = decodeGifPixels(bytes).map {
    case (w, h, px) =>
      var (sr, sg, sb) = (0L, 0L, 0L)
      var i = 0
      while (i < px.length) {
        sr += px(i) & 0xff; sg += px(i + 1) & 0xff; sb += px(i + 2) & 0xff
        i += 3
      }
      val n = (w * h).toDouble
      GifInfo(w, h, sr / n, sg / n, sb / n)
  }
}
