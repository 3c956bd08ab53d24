package graft.operators

/** Baseline sequential JPEG (ITU T.81), grayscale, pure Scala — no
  * codec libraries. Full pipeline both ways: 8x8 forward/inverse DCT,
  * quantization (Annex-K luminance table), zigzag, differential DC +
  * run-length AC entropy coding with the standard Annex-K Huffman
  * tables, JFIF marker framing, 0xFF byte stuffing.
  *
  * JPEG is lossy in general, but images built from solid 8x8 tiles
  * whose values sit at even offsets from 128 survive the pipeline
  * EXACTLY (the DC coefficient 8*(g-128) quantizes by 16 without
  * remainder and every AC vanishes) — which is what lets a SQL oracle
  * recompute decoded statistics for the mm_jpeg query while the specs
  * cover the general lossy path via round-trip error bounds.
  */
object Jpeg {

  // ---- Annex-K constants (ITU T.81, public spec) ---------------------

  private val ZigZag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63)

  /** Standard luminance quantization table (T.81 Table K.1), natural order. */
  private val QuantLum: Array[Int] = Array(
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99)

  // Standard DC luminance Huffman spec (T.81 Table K.3): BITS + HUFFVAL
  private val DcBits = Array(0, 0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0)
  private val DcVals = Array(0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11)

  // Standard AC luminance Huffman spec (T.81 Table K.5)
  private val AcBits = Array(0, 0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7d)
  private val AcVals = Array(
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xa1, 0x08,
    0x23, 0x42, 0xb1, 0xc1, 0x15, 0x52, 0xd1, 0xf0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0a, 0x16,
    0x17, 0x18, 0x19, 0x1a, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2a, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3a, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4a, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5a, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6a, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7a, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8a, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9a, 0xa2, 0xa3, 0xa4, 0xa5, 0xa6, 0xa7,
    0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4, 0xb5, 0xb6,
    0xb7, 0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5,
    0xc6, 0xc7, 0xc8, 0xc9, 0xca, 0xd2, 0xd3, 0xd4,
    0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda, 0xe1, 0xe2,
    0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea,
    0xf1, 0xf2, 0xf3, 0xf4, 0xf5, 0xf6, 0xf7, 0xf8,
    0xf9, 0xfa)

  /** Canonical JPEG Huffman codes from a BITS/HUFFVAL spec: returns
    * (codeBySymbol, sizeBySymbol). */
  private def buildEncodeTable(bits: Array[Int], vals: Array[Int]): (Array[Int], Array[Int]) = {
    val code = new Array[Int](256)
    val size = new Array[Int](256)
    var k = 0
    var c = 0
    var len = 1
    while (len <= 16) {
      var i = 0
      while (i < bits(len)) {
        code(vals(k)) = c
        size(vals(k)) = len
        c += 1; k += 1; i += 1
      }
      c <<= 1
      len += 1
    }
    (code, size)
  }

  private lazy val (dcCode, dcSize) = buildEncodeTable(DcBits, DcVals)
  private lazy val (acCode, acSize) = buildEncodeTable(AcBits, AcVals)

  /** Decode table: for each code length, the smallest/largest code and
    * the index of its first symbol (T.81 F.2.2.3 DECODE procedure). */
  private final class DecodeTable(bits: Array[Int], vals: Array[Int]) {
    val minCode = new Array[Int](17)
    val maxCode = new Array[Int](17)
    val valPtr = new Array[Int](17)
    locally {
      var k = 0
      var c = 0
      var len = 1
      while (len <= 16) {
        if (bits(len) == 0) { maxCode(len) = -1 }
        else {
          valPtr(len) = k
          minCode(len) = c
          c += bits(len); k += bits(len)
          maxCode(len) = c - 1
        }
        c <<= 1
        len += 1
      }
    }
    def symbol(len: Int, code: Int): Int = vals(valPtr(len) + code - minCode(len))
  }

  private lazy val dcDecode = new DecodeTable(DcBits, DcVals)
  private lazy val acDecode = new DecodeTable(AcBits, AcVals)

  // ---- DCT (separable would be faster; small tiles keep this fine) ---

  private val CosTab: Array[Double] = {
    val t = new Array[Double](8 * 8)
    var x = 0
    while (x < 8) {
      var u = 0
      while (u < 8) {
        t(x * 8 + u) = math.cos((2 * x + 1) * u * math.Pi / 16.0)
        u += 1
      }
      x += 1
    }
    t
  }
  private def cNorm(u: Int): Double = if (u == 0) 1.0 / math.sqrt(2.0) else 1.0

  /** Forward 8x8 DCT-II of a level-shifted block (row-major),
    * separable: a row pass then a column pass (4x fewer multiplies
    * than the direct double sum). */
  private def fdct(in: Array[Double], out: Array[Double]): Unit = {
    val tmp = new Array[Double](64) // tmp(y,u) = sum_x in(y,x) cos(x,u)
    var y = 0
    while (y < 8) {
      var u = 0
      while (u < 8) {
        var s = 0.0
        var x = 0
        while (x < 8) { s += in(y * 8 + x) * CosTab(x * 8 + u); x += 1 }
        tmp(y * 8 + u) = s
        u += 1
      }
      y += 1
    }
    var v = 0
    while (v < 8) {
      var u = 0
      while (u < 8) {
        var s = 0.0
        var yy = 0
        while (yy < 8) { s += tmp(yy * 8 + u) * CosTab(yy * 8 + v); yy += 1 }
        out(v * 8 + u) = 0.25 * cNorm(u) * cNorm(v) * s
        u += 1
      }
      v += 1
    }
  }

  /** Inverse 8x8 DCT (T.81 A.3.3), separable like [[fdct]]. */
  private def idct(in: Array[Double], out: Array[Double]): Unit = {
    val tmp = new Array[Double](64) // tmp(v,x) = sum_u c(u) in(v,u) cos(x,u)
    var v = 0
    while (v < 8) {
      var x = 0
      while (x < 8) {
        var s = 0.0
        var u = 0
        while (u < 8) { s += cNorm(u) * in(v * 8 + u) * CosTab(x * 8 + u); u += 1 }
        tmp(v * 8 + x) = s
        x += 1
      }
      v += 1
    }
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        var s = 0.0
        var vv = 0
        while (vv < 8) { s += cNorm(vv) * tmp(vv * 8 + x) * CosTab(y * 8 + vv); vv += 1 }
        out(y * 8 + x) = 0.25 * s
        x += 1
      }
      y += 1
    }
  }

  // ---- bit I/O with 0xFF byte stuffing -------------------------------

  private final class BitWriter(out: java.io.ByteArrayOutputStream) {
    private var acc = 0
    private var nBits = 0
    def put(code: Int, size: Int): Unit = {
      acc = (acc << size) | (code & ((1 << size) - 1))
      nBits += size
      while (nBits >= 8) {
        val b = (acc >>> (nBits - 8)) & 0xff
        out.write(b)
        if (b == 0xff) out.write(0x00) // byte stuffing
        nBits -= 8
      }
    }
    def flush(): Unit = if (nBits > 0) {
      val pad = 8 - nBits
      val b = ((acc << pad) | ((1 << pad) - 1)) & 0xff // pad with 1-bits
      out.write(b)
      if (b == 0xff) out.write(0x00)
      nBits = 0
    }
  }

  private final class BitReader(data: Array[Byte], var pos: Int) {
    private var acc = 0
    private var nBits = 0
    var bad = false
    def bit(): Int = {
      if (nBits == 0) {
        if (pos >= data.length) { bad = true; return 0 }
        var b = data(pos) & 0xff; pos += 1
        if (b == 0xff) {
          if (pos >= data.length) { bad = true; return 0 }
          val m = data(pos) & 0xff
          if (m == 0x00) pos += 1            // stuffed byte
          else { bad = true; b = 0 }         // a real marker mid-scan
        }
        acc = b; nBits = 8
      }
      nBits -= 1
      (acc >>> nBits) & 1
    }
    def bits(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) { v = (v << 1) | bit(); i += 1 }
      v
    }
  }

  /** JPEG "magnitude category" of a coefficient value. */
  private def category(v: Int): Int = {
    var a = math.abs(v)
    var n = 0
    while (a != 0) { a >>= 1; n += 1 }
    n
  }

  /** T.81 F.12: EXTEND — map received magnitude bits back to a value. */
  private def extend(v: Int, t: Int): Int =
    if (t == 0) 0 else if (v < (1 << (t - 1))) v - (1 << t) + 1 else v

  // ---- encoder -------------------------------------------------------

  /** Encodes an 8-bit grayscale image as baseline sequential JPEG
    * (single component, standard Annex-K quant + Huffman tables). */
  def encodeJpegGray(width: Int, height: Int, gray: Array[Byte]): Array[Byte] = {
    require(gray.length == width * height, "gray length must be w*h")
    val out = new java.io.ByteArrayOutputStream(gray.length / 2 + 256)
    def marker(m: Int): Unit = { out.write(0xff); out.write(m) }
    def seg(m: Int, payload: Array[Int]): Unit = {
      marker(m)
      val len = payload.length + 2
      out.write(len >> 8); out.write(len & 0xff)
      payload.foreach(out.write)
    }
    marker(0xd8) // SOI
    seg(0xdb, 0 +: ZigZag.map(QuantLum(_)))                 // DQT: id 0, zigzag order
    seg(0xc0, Array(8, height >> 8, height & 0xff, width >> 8, width & 0xff,
      1, 1, 0x11, 0))                                        // SOF0: 1 comp, no subsampling
    seg(0xc4, 0x00 +: (DcBits.drop(1) ++ DcVals))            // DHT DC 0
    seg(0xc4, 0x10 +: (AcBits.drop(1) ++ AcVals))            // DHT AC 0
    seg(0xda, Array(1, 1, 0x00, 0, 63, 0))                   // SOS
    val bw = new BitWriter(out)
    val block = new Array[Double](64)
    val coef = new Array[Double](64)
    val q = new Array[Int](64)
    val bw8 = (width + 7) / 8
    val bh8 = (height + 7) / 8
    var prevDc = 0
    var by = 0
    while (by < bh8) {
      var bx = 0
      while (bx < bw8) {
        // load block, edge-replicating out-of-bounds pixels, level shift
        var y = 0
        while (y < 8) {
          val sy = math.min(by * 8 + y, height - 1)
          var x = 0
          while (x < 8) {
            val sx = math.min(bx * 8 + x, width - 1)
            block(y * 8 + x) = (gray(sy * width + sx) & 0xff) - 128.0
            x += 1
          }
          y += 1
        }
        fdct(block, coef)
        var i = 0
        while (i < 64) {
          val v = coef(i) / QuantLum(i)
          q(i) = if (v >= 0) (v + 0.5).toInt else -((-v) + 0.5).toInt
          i += 1
        }
        // DC: differential, category + magnitude bits
        val diff = q(0) - prevDc
        prevDc = q(0)
        val dt = category(diff)
        bw.put(dcCode(dt), dcSize(dt))
        if (dt > 0) bw.put(if (diff < 0) diff + (1 << dt) - 1 else diff, dt)
        // AC: run-length of zeros + category, ZRL, EOB
        var run = 0
        var k = 1
        while (k < 64) {
          val v = q(ZigZag(k))
          if (v == 0) run += 1
          else {
            while (run > 15) { bw.put(acCode(0xf0), acSize(0xf0)); run -= 16 }
            val t = category(v)
            val sym = (run << 4) | t
            bw.put(acCode(sym), acSize(sym))
            bw.put(if (v < 0) v + (1 << t) - 1 else v, t)
            run = 0
          }
          k += 1
        }
        if (run > 0) bw.put(acCode(0x00), acSize(0x00)) // EOB
        bx += 1
      }
      by += 1
    }
    bw.flush()
    marker(0xd9) // EOI
    out.toByteArray
  }

  // ---- decoder -------------------------------------------------------

  case class JpegInfo(width: Int, height: Int, meanGray: Double)

  /** Decodes a baseline grayscale JPEG produced by any conforming
    * encoder of that flavor (single component, baseline sequential,
    * one DC + one AC table, no restart markers) to exact pixels.
    * Total: malformed input yields None, never an exception — segment
    * lengths in crafted files can point reads past the buffer, so the
    * byte-parsing core is wrapped against index overruns. */
  def decodeJpegGrayPixels(bytes: Array[Byte]): Option[(Int, Int, Array[Byte])] =
    try decodeUnsafe(bytes)
    catch { case _: IndexOutOfBoundsException | _: NegativeArraySizeException => None }

  private def decodeUnsafe(bytes: Array[Byte]): Option[(Int, Int, Array[Byte])] = {
    if (bytes.length < 4 || (bytes(0) & 0xff) != 0xff || (bytes(1) & 0xff) != 0xd8) return None
    var pos = 2
    var w = 0; var h = 0
    var quant: Array[Int] = null
    var dcTab: DecodeTable = null
    var acTab: DecodeTable = null
    var scanStart = -1
    def u16(p: Int): Int = ((bytes(p) & 0xff) << 8) | (bytes(p + 1) & 0xff)
    while (scanStart < 0) {
      if (pos + 4 > bytes.length || (bytes(pos) & 0xff) != 0xff) return None
      val m = bytes(pos + 1) & 0xff
      if (m == 0xd9) return None // EOI before any scan
      val len = u16(pos + 2)
      if (pos + 2 + len > bytes.length) return None
      val p0 = pos + 4
      m match {
        case 0xdb =>
          // one 8-bit table, zigzag order
          if ((bytes(p0) & 0xf0) != 0) return None
          quant = new Array[Int](64)
          var i = 0
          while (i < 64) { quant(ZigZag(i)) = bytes(p0 + 1 + i) & 0xff; i += 1 }
        case 0xc0 =>
          if ((bytes(p0) & 0xff) != 8) return None
          h = u16(p0 + 1); w = u16(p0 + 3)
          val nComp = bytes(p0 + 5) & 0xff
          if (nComp != 1 || (bytes(p0 + 7) & 0xff) != 0x11) return None
        case 0xc1 | 0xc2 | 0xc3 | 0xc5 | 0xc6 | 0xc7 |
             0xc9 | 0xca | 0xcb | 0xcd | 0xce | 0xcf =>
          return None // only baseline sequential SOF0
        case 0xc4 =>
          var p = p0
          while (p < pos + 2 + len) {
            val tc = (bytes(p) & 0xf0) >> 4
            val bits = new Array[Int](17)
            var total = 0
            var i = 1
            while (i <= 16) { bits(i) = bytes(p + i) & 0xff; total += bits(i); i += 1 }
            if (p + 17 + total > bytes.length) return None
            val vals = new Array[Int](total)
            i = 0
            while (i < total) { vals(i) = bytes(p + 17 + i) & 0xff; i += 1 }
            val t = new DecodeTable(bits, vals)
            if (tc == 0) dcTab = t else acTab = t
            p += 17 + total
          }
        case 0xda =>
          if ((bytes(p0) & 0xff) != 1) return None
          scanStart = pos + 2 + len
        case _ => () // APPn/COM/etc: skip
      }
      if (scanStart < 0) pos += 2 + len
    }
    if (w <= 0 || h <= 0 || quant == null || dcTab == null || acTab == null) return None

    val br = new BitReader(bytes, scanStart)
    def decodeHuff(t: DecodeTable): Int = {
      var code = br.bit()
      var len = 1
      while (len <= 16 && (t.maxCode(len) < 0 || code > t.maxCode(len))) {
        code = (code << 1) | br.bit()
        len += 1
      }
      if (len > 16 || br.bad) { br.bad = true; 0 } else t.symbol(len, code)
    }
    val bw8 = (w + 7) / 8
    val bh8 = (h + 7) / 8
    val px = new Array[Byte](w * h)
    val coef = new Array[Double](64)
    val spat = new Array[Double](64)
    var prevDc = 0
    var by = 0
    while (by < bh8) {
      var bx = 0
      while (bx < bw8) {
        java.util.Arrays.fill(coef, 0.0)
        val dt = decodeHuff(dcTab)
        val diff = extend(br.bits(dt), dt)
        prevDc += diff
        coef(0) = prevDc.toDouble * quant(0)
        var k = 1
        var eob = false
        while (k < 64 && !eob) {
          val sym = decodeHuff(acTab)
          if (sym == 0x00) eob = true // EOB
          else if (sym == 0xf0) k += 16 // ZRL
          else {
            k += (sym >> 4)
            val t = sym & 0x0f
            if (k > 63 || t == 0) { br.bad = true; eob = true }
            else {
              coef(ZigZag(k)) = extend(br.bits(t), t).toDouble * quant(ZigZag(k))
              k += 1
            }
          }
        }
        if (br.bad) return None
        idct(coef, spat)
        var y = 0
        while (y < 8) {
          val dy = by * 8 + y
          if (dy < h) {
            var x = 0
            while (x < 8) {
              val dx = bx * 8 + x
              if (dx < w) {
                val v = math.round(spat(y * 8 + x) + 128.0).toInt
                px(dy * w + dx) = math.max(0, math.min(255, v)).toByte
              }
              x += 1
            }
          }
          y += 1
        }
        bx += 1
      }
      by += 1
    }
    Some((w, h, px))
  }

  /** Decode → nearest-neighbor resample → re-encode (lossy, as any
    * real JPEG resize is). */
  def resizeJpegGray(bytes: Array[Byte], newW: Int, newH: Int): Option[Array[Byte]] =
    decodeJpegGrayPixels(bytes).map { case (w, h, px) =>
      encodeJpegGray(newW, newH, Codecs.nnResample(px, 0, w, h, 1, newW, newH))
    }

  /** Mean-gray summary of a decoded JPEG. */
  def decodeJpegGray(bytes: Array[Byte]): Option[JpegInfo] =
    decodeJpegGrayPixels(bytes).map { case (w, h, px) =>
      var s = 0L
      var i = 0
      while (i < px.length) { s += px(i) & 0xff; i += 1 }
      JpegInfo(w, h, s.toDouble / (w.toLong * h))
    }
}
