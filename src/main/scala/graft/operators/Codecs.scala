package graft.operators

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets

/** Real decoders for self-contained media formats — pure byte parsing,
  * no codec libraries: WAV/PCM + G.711 μ-law/A-law audio, PPM (P6) and
  * PNG images, and the AVI/MJPEG container walk (per-frame JPEG via
  * [[Jpeg]]; GIF87a lives in [[Gif]]). These replace the deterministic
  * stub in [[Multimodal]] for every format the pipeline emits; only
  * foreign MP3/H.264 bitstreams still fall through to the stub.
  */
object Codecs {

  // ---- WAV (RIFF/WAVE, 16-bit PCM) -----------------------------------

  case class WavInfo(channels: Int, sampleRate: Int, bitsPerSample: Int,
                     nSamples: Int, meanAbsAmplitude: Double)

  /** Emits a minimal RIFF/WAVE file: fmt chunk (PCM) + data chunk. */
  def encodeWav(samples: Array[Short], sampleRate: Int = 8000,
                channels: Int = 1): Array[Byte] = {
    val dataLen = samples.length * 2
    val bb = ByteBuffer.allocate(44 + dataLen).order(ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes(StandardCharsets.US_ASCII)).putInt(36 + dataLen)
    bb.put("WAVE".getBytes(StandardCharsets.US_ASCII))
    bb.put("fmt ".getBytes(StandardCharsets.US_ASCII)).putInt(16)
    bb.putShort(1) // PCM
    bb.putShort(channels.toShort)
    bb.putInt(sampleRate)
    bb.putInt(sampleRate * channels * 2) // byte rate
    bb.putShort((channels * 2).toShort)  // block align
    bb.putShort(16)                      // bits per sample
    bb.put("data".getBytes(StandardCharsets.US_ASCII)).putInt(dataLen)
    samples.foreach(bb.putShort)
    bb.array()
  }

  // ---- G.711 μ-law (ITU-T telephony companding, WAV format 7) --------

  private val MuLawBias = 0x84 // 132
  private val MuLawClip = 32635

  /** Encodes one 16-bit linear PCM sample to an 8-bit μ-law code
    * (ITU-T G.711: sign + 3-bit segment + 4-bit mantissa, transmitted
    * one's-complemented). */
  def muLawEncodeSample(sample: Int): Int = {
    val sign = if (sample < 0) 0x80 else 0
    var mag = math.min(math.abs(sample), MuLawClip) + MuLawBias
    var exp = 7
    var mask = 0x4000
    while (exp > 0 && (mag & mask) == 0) { exp -= 1; mask >>= 1 }
    val mant = (mag >> (exp + 3)) & 0x0f
    ~(sign | (exp << 4) | mant) & 0xff
  }

  /** Decodes one 8-bit μ-law code back to a 16-bit linear sample —
    * closed-form: ((mant·8 + 132) << exp) − 132, sign from the top bit. */
  def muLawDecodeSample(code: Int): Int = {
    val u = ~code & 0xff
    val exp = (u >> 4) & 0x07
    val mant = u & 0x0f
    val mag = (((mant << 3) + MuLawBias) << exp) - MuLawBias
    if ((u & 0x80) != 0) -mag else mag
  }

  // ---- G.711 A-law (the European companding variant, WAV format 6) --

  /** Encodes one 16-bit linear sample to an 8-bit A-law code (ITU-T
    * G.711: sign + segment + mantissa, transmitted XOR 0x55). */
  def aLawEncodeSample(sample: Int): Int = {
    val sign = if (sample >= 0) 0x80 else 0
    var mag = math.min(math.abs(sample), 32767)
    val code =
      if (mag < 256) (mag >> 4)
      else {
        var exp = 7
        var mask = 0x4000
        while (exp > 1 && (mag & mask) == 0) { exp -= 1; mask >>= 1 }
        (exp << 4) | ((mag >> (exp + 3)) & 0x0f)
      }
    (sign | code) ^ 0x55
  }

  /** Decodes one 8-bit A-law code back to a 16-bit linear sample —
    * closed-form: exp=0 → mant·16+8, else (mant·16+264)<<(exp−1). */
  def aLawDecodeSample(code: Int): Int = {
    val a = code ^ 0x55
    val exp = (a >> 4) & 0x07
    val mant = a & 0x0f
    val mag = if (exp == 0) (mant << 4) + 8 else ((mant << 4) + 0x108) << (exp - 1)
    if ((a & 0x80) != 0) mag else -mag
  }

  /** Emits a RIFF/WAVE file in format 7 (μ-law, 8 bits per sample):
    * each 16-bit input sample is G.711-companded to one byte — a real
    * 2:1 compressed audio format. */
  def encodeWavMuLaw(samples: Array[Short], sampleRate: Int = 8000,
                     channels: Int = 1): Array[Byte] =
    encodeWavMuLawCodes(samples.map(s => muLawEncodeSample(s.toInt).toByte),
      sampleRate, channels)

  /** Format-6/7 WAV whose data bytes ARE the given companded codes (no
    * companding step — lets a SQL oracle own the exact code values). */
  private def encodeWavCompanded(fmt: Int, codes: Array[Byte], sampleRate: Int,
                                 channels: Int): Array[Byte] = {
    val dataLen = codes.length
    val bb = ByteBuffer.allocate(44 + dataLen).order(ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes(StandardCharsets.US_ASCII)).putInt(36 + dataLen)
    bb.put("WAVE".getBytes(StandardCharsets.US_ASCII))
    bb.put("fmt ".getBytes(StandardCharsets.US_ASCII)).putInt(16)
    bb.putShort(fmt.toShort)         // 6 = A-law, 7 = μ-law
    bb.putShort(channels.toShort)
    bb.putInt(sampleRate)
    bb.putInt(sampleRate * channels) // byte rate: 1 byte/sample
    bb.putShort(channels.toShort)    // block align
    bb.putShort(8)                   // bits per sample
    bb.put("data".getBytes(StandardCharsets.US_ASCII)).putInt(dataLen)
    bb.put(codes)
    bb.array()
  }

  def encodeWavMuLawCodes(codes: Array[Byte], sampleRate: Int = 8000,
                          channels: Int = 1): Array[Byte] =
    encodeWavCompanded(7, codes, sampleRate, channels)

  /** Format-6 (A-law) RIFF/WAVE from 16-bit samples. */
  def encodeWavALaw(samples: Array[Short], sampleRate: Int = 8000,
                    channels: Int = 1): Array[Byte] =
    encodeWavCompanded(6,
      samples.map(s => aLawEncodeSample(s.toInt).toByte), sampleRate, channels)

  /** Format-6 (A-law) RIFF/WAVE from raw code bytes. */
  def encodeWavALawCodes(codes: Array[Byte], sampleRate: Int = 8000,
                         channels: Int = 1): Array[Byte] =
    encodeWavCompanded(6, codes, sampleRate, channels)

  /** Shared RIFF/WAVE chunk walk: validates the header, decodes the
    * fmt chunk, and positions the buffer AT the data payload.
    * Returns (format, channels, sampleRate, bits, dataSize, buffer).
    * Accepts format 1 (16-bit linear PCM) and formats 6/7 (8-bit
    * G.711 A-law/μ-law); None for anything else or any malformed
    * chunk — both decoders consume this one parser, so bounds
    * hardening lands in exactly one place. */
  private def wavData(bytes: Array[Byte])
      : Option[(Int, Int, Int, Int, Int, ByteBuffer)] = {
    if (bytes.length < 44) return None
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val riff = new Array[Byte](4); bb.get(riff)
    if (new String(riff, StandardCharsets.US_ASCII) != "RIFF") return None
    bb.getInt // riff size
    val wave = new Array[Byte](4); bb.get(wave)
    if (new String(wave, StandardCharsets.US_ASCII) != "WAVE") return None
    var channels = 0
    var sampleRate = 0
    var bits = 0
    var format = 0
    while (bb.remaining() >= 8) {
      val id = new Array[Byte](4); bb.get(id)
      val size = bb.getInt
      if (size < 0) return None // corrupted chunk length
      new String(id, StandardCharsets.US_ASCII) match {
        case "fmt " =>
          if (size < 16 || bb.remaining() < size) return None
          val fmtStart = bb.position()
          format = bb.getShort
          channels = bb.getShort
          sampleRate = bb.getInt
          bb.getInt; bb.getShort
          bits = bb.getShort
          val ok = (format == 1 && bits == 16) ||
            ((format == 6 || format == 7) && bits == 8)
          if (!ok) return None // 16-bit PCM or 8-bit A-law/mu-law only
          bb.position(fmtStart + size)
        case "data" =>
          if (bb.remaining() < size || channels == 0) return None
          return Some((format, channels, sampleRate, bits, size, bb))
        case _ =>
          if (bb.remaining() < size) return None
          bb.position(bb.position() + size)
      }
    }
    None
  }

  /** PCM16 (format 1) WAV → (sampleRate, samples). Companded formats
    * go through [[decodeWav]]'s stats path; resampling operates on
    * linear PCM only (production transcodes companded audio to PCM
    * first — that's [[muLawDecodeSample]]/[[aLawDecodeSample]]). */
  def decodeWavSamples(bytes: Array[Byte]): Option[(Int, Array[Short])] =
    wavData(bytes).collect { case (1, _, rate, _, size, bb) =>
      val n = size / 2
      val out = new Array[Short](n)
      var i = 0
      while (i < n) { out(i) = bb.getShort; i += 1 }
      (rate, out)
    }

  /** 2× linear-interpolation upsample of a PCM16 WAV (8 kHz telephony
    * → 16 kHz, the audio analog of an image resize): out[2i] = s[i],
    * out[2i+1] = (s[i] + s[i+1]) / 2 with TRUNCATING integer division
    * (matches SQL `//`, so the oracle replays the interpolation
    * exactly), output length 2n − 1 (no extrapolated tail sample),
    * re-encoded at twice the source rate. */
  def resampleWav2x(bytes: Array[Byte]): Option[Array[Byte]] =
    decodeWavSamples(bytes).map { case (rate, s) =>
      val n = s.length
      val out = new Array[Short](math.max(2 * n - 1, 0))
      var i = 0
      while (i < n) {
        out(2 * i) = s(i)
        if (i < n - 1) out(2 * i + 1) = ((s(i) + s(i + 1)) / 2).toShort
        i += 1
      }
      encodeWav(out, rate * 2)
    }

  /** Amplitude stats over a RIFF/WAVE payload: format 1 (16-bit
    * linear PCM), format 6 (8-bit G.711 A-law), and format 7 (8-bit
    * G.711 μ-law) — companded bytes are expanded to linear before the
    * amplitude stats. None for anything else. */
  def decodeWav(bytes: Array[Byte]): Option[WavInfo] =
    wavData(bytes).map { case (format, channels, sampleRate, bits, size, bb) =>
      var sum = 0L
      var i = 0
      val n = if (format == 1) size / 2 else size
      format match {
        case 7 =>
          while (i < n) { sum += math.abs(muLawDecodeSample(bb.get() & 0xff)); i += 1 }
        case 6 =>
          while (i < n) { sum += math.abs(aLawDecodeSample(bb.get() & 0xff)); i += 1 }
        case _ =>
          while (i < n) { sum += math.abs(bb.getShort.toLong); i += 1 }
      }
      val mean = if (n == 0) 0.0 else sum.toDouble / n
      WavInfo(channels, sampleRate, bits, n, mean)
    }

  // ---- PPM (P6 binary, 8-bit RGB) ------------------------------------

  case class PpmInfo(width: Int, height: Int, meanR: Double, meanG: Double,
                     meanB: Double)

  /** Emits a binary P6 PPM image from an RGB pixel array. */
  def encodePpm(width: Int, height: Int, rgb: Array[Byte]): Array[Byte] = {
    require(rgb.length == width * height * 3, "rgb length must be w*h*3")
    val header = s"P6\n$width $height\n255\n".getBytes(StandardCharsets.US_ASCII)
    val out = new Array[Byte](header.length + rgb.length)
    System.arraycopy(header, 0, out, 0, header.length)
    System.arraycopy(rgb, 0, out, header.length, rgb.length)
    out
  }

  /** Parses the P6 header; Some((width, height, pixelDataOffset)) when
    * well-formed with a complete pixel payload. */
  private def parseP6Header(bytes: Array[Byte]): Option[(Int, Int, Int)] = {
    if (bytes.length < 11 || bytes(0) != 'P' || bytes(1) != '6') return None
    var pos = 2
    def skipWs(): Unit = {
      var done = false
      while (!done && pos < bytes.length) {
        val c = bytes(pos)
        if (c == '#') { while (pos < bytes.length && bytes(pos) != '\n') pos += 1 }
        else if (c == ' ' || c == '\t' || c == '\n' || c == '\r') pos += 1
        else done = true
      }
    }
    def readInt(): Int = {
      skipWs()
      var v = 0
      var any = false
      while (pos < bytes.length && bytes(pos) >= '0' && bytes(pos) <= '9') {
        v = v * 10 + (bytes(pos) - '0'); pos += 1; any = true
      }
      if (!any) -1 else v
    }
    val w = readInt(); val h = readInt(); val maxVal = readInt()
    if (w <= 0 || h <= 0 || maxVal != 255 || pos >= bytes.length) return None
    pos += 1 // single whitespace after maxval
    if (bytes.length - pos < w * h * 3) return None
    Some((w, h, pos))
  }

  /** Parses a binary P6 PPM; None if malformed or truncated. */
  def decodePpm(bytes: Array[Byte]): Option[PpmInfo] = parseP6Header(bytes).map {
    case (w, h, pos) =>
      val need = w * h * 3
      var (sr, sg, sb) = (0L, 0L, 0L)
      var i = 0
      while (i < need) {
        sr += bytes(pos + i) & 0xff
        sg += bytes(pos + i + 1) & 0xff
        sb += bytes(pos + i + 2) & 0xff
        i += 3
      }
      val n = (w * h).toDouble
      PpmInfo(w, h, sr / n, sg / n, sb / n)
  }

  /** Nearest-neighbor resample of `ch`-channel interleaved pixels
    * starting at `off` (shared by the PPM/PNG/JPEG resize paths). */
  private[operators] def nnResample(src: Array[Byte], off: Int, w: Int, h: Int,
                                    ch: Int, newW: Int, newH: Int): Array[Byte] = {
    val out = new Array[Byte](newW * newH * ch)
    var y = 0
    while (y < newH) {
      val sy = y * h / newH
      var x = 0
      while (x < newW) {
        val sp = off + (sy * w + x * w / newW) * ch
        val dp = (y * newW + x) * ch
        var c = 0
        while (c < ch) { out(dp + c) = src(sp + c); c += 1 }
        x += 1
      }
      y += 1
    }
    out
  }

  /** REAL image resize: nearest-neighbor resample of a binary P6 PPM
    * (the honest pixel-level operation, not a byte truncation). */
  def resizePpm(bytes: Array[Byte], newW: Int, newH: Int): Option[Array[Byte]] =
    parseP6Header(bytes).map { case (w, h, pos) =>
      encodePpm(newW, newH, nnResample(bytes, pos, w, h, 3, newW, newH))
    }

  /** Decode → nearest-neighbor resample → re-encode for PNG. */
  def resizePng(bytes: Array[Byte], newW: Int, newH: Int): Option[Array[Byte]] =
    decodePngPixels(bytes).map { case (w, h, px) =>
      encodePng(newW, newH, nnResample(px, 0, w, h, 3, newW, newH))
    }

  // ---- PNG (8-bit RGB truecolor, zlib via java.util.zip) -------------
  //
  // A real COMPRESSED image codec with zero external dependencies: the
  // JDK ships zlib (Deflater/Inflater/CRC32), and everything else —
  // chunk framing, CRC verification, scanline filtering — is spec work
  // (RFC 2083). Lossless, so decoded pixels are exactly the encoder's
  // input and a SQL oracle can recompute decoded statistics from the
  // pixel generator without any codec.

  private val PngSig = Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a)

  private def paeth(a: Int, b: Int, c: Int): Int = {
    val p = a + b - c
    val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
    if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
  }

  /** Filters one scanline with filter type `ft` into `out` (PNG spec
    * §6; bpp = 3). `prior` is the UNFILTERED previous row (zeros for
    * the first). */
  private def filterRow(ft: Int, raw: Array[Byte], rawOff: Int,
                        prior: Array[Byte], priorOff: Int, stride: Int,
                        out: Array[Byte], outOff: Int): Unit = {
    var x = 0
    while (x < stride) {
      val r = raw(rawOff + x) & 0xff
      val left = if (x >= 3) raw(rawOff + x - 3) & 0xff else 0
      val up = prior(priorOff + x) & 0xff
      val upLeft = if (x >= 3) prior(priorOff + x - 3) & 0xff else 0
      val v = ft match {
        case 0 => r
        case 1 => r - left
        case 2 => r - up
        case 3 => r - ((left + up) >> 1)
        case 4 => r - paeth(left, up, upLeft)
      }
      out(outOff + x) = v.toByte
      x += 1
    }
  }

  /** Emits a real PNG: IHDR (8-bit truecolor, non-interlaced) + IDAT
    * (zlib-deflated scanlines, per-row adaptive filter chosen by the
    * minimum-sum-of-absolute-differences heuristic) + IEND, with a
    * CRC32 on every chunk. `forceFilter` (0-4) pins every scanline to
    * one filter type — used by specs to exercise each unfilter path. */
  def encodePng(width: Int, height: Int, rgb: Array[Byte],
                forceFilter: Int = -1): Array[Byte] = {
    require(rgb.length == width * height * 3, "rgb length must be w*h*3")
    val stride = width * 3
    // filtered scanlines: 1 filter-type byte + stride bytes per row
    val raw = new Array[Byte]((stride + 1) * height)
    val zeroRow = new Array[Byte](stride)
    val candidate = new Array[Byte](stride)
    var y = 0
    while (y < height) {
      val rowOff = y * stride
      val prior = if (y == 0) zeroRow else rgb
      val priorOff = if (y == 0) 0 else rowOff - stride
      var bestFt = 0
      var bestCost = Long.MaxValue
      var ft = if (forceFilter >= 0) forceFilter else 0
      val ftEnd = if (forceFilter >= 0) forceFilter else 4
      while (ft <= ftEnd) {
        filterRow(ft, rgb, rowOff, prior, priorOff, stride, candidate, 0)
        var cost = 0L
        var x = 0
        while (x < stride) { cost += math.abs(candidate(x).toInt); x += 1 }
        if (cost < bestCost) {
          bestCost = cost; bestFt = ft
          System.arraycopy(candidate, 0, raw, y * (stride + 1) + 1, stride)
        }
        ft += 1
      }
      raw(y * (stride + 1)) = bestFt.toByte
      y += 1
    }
    // zlib-deflate the filtered stream
    val deflater = new java.util.zip.Deflater(java.util.zip.Deflater.DEFAULT_COMPRESSION)
    deflater.setInput(raw); deflater.finish()
    val zBuf = new java.io.ByteArrayOutputStream(raw.length / 2 + 64)
    val tmp = new Array[Byte](8192)
    while (!deflater.finished()) zBuf.write(tmp, 0, deflater.deflate(tmp))
    deflater.end()

    def chunk(out: java.io.ByteArrayOutputStream, typ: String, data: Array[Byte]): Unit = {
      val bb = ByteBuffer.allocate(4).order(ByteOrder.BIG_ENDIAN).putInt(data.length)
      out.write(bb.array())
      val typB = typ.getBytes(StandardCharsets.US_ASCII)
      out.write(typB); out.write(data)
      val crc = new java.util.zip.CRC32()
      crc.update(typB); crc.update(data)
      out.write(ByteBuffer.allocate(4).order(ByteOrder.BIG_ENDIAN)
        .putInt(crc.getValue.toInt).array())
    }
    val out = new java.io.ByteArrayOutputStream(zBuf.size() + 64)
    out.write(PngSig)
    val ihdr = ByteBuffer.allocate(13).order(ByteOrder.BIG_ENDIAN)
      .putInt(width).putInt(height)
      .put(8.toByte)  // bit depth
      .put(2.toByte)  // color type: truecolor RGB
      .put(0.toByte).put(0.toByte).put(0.toByte) // deflate, adaptive filter, no interlace
    chunk(out, "IHDR", ihdr.array())
    chunk(out, "IDAT", zBuf.toByteArray)
    chunk(out, "IEND", Array.emptyByteArray)
    out.toByteArray
  }

  /** Decodes an 8-bit truecolor non-interlaced PNG to its exact RGB
    * pixels: signature + chunk walk with CRC32 verification, multi-IDAT
    * zlib inflate, and full scanline unfiltering (all five PNG filter
    * types). None on anything malformed, truncated, CRC-corrupt, or a
    * PNG flavor outside 8-bit RGB. */
  def decodePngPixels(bytes: Array[Byte]): Option[(Int, Int, Array[Byte])] = {
    if (bytes.length < PngSig.length + 12) return None
    var i = 0
    while (i < PngSig.length) { if (bytes(i) != PngSig(i)) return None; i += 1 }
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.BIG_ENDIAN)
    bb.position(PngSig.length)
    var w = 0; var h = 0
    var seenIhdr = false; var seenIend = false
    val idat = new java.io.ByteArrayOutputStream()
    while (!seenIend && bb.remaining() >= 12) {
      val len = bb.getInt
      // len > bytes.length also catches the crafted len+8 Int overflow
      if (len < 0 || len > bytes.length || bb.remaining() < len + 8) return None
      val typB = new Array[Byte](4); bb.get(typB)
      val typ = new String(typB, StandardCharsets.US_ASCII)
      val data = new Array[Byte](len); bb.get(data)
      val crc = new java.util.zip.CRC32()
      crc.update(typB); crc.update(data)
      if (crc.getValue.toInt != bb.getInt) return None // corrupt chunk
      typ match {
        case "IHDR" =>
          if (len != 13) return None
          val ib = ByteBuffer.wrap(data).order(ByteOrder.BIG_ENDIAN)
          w = ib.getInt; h = ib.getInt
          val (depth, color, comp, filt, interlace) =
            (ib.get(), ib.get(), ib.get(), ib.get(), ib.get())
          // only the flavor we emit: 8-bit truecolor, non-interlaced
          if (w <= 0 || h <= 0 || depth != 8 || color != 2 ||
              comp != 0 || filt != 0 || interlace != 0) return None
          // long arithmetic: IHDR dims reach Int.MaxValue each, so
          // stride = w*3 and (stride+1)*h overflow Int for crafted
          // (CRC-valid) headers. 2^24 pixels bounds the buffers.
          if (w.toLong * h > (1L << 24)) return None
          seenIhdr = true
        case "IDAT" => if (!seenIhdr) return None else idat.write(data)
        case "IEND" => seenIend = true
        case _ => () // ancillary chunk — CRC-checked, otherwise skipped
      }
    }
    if (!seenIhdr || !seenIend || idat.size() == 0) return None
    val stride = w * 3
    val raw = new Array[Byte]((stride + 1) * h)
    val inflater = new java.util.zip.Inflater()
    inflater.setInput(idat.toByteArray)
    try {
      var off = 0
      while (off < raw.length && !inflater.finished()) {
        val n = inflater.inflate(raw, off, raw.length - off)
        if (n == 0 && inflater.needsInput()) return None // truncated stream
        off += n
      }
      if (off != raw.length) return None
    } catch { case _: java.util.zip.DataFormatException => return None }
    finally inflater.end()
    // unfilter in place into the pixel buffer
    val px = new Array[Byte](stride * h)
    var y = 0
    while (y < h) {
      val ft = raw(y * (stride + 1)) & 0xff
      if (ft > 4) return None
      val srcOff = y * (stride + 1) + 1
      val dstOff = y * stride
      var x = 0
      while (x < stride) {
        val v = raw(srcOff + x) & 0xff
        val left = if (x >= 3) px(dstOff + x - 3) & 0xff else 0
        val up = if (y > 0) px(dstOff - stride + x) & 0xff else 0
        val upLeft = if (y > 0 && x >= 3) px(dstOff - stride + x - 3) & 0xff else 0
        val r = ft match {
          case 0 => v
          case 1 => v + left
          case 2 => v + up
          case 3 => v + ((left + up) >> 1)
          case 4 => v + paeth(left, up, upLeft)
        }
        px(dstOff + x) = r.toByte
        x += 1
      }
      y += 1
    }
    Some((w, h, px))
  }

  /** Channel-mean summary of a decoded PNG (same shape as [[decodePpm]]). */
  def decodePng(bytes: Array[Byte]): Option[PpmInfo] = decodePngPixels(bytes).map {
    case (w, h, px) =>
      var (sr, sg, sb) = (0L, 0L, 0L)
      var i = 0
      while (i < px.length) {
        sr += px(i) & 0xff; sg += px(i + 1) & 0xff; sb += px(i + 2) & 0xff
        i += 3
      }
      val n = (w * h).toDouble
      PpmInfo(w, h, sr / n, sg / n, sb / n)
  }

  // ---- AVI / MJPEG (RIFF container, one JPEG per frame) --------------
  //
  // Motion-JPEG in the classic AVI RIFF layout: hdrl list (avih +
  // strl/strh/strf) followed by a movi list of '00dc' chunks, each a
  // complete baseline JPEG. A real VIDEO container + codec path: the
  // container walk is RIFF (like WAV), per-frame decode is [[Jpeg]].

  case class AviInfo(width: Int, height: Int, nFrames: Int,
                     frameMeans: Array[Double])

  /** Emits a minimal AVI/MJPEG file from pre-encoded JPEG frames. */
  def encodeAviMjpeg(width: Int, height: Int,
                     frames: Seq[Array[Byte]], fps: Int = 10): Array[Byte] = {
    def fourcc(s: String): Array[Byte] = s.getBytes(StandardCharsets.US_ASCII)
    def u32(v: Int): Array[Byte] =
      ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN).putInt(v).array()
    def chunk(id: String, data: Array[Byte]): Array[Byte] = {
      val pad = if (data.length % 2 == 1) 1 else 0 // RIFF chunks are word-aligned
      fourcc(id) ++ u32(data.length) ++ data ++ Array.fill[Byte](pad)(0)
    }
    def list(typ: String, body: Array[Byte]): Array[Byte] =
      fourcc("LIST") ++ u32(body.length + 4) ++ fourcc(typ) ++ body

    val avih = chunk("avih", u32(1000000 / fps) ++ u32(0) ++ u32(0) ++ u32(0x10) ++
      u32(frames.length) ++ u32(0) ++ u32(1) ++ u32(0) ++ u32(width) ++ u32(height) ++
      Array.fill[Byte](16)(0))
    val strh = chunk("strh", fourcc("vids") ++ fourcc("MJPG") ++ u32(0) ++ u32(0) ++
      u32(0) ++ u32(1) ++ u32(fps) ++ u32(0) ++ u32(frames.length) ++ u32(0) ++
      u32(0) ++ u32(0) ++ Array.fill[Byte](8)(0))
    // BITMAPINFOHEADER
    val strf = chunk("strf", u32(40) ++ u32(width) ++ u32(height) ++
      Array[Byte](1, 0, 24, 0) ++ fourcc("MJPG") ++ u32(width * height * 3) ++
      Array.fill[Byte](16)(0))
    val hdrl = list("hdrl", avih ++ list("strl", strh ++ strf))
    val movi = list("movi", frames.toArray.flatMap(f => chunk("00dc", f)))
    val body = fourcc("AVI ") ++ hdrl ++ movi
    fourcc("RIFF") ++ u32(body.length) ++ body
  }

  /** Walks an AVI/MJPEG file and decodes every '00dc' frame through
    * the [[Jpeg]] decoder; None if the container is malformed or any
    * frame fails to decode. */
  def decodeAviMjpeg(bytes: Array[Byte]): Option[AviInfo] = {
    if (bytes.length < 12) return None
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val riff = new Array[Byte](4); bb.get(riff)
    if (new String(riff, StandardCharsets.US_ASCII) != "RIFF") return None
    bb.getInt // riff size
    val avi = new Array[Byte](4); bb.get(avi)
    if (new String(avi, StandardCharsets.US_ASCII) != "AVI ") return None
    var w = 0; var h = 0
    val means = scala.collection.mutable.ArrayBuffer.empty[Double]
    def walk(end: Int, depth: Int): Boolean = {
      if (depth > 8) return false // real AVIs nest 2-3 deep; reject crafted bombs
      while (bb.position() + 8 <= end) {
        val id = new Array[Byte](4); bb.get(id)
        val size = bb.getInt
        val idStr = new String(id, StandardCharsets.US_ASCII)
        // long arithmetic: a declared size near Int.MaxValue overflows
        // position() + size, sliding a crafted chunk past the bound
        if (size < 0 || bb.position().toLong + size > end) return false
        val next = bb.position() + size + (size % 2) // word-aligned
        idStr match {
          case "LIST" =>
            if (size < 4) return false // list payload starts with a 4-byte type
            val typ = new Array[Byte](4); bb.get(typ) // list type, then recurse
            if (!walk(bb.position() + size - 4, depth + 1)) return false
          case "avih" =>
            if (size < 40) return false
            val p = bb.position()
            w = bb.getInt(p + 32); h = bb.getInt(p + 36)
          case "00dc" =>
            val frame = new Array[Byte](size); bb.get(frame)
            Jpeg.decodeJpegGray(frame) match {
              case Some(j) =>
                if (j.width != w || j.height != h) return false
                means += j.meanGray
              case None => return false
            }
          case _ => ()
        }
        if (next > end) return false
        bb.position(next)
      }
      true
    }
    if (!walk(bytes.length, 0) || w <= 0 || h <= 0 || means.isEmpty) None
    else Some(AviInfo(w, h, means.length, means.toArray))
  }
}
