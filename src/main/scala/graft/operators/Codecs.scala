package graft.operators

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets

/** Real decoders for self-contained media formats — pure byte parsing,
  * no codec libraries. These replace the deterministic stub in
  * [[Multimodal]] for formats whose layout is fully specified by their
  * header: WAV/PCM audio and PPM (P6) images. Compressed formats
  * (JPEG/MP3/H.264) stay behind the stub until a codec dependency is
  * available; the call sites are identical either way.
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

  /** Parses a RIFF/WAVE header + PCM data chunk; None if the bytes are
    * not a well-formed 16-bit PCM WAV. */
  def decodeWav(bytes: Array[Byte]): Option[WavInfo] = {
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
    // walk chunks until the data chunk
    while (bb.remaining() >= 8) {
      val id = new Array[Byte](4); bb.get(id)
      val size = bb.getInt
      new String(id, StandardCharsets.US_ASCII) match {
        case "fmt " =>
          if (size < 16 || bb.remaining() < size) return None
          val fmtStart = bb.position()
          val audioFormat = bb.getShort
          channels = bb.getShort
          sampleRate = bb.getInt
          bb.getInt; bb.getShort
          bits = bb.getShort
          if (audioFormat != 1 || bits != 16) return None // PCM 16-bit only
          bb.position(fmtStart + size)
        case "data" =>
          if (bb.remaining() < size || channels == 0) return None
          val n = size / 2
          var sum = 0L
          var i = 0
          while (i < n) { sum += math.abs(bb.getShort.toLong); i += 1 }
          val mean = if (n == 0) 0.0 else sum.toDouble / n
          return Some(WavInfo(channels, sampleRate, bits, n, mean))
        case _ =>
          if (bb.remaining() < size) return None
          bb.position(bb.position() + size)
      }
    }
    None
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

  /** REAL image resize: nearest-neighbor resample of a binary P6 PPM
    * (the honest pixel-level operation, not a byte truncation). */
  def resizePpm(bytes: Array[Byte], newW: Int, newH: Int): Option[Array[Byte]] =
    parseP6Header(bytes).map { case (w, h, pos) =>
      val out = new Array[Byte](newW * newH * 3)
      var y = 0
      while (y < newH) {
        val sy = y * h / newH
        var x = 0
        while (x < newW) {
          val sx = x * w / newW
          val src = pos + (sy * w + sx) * 3
          val dst = (y * newW + x) * 3
          out(dst) = bytes(src); out(dst + 1) = bytes(src + 1); out(dst + 2) = bytes(src + 2)
          x += 1
        }
        y += 1
      }
      encodePpm(newW, newH, out)
    }
}
