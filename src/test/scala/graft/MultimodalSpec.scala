package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Multimodal

class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private lazy val media = Multimodal.mediaTable(Tables.documents(spark, TestSpark.sf))

  test("media table schema and deterministic metadata") {
    val rows = media.collect()
    assert(rows.length == 500)
    assert(rows.forall(r => Set("image", "audio", "video")(r.media_type)))
    assert(rows.forall(r => r.width >= 32 && r.width <= 144 && r.width % 16 == 0))
    val again = Multimodal.mediaTable(Tables.documents(spark, TestSpark.sf)).collect()
    assert(rows.map(_.width).toSeq == again.map(_.width).toSeq)
  }

  test("extractFeatures preserves rows, computes stub features, keeps partitioning") {
    val feats = Multimodal.extractFeatures(media)
    assert(feats.rdd.getNumPartitions == media.rdd.getNumPartitions) // no shuffle
    val f = feats.collect()
    assert(f.length == 500)
    assert(f.forall(x => x.n_bytes > 0 && x.mean_byte > 0 && x.mean_byte < 256))
    assert(f.filter(_.media_type != "video").forall(_.n_frames == 1))
    assert(f.filter(_.media_type == "video").forall(_.n_frames >= 1))
  }

  test("resize rewrites metadata and byte budget") {
    val r = Multimodal.resize(media, 64, 64).collect()
    assert(r.forall(x => x.width == 64 && x.height == 64 && x.content.length == 64 * 64 / 64 + 1))
  }

  test("mm_decode takes the REAL codec branch: every payload parses, stats match decoders") {
    import graft.operators.Codecs
    val enc = Multimodal.mediaTableEncoded(Tables.documents(spark, TestSpark.sf)).collect()
    assert(enc.length == 500)
    // every payload is a well-formed WAV/PPM — decodeAny cannot fall
    // through to the stub for any row
    enc.foreach { r =>
      if (r.media_type == "audio") assert(Codecs.decodeWav(r.content).isDefined, s"doc ${r.doc_id}")
      else assert(Codecs.decodePpm(r.content).isDefined, s"doc ${r.doc_id}")
    }
    // the query's mean_decoded equals the direct decoder output (true
    // amplitude/pixel stats), NOT the stub's whole-file byte mean
    val out = Multimodal.mmDecode(Tables.documents(spark, TestSpark.sf))
      .collect().map(r => r.getLong(0) -> r).toMap
    enc.foreach { r =>
      val q = out(r.doc_id)
      val expected = if (r.media_type == "audio")
        Codecs.decodeWav(r.content).get.meanAbsAmplitude
      else {
        val p = Codecs.decodePpm(r.content).get
        (p.meanR + p.meanG + p.meanB) / 3.0
      }
      assert(math.abs(q.getDouble(3) - expected) < 5e-5, s"doc ${r.doc_id}")
      // the stub's whole-file byte mean includes the 13-byte header
      // (image, shifts the mean ~0.2-1.1) / reads amplitudes as raw
      // bytes (audio, ~127 vs ~500) — either way measurably different
      val stubMean = r.content.map(_ & 0xff).map(_.toLong).sum.toDouble / r.content.length
      assert(math.abs(q.getDouble(3) - stubMean) > 0.05, s"doc ${r.doc_id} looks like the stub")
      assert(q.getLong(2) == r.content.length.toLong)
    }
  }

  test("frameSample emits strided frames for video rows only") {
    val frames = Multimodal.frameSample(media, stride = 4).collect()
    assert(frames.nonEmpty)
    assert(frames.forall(_.frame_idx % 4 == 0))
    assert(frames.forall(f => f.offset == f.frame_idx.toLong * 64))
    val videoIds = media.filter(_.media_type == "video").collect().map(_.doc_id).toSet
    assert(frames.map(_.doc_id).toSet.subsetOf(videoIds))
  }
}

class CodecsSpec extends org.scalatest.funsuite.AnyFunSuite {
  import graft.operators.Codecs

  test("wav: encode -> decode round-trips header fields and amplitude stats") {
    val samples = Array[Short](0, 1000, -1000, 2000, -2000, 30000, -30000, 0)
    val bytes = Codecs.encodeWav(samples, sampleRate = 16000, channels = 1)
    val info = Codecs.decodeWav(bytes).get
    assert(info.channels == 1 && info.sampleRate == 16000 && info.bitsPerSample == 16)
    assert(info.nSamples == 8)
    assert(info.meanAbsAmplitude == samples.map(s => math.abs(s.toLong)).sum.toDouble / 8)
  }

  test("wav: garbage and truncated input decode to None, not garbage stats") {
    assert(Codecs.decodeWav("this is not audio at all, just text".getBytes).isEmpty)
    val ok = Codecs.encodeWav(Array[Short](1, 2, 3))
    assert(Codecs.decodeWav(ok.take(30)).isEmpty)
  }

  test("ppm: encode -> decode round-trips dimensions and channel means") {
    val w = 4; val h = 2
    val rgb = Array.tabulate(w * h * 3) { i =>
      (i % 3 match { case 0 => 200; case 1 => 100; case _ => 50 }).toByte
    }
    val info = Codecs.decodePpm(Codecs.encodePpm(w, h, rgb)).get
    assert(info.width == 4 && info.height == 2)
    assert(info.meanR == 200.0 && info.meanG == 100.0 && info.meanB == 50.0)
  }

  test("ppm: comments in header are skipped; truncated pixels rejected") {
    val rgb = Array.fill(3 * 3)(7.toByte)
    val withComment = ("P6\n# a comment\n3 1\n255\n").getBytes ++ rgb
    val info = Codecs.decodePpm(withComment).get
    assert(info.width == 3 && info.height == 1 && info.meanR == 7.0)
    assert(Codecs.decodePpm(Codecs.encodePpm(3, 1, rgb).dropRight(2)).isEmpty)
  }

  test("real media decodes through the Spark feature pipeline; text falls back to stub") {
    val spark = TestSpark.spark
    import spark.implicits._
    import graft.operators.Multimodal.MediaRow
    val wav = Codecs.encodeWav(Array[Short](100, -100, 100, -100))
    val ppm = Codecs.encodePpm(2, 2, Array.fill(12)(10.toByte))
    val rows = Seq(
      MediaRow(1L, "audio", wav, 0, 0),
      MediaRow(2L, "image", ppm, 2, 2),
      MediaRow(3L, "audio", "plain text payload".getBytes, 0, 0))
    val feats = graft.operators.Multimodal.extractFeatures(rows.toDS())
      .collect().map(f => f.doc_id -> f).toMap
    assert(feats(1L).mean_byte == 100.0)           // true mean |amplitude|
    assert(feats(2L).mean_byte == 10.0)            // true mean pixel value
    assert(feats(3L).mean_byte > 0 && feats(3L).mean_byte < 256) // stub path
  }
}

class PpmResizeSpec extends org.scalatest.funsuite.AnyFunSuite {
  import graft.operators.Codecs

  test("nearest-neighbor resize picks true source pixels") {
    // 4x4 image, four solid 2x2 quadrants: R G / B W
    def px(r: Int, g: Int, b: Int) = Array(r.toByte, g.toByte, b.toByte)
    val quads = Array(px(255, 0, 0), px(0, 255, 0), px(0, 0, 255), px(255, 255, 255))
    val rgb = new Array[Byte](4 * 4 * 3)
    for (y <- 0 until 4; x <- 0 until 4) {
      val q = (y / 2) * 2 + (x / 2)
      System.arraycopy(quads(q), 0, rgb, (y * 4 + x) * 3, 3)
    }
    val small = Codecs.resizePpm(Codecs.encodePpm(4, 4, rgb), 2, 2).get
    val info = Codecs.decodePpm(small).get
    assert(info.width == 2 && info.height == 2)
    // each output pixel samples one quadrant → means average the four colors
    assert(info.meanR == (255 + 0 + 0 + 255) / 4.0)
    assert(info.meanG == (0 + 255 + 0 + 255) / 4.0)
    assert(info.meanB == (0 + 0 + 255 + 255) / 4.0)
    // upscale keeps solid quadrant structure
    val big = Codecs.resizePpm(small, 4, 4).get
    assert(Codecs.decodePpm(big).get.meanR == info.meanR)
  }

  test("png and jpeg resize: decode -> resample -> re-encode") {
    import graft.operators.Jpeg
    // PNG: 4x4 quadrants (lossless format: resampled pixels exact)
    def px3(r: Int, g: Int, b: Int) = Array(r.toByte, g.toByte, b.toByte)
    val quads = Array(px3(255, 0, 0), px3(0, 255, 0), px3(0, 0, 255), px3(255, 255, 255))
    val rgb = new Array[Byte](4 * 4 * 3)
    for (y <- 0 until 4; x <- 0 until 4)
      System.arraycopy(quads((y / 2) * 2 + (x / 2)), 0, rgb, (y * 4 + x) * 3, 3)
    val smallPng = Codecs.resizePng(Codecs.encodePng(4, 4, rgb), 2, 2).get
    val (w2, h2, p2) = Codecs.decodePngPixels(smallPng).get
    assert(w2 == 2 && h2 == 2)
    assert(p2.toSeq == (quads(0) ++ quads(1) ++ quads(2) ++ quads(3)).toSeq)
    // JPEG: solid exact-survival tiles stay exact through resize
    val gray = Array.fill(16 * 16)(58.toByte)
    val smallJpg = Jpeg.resizeJpegGray(Jpeg.encodeJpegGray(16, 16, gray), 8, 8).get
    val (jw, jh, jp) = Jpeg.decodeJpegGrayPixels(smallJpg).get
    assert(jw == 8 && jh == 8 && jp.forall(_ == 58.toByte))
  }

  test("resize through the Spark pipeline: real resample for ppm, stub for text") {
    val spark = TestSpark.spark
    import spark.implicits._
    import graft.operators.Multimodal
    import graft.operators.Multimodal.MediaRow
    val ppm = Codecs.encodePpm(4, 4, Array.fill(48)(9.toByte))
    val rows = Seq(
      MediaRow(1L, "image", ppm, 4, 4),
      MediaRow(2L, "audio", "not an image".getBytes, 0, 0))
    val out = Multimodal.resize(rows.toDS(), 2, 2).collect().map(r => r.doc_id -> r).toMap
    val backInfo = Codecs.decodePpm(out(1L).content).get
    assert(backInfo.width == 2 && backInfo.height == 2 && backInfo.meanR == 9.0)
    assert(out(2L).width == 2 && out(2L).height == 2) // stub path: metadata true
  }
}

class PngCodecSpec extends org.scalatest.funsuite.AnyFunSuite {
  import graft.operators.{Codecs, Multimodal}

  // content shapes that drive the adaptive filter heuristic differently
  private def gradient(w: Int, h: Int): Array[Byte] =
    Array.tabulate(w * h * 3)(i => ((i / 3) % 256).toByte)
  private def flat(w: Int, h: Int): Array[Byte] = Array.fill(w * h * 3)(77.toByte)
  private def noise(w: Int, h: Int): Array[Byte] =
    Array.tabulate(w * h * 3)(i => ((i * 2654435761L >>> 13) % 256).toByte)

  test("png: lossless round-trip over flat/gradient/noise content") {
    for ((rgb, w, h) <- Seq((flat(16, 9), 16, 9), (gradient(23, 7), 23, 7),
                            (noise(5, 31), 5, 31), (noise(1, 1), 1, 1))) {
      val (dw, dh, px) = Codecs.decodePngPixels(Codecs.encodePng(w, h, rgb)).get
      assert(dw == w && dh == h)
      assert(px.toSeq == rgb.toSeq, s"pixels differ for ${w}x$h")
    }
  }

  test("png: every filter type (None/Sub/Up/Average/Paeth) unfilters exactly") {
    val rgb = noise(13, 11)
    for (ft <- 0 to 4) {
      val bytes = Codecs.encodePng(13, 11, rgb, forceFilter = ft)
      val (_, _, px) = Codecs.decodePngPixels(bytes).get
      assert(px.toSeq == rgb.toSeq, s"filter $ft broke the round trip")
    }
  }

  test("png: deflate genuinely compresses filterable content") {
    val w = 64; val h = 64
    val bytes = Codecs.encodePng(w, h, gradient(w, h))
    assert(bytes.length < w * h * 3 / 4, s"no real compression: ${bytes.length}")
    assert(Codecs.decodePngPixels(bytes).get._3.toSeq == gradient(w, h).toSeq)
  }

  test("png: garbage, truncation, and CRC corruption all decode to None") {
    assert(Codecs.decodePng("definitely not a png".getBytes).isEmpty)
    val ok = Codecs.encodePng(8, 8, noise(8, 8))
    assert(Codecs.decodePng(ok.take(ok.length - 20)).isEmpty) // truncated
    val corrupt = ok.clone()
    corrupt(40) = (corrupt(40) ^ 0x55).toByte // inside IDAT data → CRC mismatch
    assert(Codecs.decodePng(corrupt).isEmpty)
  }

  test("mm_png decodes real compressed payloads; means match the generator") {
    val docs = Tables.documents(TestSpark.spark, TestSpark.sf)
    val enc = Multimodal.mediaTablePng(docs).collect()
    assert(enc.length == 500)
    enc.foreach { r =>
      assert(Codecs.decodePng(r.content).isDefined, s"doc ${r.doc_id}")
      // the payload really is compressed + filtered, not raw pixels
      assert(!r.content.slice(8, r.content.length).containsSlice(
        Array.tabulate(32)(j => ((r.doc_id * 11 + j * 29) % 256).toByte)))
    }
    val out = Multimodal.mmPng(docs).collect().map(r => r.getLong(0) -> r).toMap
    enc.foreach { r =>
      val q = out(r.doc_id)
      val w = 12 + (r.doc_id % 5).toInt * 4
      val h = 12 + (r.doc_id % 7).toInt * 4
      val sums = new Array[Long](3)
      var j = 0
      while (j < 3 * w * h) { sums(j % 3) += (r.doc_id * 11 + j.toLong * 29) % 256; j += 1 }
      assert(q.getInt(1) == w && q.getInt(2) == h)
      assert(math.abs(q.getDouble(3) - sums(0).toDouble / (w * h)) < 5e-5, s"doc ${r.doc_id}")
      assert(math.abs(q.getDouble(4) - sums(1).toDouble / (w * h)) < 5e-5)
      assert(math.abs(q.getDouble(5) - sums(2).toDouble / (w * h)) < 5e-5)
      assert(q.getLong(6) == 3L * w * h)
    }
  }

  test("png payloads route through decodeAny's image branch in the pipeline") {
    val spark = TestSpark.spark
    import spark.implicits._
    import graft.operators.Multimodal.MediaRow
    val rgb = flat(6, 6)
    val rows = Seq(MediaRow(1L, "image", Codecs.encodePng(6, 6, rgb), 6, 6))
    val f = Multimodal.extractFeatures(rows.toDS()).collect().head
    assert(f.mean_byte == 77.0) // true pixel mean, not the stub byte mean
  }
}

class MuLawCodecSpec extends org.scalatest.funsuite.AnyFunSuite {
  import graft.operators.{Codecs, Multimodal}

  test("mu-law: G.711 invariants — silence, max, code-exact re-encode") {
    assert(Codecs.muLawEncodeSample(0) == 0xff)    // mu-law silence
    assert(Codecs.muLawDecodeSample(0xff) == 0)
    assert(Codecs.muLawDecodeSample(0x80) == 32124)  // max positive magnitude
    assert(Codecs.muLawDecodeSample(0x00) == -32124)
    // every code round-trips decode -> encode exactly, except 0x7F
    // (negative zero decodes to 0, which re-encodes as positive 0xFF)
    for (c <- 0 to 255 if c != 0x7f)
      assert(Codecs.muLawEncodeSample(Codecs.muLawDecodeSample(c)) == c, s"code $c")
    assert(Codecs.muLawEncodeSample(Codecs.muLawDecodeSample(0x7f)) == 0xff)
  }

  test("mu-law: companding error bounded by the segment quantization step") {
    var s = -32768
    while (s <= 32767) {
      val dec = Codecs.muLawDecodeSample(Codecs.muLawEncodeSample(s))
      val clamped = math.max(-32635, math.min(32635, s))
      val u = ~Codecs.muLawEncodeSample(s) & 0xff
      val halfStep = 1 << ((u >> 4) & 7) << 2 // 2^(exp+2) = half the segment step
      assert(math.abs(dec - clamped) <= halfStep, s"sample $s -> $dec")
      s += 7
    }
  }

  test("mu-law wav: 2:1 compressed payload decodes to true amplitude stats") {
    val samples = Array.tabulate(1000)(i => ((i * 53) % 8000 - 4000).toShort)
    val bytes = Codecs.encodeWavMuLaw(samples, sampleRate = 8000)
    assert(bytes.length == 44 + samples.length) // 1 byte/sample vs 2 for PCM
    val info = Codecs.decodeWav(bytes).get
    assert(info.bitsPerSample == 8 && info.nSamples == 1000)
    val expected = samples.map(s =>
      math.abs(Codecs.muLawDecodeSample(Codecs.muLawEncodeSample(s.toInt))).toLong).sum / 1000.0
    assert(math.abs(info.meanAbsAmplitude - expected) < 1e-9)
  }

  test("mm_mulaw query matches the closed-form G.711 expansion") {
    val docs = Tables.documents(TestSpark.spark, TestSpark.sf)
    val out = Multimodal.mmMulaw(docs).collect()
    assert(out.length == 500)
    out.foreach { r =>
      val id = r.getLong(0)
      val n = 300 + (id % 7).toInt * 50
      var sum = 0L
      var i = 0
      while (i < n) {
        val u = 255 - ((id * 13 + i.toLong * 7) % 256).toInt
        sum += (((u % 16) * 8 + 132) << ((u / 16) % 8)) - 132
        i += 1
      }
      assert(r.getLong(1) == 44L + n && r.getLong(2) == n.toLong)
      assert(math.abs(r.getDouble(3) - sum.toDouble / n) < 5e-5, s"doc $id")
      // raw byte mean would be ~127.5; expanded amplitudes are ~8000
      assert(r.getDouble(3) > 1000, s"doc $id decoded like raw bytes")
    }
  }

  test("mu-law payloads route through the pipeline's real audio branch") {
    val spark = TestSpark.spark
    import spark.implicits._
    import graft.operators.Multimodal.MediaRow
    val samples = Array.fill(100)(1000.toShort)
    val rows = Seq(MediaRow(1L, "audio", Codecs.encodeWavMuLaw(samples), 0, 0))
    val f = Multimodal.extractFeatures(rows.toDS()).collect().head
    val dec = math.abs(Codecs.muLawDecodeSample(Codecs.muLawEncodeSample(1000)))
    assert(f.mean_byte == dec.toDouble) // expanded amplitude, not code bytes
  }
}

class ALawCodecSpec extends org.scalatest.funsuite.AnyFunSuite {
  import graft.operators.{Codecs, Multimodal}

  test("a-law: G.711 invariants — range, every code re-encodes exactly") {
    val decoded = (0 to 255).map(Codecs.aLawDecodeSample)
    assert(decoded.map(math.abs).min == 8)      // A-law has no zero: quiet code is +/-8
    assert(decoded.map(math.abs).max == 32256)  // segment-7 ceiling
    for (c <- 0 to 255)
      assert(Codecs.aLawEncodeSample(Codecs.aLawDecodeSample(c)) == c, s"code $c")
  }

  test("a-law: companding error bounded by the segment quantization step") {
    var s = -32768
    while (s <= 32767) {
      val dec = Codecs.aLawDecodeSample(Codecs.aLawEncodeSample(s))
      val clamped = math.max(-32767, math.min(32767, s))
      val a = Codecs.aLawEncodeSample(s) ^ 0x55
      val exp = (a >> 4) & 7
      val halfStep = math.max(8, 1 << (exp + 2))
      assert(math.abs(dec - clamped) <= halfStep, s"sample $s -> $dec")
      s += 11
    }
  }

  test("a-law wav: format-6 payload decodes through decodeWav") {
    val samples = Array.tabulate(800)(i => ((i * 37) % 6000 - 3000).toShort)
    val bytes = Codecs.encodeWavALaw(samples)
    assert(bytes.length == 44 + samples.length) // 2:1 vs PCM
    val info = Codecs.decodeWav(bytes).get
    assert(info.bitsPerSample == 8 && info.nSamples == 800)
    val expected = samples.map(s =>
      math.abs(Codecs.aLawDecodeSample(Codecs.aLawEncodeSample(s.toInt))).toLong).sum / 800.0
    assert(math.abs(info.meanAbsAmplitude - expected) < 1e-9)
  }

  test("mm_alaw query matches the closed-form A-law expansion") {
    val docs = Tables.documents(TestSpark.spark, TestSpark.sf)
    val out = Multimodal.mmAlaw(docs).collect()
    assert(out.length == 500)
    out.foreach { r =>
      val id = r.getLong(0)
      val n = 250 + (id % 5).toInt * 60
      var sum = 0L
      var i = 0
      while (i < n) {
        val a = ((id * 17 + i.toLong * 11) % 256).toInt ^ 0x55
        val exp = (a >> 4) & 7
        val mant = a & 0xf
        sum += (if (exp == 0) mant * 16 + 8 else (mant * 16 + 264) << (exp - 1))
        i += 1
      }
      assert(r.getLong(1) == 44L + n && r.getLong(2) == n.toLong)
      assert(math.abs(r.getDouble(3) - sum.toDouble / n) < 5e-5, s"doc $id")
    }
  }
}

class GifCodecSpec extends org.scalatest.funsuite.AnyFunSuite {
  import graft.operators.{Gif, Multimodal}

  test("gif: lossless LZW round-trip over flat/gradient/noise content") {
    val cases = Seq(
      (16, 9, Array.fill(16 * 9)(77.toByte)),
      (23, 7, Array.tabulate(23 * 7)(i => (i % 256).toByte)),
      (31, 11, Array.tabulate(31 * 11)(i => ((i * 2654435761L >>> 11) % 256).toByte)),
      (1, 1, Array[Byte](42)))
    for ((w, h, px) <- cases) {
      val (dw, dh, rgb) = Gif.decodeGifPixels(Gif.encodeGifGray(w, h, px)).get
      assert(dw == w && dh == h)
      // grayscale palette: every channel equals the source index
      for (i <- px.indices; c <- 0 to 2)
        assert(rgb(i * 3 + c) == px(i), s"pixel $i ch $c in ${w}x$h")
    }
  }

  test("gif: dictionary overflow forces a mid-stream LZW clear and survives") {
    // >4096 distinct-pattern pixels grows the dictionary past 12-bit
    // capacity: the encoder must emit CLEAR and reset, the decoder must
    // follow; a width/reset bug scrambles everything after the reset
    val w = 100; val h = 60
    val px = Array.tabulate(w * h)(i => ((i * 2654435761L >>> 13) % 256).toByte)
    val bytes = Gif.encodeGifGray(w, h, px)
    val (_, _, rgb) = Gif.decodeGifPixels(bytes).get
    for (i <- px.indices) assert(rgb(i * 3) == px(i), s"pixel $i after dict reset")
  }

  test("gif: LZW genuinely compresses repetitive content") {
    val w = 64; val h = 64
    val px = Array.tabulate(w * h)(i => (((i % w) / 8) * 32).toByte)
    val bytes = Gif.encodeGifGray(w, h, px)
    assert(bytes.length - 768 - 13 < w * h / 4, s"no real compression: ${bytes.length}")
  }

  test("gif: garbage and truncation decode to None") {
    assert(Gif.decodeGif("GIF87a but not really".getBytes).isEmpty)
    assert(Gif.decodeGif("something else".getBytes).isEmpty)
    val ok = Gif.encodeGifGray(20, 20, Array.tabulate(400)(i => (i % 251).toByte))
    assert(Gif.decodeGif(ok.take(ok.length - 15)).isEmpty)
    assert(Gif.decodeGif(ok.take(300)).isEmpty)
  }

  test("mm_gif decodes real LZW payloads; means match the generator") {
    val docs = Tables.documents(TestSpark.spark, TestSpark.sf)
    val out = Multimodal.mmGif(docs).collect()
    assert(out.length == 500)
    out.foreach { r =>
      val id = r.getLong(0)
      val w = 10 + (id % 6).toInt * 5
      val h = 10 + (id % 5).toInt * 6
      var sum = 0L
      var p = 0
      while (p < w * h) { sum += (id * 19 + p.toLong * 23) % 256; p += 1 }
      assert(r.getInt(1) == w && r.getInt(2) == h)
      assert(math.abs(r.getDouble(3) - sum.toDouble / (w * h)) < 5e-5, s"doc $id")
      assert(r.getLong(4) == w.toLong * h)
    }
  }

  test("gif payloads route through decodeAny's image branch in the pipeline") {
    val spark = TestSpark.spark
    import spark.implicits._
    import graft.operators.Multimodal.MediaRow
    val px = Array.fill(12 * 12)(99.toByte)
    val rows = Seq(MediaRow(1L, "image", Gif.encodeGifGray(12, 12, px), 12, 12))
    val f = Multimodal.extractFeatures(rows.toDS()).collect().head
    assert(f.mean_byte == 99.0) // decoded palette value, not the stub byte mean
  }
}

class JpegCodecSpec extends org.scalatest.funsuite.AnyFunSuite {
  import graft.operators.Jpeg

  /** Solid 8x8 tiles at even offsets from 128: DC = 8*(g-128) divides
    * the Q00=16 quantizer exactly and all ACs vanish, so the lossy
    * pipeline reconstructs these EXACTLY (the property mm_jpeg's
    * arithmetic oracle relies on). */
  private def tiles(w: Int, h: Int, tileVal: (Int, Int) => Int): Array[Byte] = {
    val px = new Array[Byte](w * h)
    for (y <- 0 until h; x <- 0 until w)
      px(y * w + x) = tileVal(x / 8, y / 8).toByte
    px
  }

  test("jpeg: solid even-offset tiles survive the full pipeline exactly") {
    val w = 32; val h = 24
    val img = tiles(w, h, (bx, by) => 18 + ((bx * 5 + by * 7) % 12) * 20)
    val bytes = Jpeg.encodeJpegGray(w, h, img)
    val (dw, dh, px) = Jpeg.decodeJpegGrayPixels(bytes).get
    assert(dw == w && dh == h)
    assert(px.toSeq == img.toSeq) // bit-exact through huffman+DCT+quant
  }

  test("jpeg: smooth gradients round-trip within tight error bounds") {
    val w = 40; val h = 32
    val img = Array.tabulate(w * h) { i =>
      val x = i % w; val y = i / w
      (20 + x * 3 + y * 2).toByte // pure plane, max 20+117+62=199: no wrap edges
    }
    val (_, _, px) = Jpeg.decodeJpegGrayPixels(Jpeg.encodeJpegGray(w, h, img)).get
    val errs = img.indices.map(i => math.abs((px(i) & 0xff) - (img(i) & 0xff)))
    assert(errs.max <= 12, s"max err ${errs.max}")
    assert(errs.sum.toDouble / errs.size <= 3.0, s"mean err ${errs.sum.toDouble / errs.size}")
  }

  test("jpeg: entropy coding genuinely compresses") {
    val w = 64; val h = 64
    val img = Array.tabulate(w * h)(i => (((i % w) * 2) % 256).toByte)
    val bytes = Jpeg.encodeJpegGray(w, h, img)
    assert(bytes.length < w * h / 2, s"no real compression: ${bytes.length}")
  }

  test("jpeg: garbage and truncation decode to None") {
    assert(Jpeg.decodeJpegGray("not a jpeg".getBytes).isEmpty)
    val ok = Jpeg.encodeJpegGray(16, 16, Array.fill(256)(100.toByte))
    assert(Jpeg.decodeJpegGray(ok.take(20)).isEmpty)       // header cut
    assert(Jpeg.decodeJpegGray(ok.take(ok.length - 30)).isEmpty) // scan cut
  }

  test("mm_jpeg decodes real baseline JPEGs; means match the tile generator") {
    import graft.operators.Multimodal
    val docs = Tables.documents(TestSpark.spark, TestSpark.sf)
    val enc = Multimodal.mediaTableJpeg(docs).collect()
    assert(enc.length == 500)
    enc.foreach { r =>
      assert((r.content(0) & 0xff) == 0xff && (r.content(1) & 0xff) == 0xd8, "not a JPEG")
      assert(Jpeg.decodeJpegGray(r.content).isDefined, s"doc ${r.doc_id}")
    }
    val out = Multimodal.mmJpeg(docs).collect().map(r => r.getLong(0) -> r).toMap
    enc.foreach { r =>
      val id = r.doc_id
      val nb = (r.width / 8) * (r.height / 8)
      val mean = (0 until nb).map(b => 18 + ((id * 5 + b.toLong * 11) % 12) * 20).sum.toDouble / nb
      val q = out(id)
      assert(q.getInt(1) == r.width && q.getInt(2) == r.height)
      assert(math.abs(q.getDouble(3) - mean) < 5e-5, s"doc $id")
    }
  }

  test("jpeg payloads route through decodeAny's image branch in the pipeline") {
    val spark = TestSpark.spark
    import spark.implicits._
    import graft.operators.Multimodal
    import graft.operators.Multimodal.MediaRow
    val img = Array.fill(16 * 16)(58.toByte) // even offset from 128: exact
    val rows = Seq(MediaRow(1L, "image", Jpeg.encodeJpegGray(16, 16, img), 16, 16))
    val f = Multimodal.extractFeatures(rows.toDS()).collect().head
    assert(f.mean_byte == 58.0) // decoded gray mean, not the stub byte mean
  }

  test("jpeg: non-multiple-of-8 dimensions pad and crop correctly") {
    val w = 13; val h = 11
    val img = tiles(w, h, (bx, by) => if ((bx + by) % 2 == 0) 58 else 198)
    val (dw, dh, px) = Jpeg.decodeJpegGrayPixels(Jpeg.encodeJpegGray(w, h, img)).get
    assert(dw == 13 && dh == 11 && px.length == 13 * 11)
    assert(px.toSeq == img.toSeq) // edge-replicated padding keeps tiles solid
  }
}

class AviMjpegSpec extends org.scalatest.funsuite.AnyFunSuite {
  import graft.operators.{Codecs, Jpeg, Multimodal}

  private def tileFrame(v: Int): Array[Byte] =
    Jpeg.encodeJpegGray(16, 16, Array.fill(256)(v.toByte))

  test("avi/mjpeg: container round-trips frame count, dims, per-frame means") {
    val frames = Seq(tileFrame(58), tileFrame(98), tileFrame(198))
    val avi = Codecs.encodeAviMjpeg(16, 16, frames)
    val info = Codecs.decodeAviMjpeg(avi).get
    assert(info.width == 16 && info.height == 16 && info.nFrames == 3)
    assert(info.frameMeans.toSeq == Seq(58.0, 98.0, 198.0)) // exact tiles
  }

  test("avi/mjpeg: garbage, truncation, and a corrupt frame reject") {
    assert(Codecs.decodeAviMjpeg("RIFFnope".getBytes).isEmpty)
    val avi = Codecs.encodeAviMjpeg(16, 16, Seq(tileFrame(58)))
    assert(Codecs.decodeAviMjpeg(avi.take(avi.length - 40)).isEmpty)
    // stomp the embedded frame's SOI marker: frame decode fails and the
    // container walk must propagate the rejection (JPEG has no CRC, so
    // flipping an unused Huffman-table byte would NOT be detectable)
    val frameStart = avi.indexOfSlice("00dc".getBytes) + 8
    val bad = avi.clone()
    bad(frameStart) = 0x00
    assert(Codecs.decodeAviMjpeg(bad).isEmpty)
  }

  test("mm_video decodes real AVI/MJPEG; frame stats match the generator") {
    val docs = Tables.documents(TestSpark.spark, TestSpark.sf)
    val out = Multimodal.mmVideo(docs).collect()
    assert(out.length == 500)
    out.foreach { r =>
      val id = r.getLong(0)
      val nf = 3 + (id % 4).toInt
      def fmean(f: Int): Double =
        (0 until 4).map(b => 18 + ((id * 5 + f.toLong * 13 + b.toLong * 11) % 12) * 20)
          .sum / 4.0
      assert(r.getInt(3) == nf, s"doc $id frame count")
      val mean = (0 until nf).map(fmean).sum / nf
      assert(math.abs(r.getDouble(4) - mean) < 5e-5, s"doc $id")
      assert(math.abs(r.getDouble(5) - fmean(0)) < 5e-5)
      assert(math.abs(r.getDouble(6) - fmean(nf - 1)) < 5e-5)
    }
  }

  test("video payloads take the real AVI branch in the feature pipeline") {
    val spark = TestSpark.spark
    import spark.implicits._
    import graft.operators.Multimodal.MediaRow
    val avi = Codecs.encodeAviMjpeg(16, 16, Seq(tileFrame(58), tileFrame(98)))
    val rows = Seq(
      MediaRow(1L, "video", avi, 16, 16),
      MediaRow(2L, "video", "not a video at all".getBytes, 0, 0))
    val f = Multimodal.extractFeatures(rows.toDS()).collect().map(x => x.doc_id -> x).toMap
    assert(f(1L).mean_byte == 78.0 && f(1L).n_frames == 2) // real decode: (58+98)/2
    assert(f(2L).n_frames == "not a video at all".length / 64 + 1) // stub fallback
  }
}

class DecoderFuzzSpec extends org.scalatest.funsuite.AnyFunSuite {
  import graft.operators.{Codecs, Gif, Jpeg}

  /** Every decoder must be TOTAL: corrupt/truncated bytes yield None
    * (or a decoded value for undetectable flips), never an exception.
    * Seeded, so failures reproduce. */
  test("decoders never throw on randomly corrupted or truncated payloads") {
    val rnd = new scala.util.Random(0x5eed)
    val valid: Seq[(String, Array[Byte], Array[Byte] => Any)] = Seq(
      ("wav", Codecs.encodeWav(Array.tabulate(300)(i => (i * 7 % 2000 - 1000).toShort)),
        Codecs.decodeWav(_)),
      ("mulaw", Codecs.encodeWavMuLaw(Array.fill(200)(500.toShort)), Codecs.decodeWav(_)),
      ("alaw", Codecs.encodeWavALaw(Array.fill(200)(500.toShort)), Codecs.decodeWav(_)),
      ("ppm", Codecs.encodePpm(9, 7, Array.tabulate(189)(i => (i % 256).toByte)),
        Codecs.decodePpm(_)),
      ("png", Codecs.encodePng(13, 9, Array.tabulate(351)(i => (i % 256).toByte)),
        Codecs.decodePng(_)),
      ("gif", Gif.encodeGifGray(15, 11, Array.tabulate(165)(i => (i % 256).toByte)),
        Gif.decodeGif(_)),
      ("jpeg", Jpeg.encodeJpegGray(24, 16, Array.tabulate(384)(i => (i % 256).toByte)),
        Jpeg.decodeJpegGray(_)),
      ("avi", Codecs.encodeAviMjpeg(16, 16,
        Seq(Jpeg.encodeJpegGray(16, 16, Array.fill(256)(58.toByte)))), Codecs.decodeAviMjpeg(_)))
    for ((name, payload, decode) <- valid; trial <- 0 until 300) {
      val bytes = payload.clone()
      if (trial % 3 == 2) { // truncate at a random point
        val cut = 1 + rnd.nextInt(bytes.length - 1)
        decode(java.util.Arrays.copyOf(bytes, cut)) // must not throw
      } else { // flip 1-4 random bytes
        for (_ <- 0 to rnd.nextInt(4))
          bytes(rnd.nextInt(bytes.length)) = rnd.nextInt(256).toByte
        decode(bytes) // must not throw
      }
    }
  }
}

class CraftedDimensionSpec extends org.scalatest.funsuite.AnyFunSuite {
  import graft.operators.{Codecs, Gif}

  /** Random flips rarely land Int-overflowing dimensions, so these are
    * crafted: headers that PARSE cleanly but declare w*h (or a chunk
    * size) past Int range must be rejected, not thrown on — at 100 TB a
    * single adversarial payload must not fail the job. */
  test("gif: 65535x65535 descriptor is rejected, not a negative allocation") {
    val g = Gif.encodeGifGray(15, 11, Array.tabulate(165)(i => (i % 256).toByte))
    // image descriptor offset computed structurally (scanning for 0x2c
    // finds gray-palette bytes first): header(6) + screen descriptor(7)
    // + global color table, sized from the packed field at byte 10
    val pos = 13 + (if ((g(10) & 0x80) != 0) 3 * (1 << ((g(10) & 0x07) + 1)) else 0)
    assert((g(pos) & 0xff) == 0x2c)
    for (i <- 5 to 8) g(pos + i) = 0xff.toByte // w = h = 65535
    assert(Gif.decodeGif(g).isEmpty) // and no NegativeArraySizeException
  }

  test("png: CRC-valid IHDR with Int.MaxValue dims is rejected before allocation") {
    def chunk(typ: String, data: Array[Byte]): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(12 + data.length)
      bb.putInt(data.length).put(typ.getBytes("US-ASCII")).put(data)
      val crc = new java.util.zip.CRC32()
      crc.update(typ.getBytes("US-ASCII"))
      crc.update(data)
      bb.putInt(crc.getValue.toInt)
      bb.array()
    }
    val ihdr = java.nio.ByteBuffer.allocate(13)
      .putInt(Int.MaxValue).putInt(Int.MaxValue) // w, h: pass the <=0 check
      .put(8.toByte).put(2.toByte).put(0.toByte).put(0.toByte).put(0.toByte)
      .array()
    val sig = Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)
    val png = sig ++ chunk("IHDR", ihdr) ++ chunk("IDAT", Array[Byte](1, 2, 3)) ++
      chunk("IEND", Array.emptyByteArray)
    assert(Codecs.decodePng(png).isEmpty) // not a ~6 GB stride allocation
  }

  test("avi: chunk size near Int.MaxValue fails the bound, not the allocator") {
    val bb = java.nio.ByteBuffer.allocate(32).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(24).put("AVI ".getBytes("US-ASCII"))
    bb.put("00dc".getBytes("US-ASCII")).putInt(0x7ffffff0) // position+size overflows Int
    assert(Codecs.decodeAviMjpeg(bb.array()).isEmpty) // no OOM/BufferUnderflow
  }
}

class StreamingDecodeSpec extends org.scalatest.funsuite.AnyFunSuite {
  test("codec decode composes with Structured Streaming micro-batches") {
    val spark = TestSpark.spark
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.operators.{Codecs, Gif, Jpeg, Multimodal}
    import graft.operators.Multimodal.MediaRow
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[MediaRow]
    // extractFeatures is a mapPartitions pipeline — stateless, so the
    // same code path runs unchanged inside a streaming query
    val q = Multimodal.extractFeatures(mem.toDS())
      .writeStream.format("memory").queryName("stream_decode")
      .outputMode("append").start()
    try {
      mem.addData(
        MediaRow(1L, "audio", Codecs.encodeWav(Array[Short](500, -500, 500, -500)), 0, 0),
        MediaRow(2L, "image", Jpeg.encodeJpegGray(16, 16, Array.fill(256)(58.toByte)), 16, 16))
      q.processAllAvailable()
      mem.addData( // second micro-batch: different codecs
        MediaRow(3L, "image", Gif.encodeGifGray(10, 10, Array.fill(100)(99.toByte)), 10, 10),
        MediaRow(4L, "audio", Codecs.encodeWavMuLaw(Array.fill(64)(1000.toShort)), 0, 0))
      q.processAllAvailable()
      val out = spark.table("stream_decode").collect()
        .map(r => r.getLong(0) -> r.getDouble(3)).toMap
      assert(out(1L) == 500.0)  // PCM amplitude
      assert(out(2L) == 58.0)   // JPEG decoded gray
      assert(out(3L) == 99.0)   // GIF decoded palette value
      val muDec = math.abs(Codecs.muLawDecodeSample(Codecs.muLawEncodeSample(1000)))
      assert(out(4L) == muDec.toDouble)
    } finally q.stop()
  }
}

class AudioFramesSpec extends org.scalatest.funsuite.AnyFunSuite {
  test("wav payloads frame into real sample windows; non-wav audio yields none") {
    val spark = TestSpark.spark
    import spark.implicits._
    import graft.operators.{Codecs, Multimodal}
    import graft.operators.Multimodal.MediaRow
    val wav = Codecs.encodeWav(Array.tabulate(2500)(i => (i % 100).toShort))
    val rows = Seq(
      MediaRow(1L, "audio", wav, 0, 0),
      MediaRow(2L, "audio", "not audio".getBytes, 0, 0),
      MediaRow(3L, "video", wav, 0, 0)) // wrong type -> not framed here
    val frames = Multimodal.audioFrames(rows.toDS(), windowSamples = 1024)
      .collect().sortBy(f => (f.doc_id, f.frame_idx))
    assert(frames.map(_.doc_id).distinct.toSeq == Seq(1L))
    assert(frames.length == 3) // 2500 samples -> 1024 + 1024 + 452
    assert(frames(0).offset == 0 && frames(0).n_bytes == 1024)
    assert(frames(2).offset == 2048 && frames(2).n_bytes == 452)
  }
}

class WavResampleSpec extends org.scalatest.funsuite.AnyFunSuite {
  test("2x resample interleaves truncating midpoints and doubles the rate") {
    import graft.operators.Codecs
    val src = Array[Short](100, 200, -3, 2, -500)
    val wav = Codecs.encodeWav(src, sampleRate = 8000)
    val res = Codecs.resampleWav2x(wav).get
    val (rate, out) = Codecs.decodeWavSamples(res).get
    assert(rate == 16000)
    // midpoints truncate toward zero: (200 + -3)/2 = 98, (-3 + 2)/2 = 0
    // (floor would give -1), (2 + -500)/2 = -249
    assert(out.toSeq == Seq[Short](100, 150, 200, 98, -3, 0, 2, -249, -500))
  }

  test("resample refuses non-PCM and truncated payloads") {
    import graft.operators.Codecs
    assert(Codecs.resampleWav2x("junk".getBytes).isEmpty)
    val mulaw = Codecs.encodeWavMuLaw(Array[Short](1, 2, 3))
    assert(Codecs.resampleWav2x(mulaw).isEmpty, "companded input must be transcoded first")
  }

  test("mm_phash: sorted-neighborhood candidates stay linear; hamming bounded; pairs ordered") {
    val docs = Tables.documents(TestSpark.spark, TestSpark.sf)
    val pairs = Multimodal.mmPhash(docs).collect()
    assert(pairs.nonEmpty, "ramp-generator images must yield near-dup pairs")
    val n = docs.count()
    // each doc contributes at most one lead-pair per band, so the
    // candidate ceiling (before the hamming cut) is 4n — the reported
    // set can only be smaller
    assert(pairs.length <= 4 * n, s"${pairs.length} pairs exceeds the 4n banding ceiling")
    pairs.foreach { r =>
      assert(r.getLong(0) < r.getLong(1), "lead pairing must order doc_a < doc_b")
      assert(r.getLong(2) <= 10 && r.getLong(2) >= 0)
    }
    // a doc is trivially a near-dup of itself: identical signatures
    // must produce hamming 0 through the whole banding+bit_count chain
    val dup = pairs.filter(_.getLong(2) == 0)
    assert(dup.nonEmpty, "identical-signature docs must surface at hamming 0")
  }

  test("mm_phash stream: exact image dup caught across batches; replayed epoch overwrites") {
    val spark = TestSpark.spark
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.functions._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft-phidx").toString
    // corpus = docs 0..49; the generator makes doc_id and doc_id+8960
    // pixel-identical (8960 = lcm(5,7) * 256 — same dims, ramp offset
    // 11*8960 ≡ 0 mod 256), so 8965 is an EXACT dup of corpus doc 5
    graft.operators.Multimodal.phashIndexSeed(
      (0L until 50L).toDF("doc_id"), dir)
    // hammingMax = 0: on this self-similar ramp corpus everything sits
    // within a few bits of something, so the spec pins EXACT dups only —
    // 8965 dups corpus doc 5, 100000 has no exact partner and survives,
    // and batch-2's 108960 exact-dups ONLY the batch-1 kept 100000
    var verdicts = Map.empty[Long, Seq[(Long, Option[Long], Boolean)]]
    val mem = MemoryStream[Long]
    val q = graft.operators.Multimodal
      .mmPhashStream(mem.toDF().toDF("doc_id"), dir, hammingMax = 0) { (v, id) =>
        verdicts += id -> v.collect().toSeq.map(r =>
          (r.getLong(0), Option(r.get(1)).map(_.asInstanceOf[Long]), r.getBoolean(3)))
      }
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("graft-phidx-ck").toString)
      .start()
    try {
      mem.addData(8965L, 100000L); q.processAllAvailable()
      // batch 2: a dup of the batch-1 KEPT doc 100000 (100000+8960)
      mem.addData(108960L); q.processAllAvailable()
    } finally q.stop()
    val b0 = verdicts(0L).map { case (k, v, _) => k -> v }.toMap
    assert(b0(8965L).contains(5L), s"8965 must dup corpus doc 5: $verdicts")
    val b1 = verdicts(1L)
    assert(b1 == Seq((108960L, Some(100000L), false)),
      s"cross-batch exact dup of the batch-1 kept doc must be caught: $b1")
    // only KEPT signatures append: epoch 0 holds 100000 alone (8965 dropped)
    val ep0 = spark.read.parquet(s"$dir/b0").select("doc_id")
      .collect().map(_.getLong(0)).toSeq
    assert(ep0 == Seq(100000L), s"only kept docs append to the index: $ep0")
    // replay: a fresh stream re-delivers batch 0 — same verdicts, same
    // epoch content, no double-append
    val mem2 = MemoryStream[Long]
    val q2 = graft.operators.Multimodal
      .mmPhashStream(mem2.toDF().toDF("doc_id"), dir, hammingMax = 0) { (_, _) => () }
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("graft-phidx-ck2").toString)
      .start()
    try { mem2.addData(8965L, 100000L); q2.processAllAvailable() } finally q2.stop()
    assert(spark.read.parquet(s"$dir/b0").count() == 1,
      "a replayed epoch must overwrite its dir, not double it")
    // BATCH-MATE replay: 100001 and 108961 are pixel-identical to each
    // other but exact-dup nothing standing; both keep on first run
    // (batch-internal dups are out of scope), and on replay the
    // epoch's own delta dir must be excluded from the probe or each
    // would drop the other
    val mem3 = MemoryStream[Long]
    val q3 = graft.operators.Multimodal
      .mmPhashStream(mem3.toDF().toDF("doc_id"), dir, hammingMax = 0) { (_, _) => () }
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("graft-phidx-ck3").toString)
      .start()
    try { mem3.addData(100001L, 108961L); q3.processAllAvailable() } finally q3.stop()
    assert(spark.read.parquet(s"$dir/b0").count() == 2, "first run keeps both mates")
    val mem4 = MemoryStream[Long]
    val q4 = graft.operators.Multimodal
      .mmPhashStream(mem4.toDF().toDF("doc_id"), dir, hammingMax = 0) { (_, _) => () }
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("graft-phidx-ck4").toString)
      .start()
    try { mem4.addData(100001L, 108961L); q4.processAllAvailable() } finally q4.stop()
    val mates = spark.read.parquet(s"$dir/b0").select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(mates == Set(100001L, 108961L),
      s"replayed batch-mates must not drop each other: $mates")
  }
}
