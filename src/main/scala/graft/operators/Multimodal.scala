package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing, SURVEY.md §2d item 43: media as opaque
  * binary columns + typed metadata, processed in partition-sized
  * batches via `mapPartitions` over typed Datasets (the JVM analog of
  * `mapInPandas` batch UDFs).
  *
  * Decode is REAL for WAV/G.711 audio (PCM chunk walk, [[Codecs]]),
  * PPM/PNG/baseline-JPEG/GIF87a images ([[Codecs]], [[Jpeg]], [[Gif]])
  * and AVI/MJPEG video; a clearly-marked deterministic stub stands in
  * only for foreign compressed bitstreams (MP3/H.264). Everything
  * around it — schema, batching, partitioning, feature/resize/
  * frame-sample signatures — is the real Spark plumbing a production
  * codec would drop into.
  */
object Multimodal {

  case class MediaRow(doc_id: Long, media_type: String, content: Array[Byte],
                      width: Int, height: Int)
  case class MediaFeatures(doc_id: Long, media_type: String, n_bytes: Long,
                           mean_byte: Double, width: Int, height: Int, n_frames: Int)
  case class Frame(doc_id: Long, frame_idx: Int, offset: Long, n_bytes: Int)

  /** Derives a deterministic media table from `documents`: content is
    * the utf-8 payload as opaque bytes; metadata is md5-derived (so any
    * SQL engine can recompute it — the oracle mirrors this table). */
  def mediaTable(documents: DataFrame): Dataset[MediaRow] = {
    import documents.sparkSession.implicits._
    def mdBucket(salt: String): org.apache.spark.sql.Column =
      (conv(substring(md5(concat(col("doc_id").cast("string"), lit(salt))), 1, 4), 16, 10)
        .cast("long") % 8).cast("int")
    documents.select(
      col("doc_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (col("doc_id") % 3 + 1).cast("int")).as("media_type"),
      col("text").cast("binary").as("content"),
      (lit(32) + mdBucket("w") * 16).as("width"),
      (lit(32) + mdBucket("h") * 16).as("height"))
      .as[MediaRow]
  }

  /** STUB DECODER: stands in for foreign compressed bitstreams only
    * (MP3/H.264 — see the SURVEY §2d-43 priority argument). Deterministic
    * over the bytes; [[decodeAny]] prefers the REAL parsers below. */
  private def decodeStub(content: Array[Byte]): (Double, Int) = {
    var sum = 0L
    var i = 0
    while (i < content.length) { sum += content(i) & 0xff; i += 1 }
    val mean = if (content.length == 0) 0.0 else sum.toDouble / content.length
    val frames = content.length / 64 + 1 // fake "frame" every 64 bytes
    (mean, frames)
  }

  /** Decode dispatch: REAL parsers — PCM/G.711 WAV, binary PPM, PNG,
    * baseline JPEG, GIF87a and AVI/MJPEG ([[Codecs]]/[[Jpeg]]/[[Gif]])
    * — with the stub as fallback only for foreign bitstreams
    * (MP3/H.264). Valid media yields true sample/pixel statistics;
    * synthetic payloads degrade to the stub, so both travel the same
    * plumbing. */
  private[operators] def decodeAny(mediaType: String, content: Array[Byte]): (Double, Int) =
    (mediaType match {
      case "audio" => Codecs.decodeWav(content)
        .map(w => (w.meanAbsAmplitude, math.max(1, w.nSamples / 1024)))
      case "image" => Codecs.decodePpm(content).orElse(Codecs.decodePng(content))
        .map(p => ((p.meanR + p.meanG + p.meanB) / 3.0, 1))
        .orElse(Jpeg.decodeJpegGray(content).map(j => (j.meanGray, 1)))
        .orElse(Gif.decodeGif(content).map(g => ((g.meanR + g.meanG + g.meanB) / 3.0, 1)))
      case "video" => Codecs.decodeAviMjpeg(content)
        .map(a => (a.frameMeans.sum / a.nFrames, a.nFrames))
      case _ => None
    }).getOrElse(decodeStub(content))

  /** Feature extraction in partition batches; no shuffle — scales with
    * input partitioning alone. `mean_byte` is raw (unrounded); query-
    * layer consumers round it for display/compare. */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        val (mean, frames) = decodeAny(r.media_type, r.content)
        MediaFeatures(r.doc_id, r.media_type, r.content.length.toLong,
          mean, r.width, r.height, if (r.media_type == "video") frames else 1)
      }
    }
  }

  /** Resize: REAL nearest-neighbor resample for every image format the
    * codecs handle — PPM (raw), PNG (decode→resample→re-deflate), JPEG
    * (decode→resample→re-encode, lossy like any real JPEG resize);
    * metadata-true byte-budget stub only for foreign payloads. */
  def resize(media: Dataset[MediaRow], w: Int, h: Int): Dataset[MediaRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        val resized =
          if (r.media_type == "image")
            Codecs.resizePpm(r.content, w, h)
              .orElse(Codecs.resizePng(r.content, w, h))
              .orElse(Jpeg.resizeJpegGray(r.content, w, h))
          else None
        val out = resized.getOrElse {
          val budget = w * h / 64 + 1
          java.util.Arrays.copyOf(r.content, budget)
        }
        r.copy(content = out, width = w, height = h)
      }
    }
  }

  /** Frame sampling for "video" rows: every `stride`-th fake frame. */
  def frameSample(media: Dataset[MediaRow], stride: Int = 4): Dataset[Frame] = {
    import media.sparkSession.implicits._
    media.filter(_.media_type == "video").mapPartitions { rows =>
      rows.flatMap { r =>
        val n = r.content.length / 64 + 1
        (0 until n by stride).map { i =>
          val off = i.toLong * 64
          val len = math.min(64, r.content.length - off).toInt.max(0)
          Frame(r.doc_id, i, off, len)
        }
      }
    }
  }

  /** REAL audio framing: "audio" rows whose payload parses as 16-bit
    * PCM WAV are cut into `windowSamples`-sized sample windows (the
    * feature-extraction frames an ASR/audio pipeline consumes); frame
    * offsets/sizes are in SAMPLES of the actual data chunk, not fake
    * byte strides. Non-WAV audio payloads yield no frames. */
  def audioFrames(media: Dataset[MediaRow], windowSamples: Int = 1024,
                  stride: Int = 1): Dataset[Frame] = {
    import media.sparkSession.implicits._
    media.filter(_.media_type == "audio").mapPartitions { rows =>
      rows.flatMap { r =>
        Codecs.decodeWav(r.content).toSeq.flatMap { wav =>
          val n = (wav.nSamples + windowSamples - 1) / windowSamples
          (0 until n by stride).map { i =>
            val off = i.toLong * windowSamples
            val len = math.min(windowSamples.toLong, wav.nSamples - off).toInt.max(0)
            Frame(r.doc_id, i, off, len)
          }
        }
      }
    }
  }

  /** Query-shaped summary (every column SQL-recomputable: byte stats
    * from the utf-8 payload, md5 metadata, stub frame arithmetic). */
  def mmFeatures(documents: DataFrame): DataFrame = {
    import documents.sparkSession.implicits._
    extractFeatures(mediaTable(documents)).toDF()
      .withColumn("mean_byte", round(col("mean_byte"), 4))
      .orderBy(col("doc_id"))
  }

  /** Media table whose payloads are REAL encoded files: odd doc_ids
    * carry a 16-bit PCM RIFF/WAVE payload, even doc_ids a binary P6
    * PPM, both generated by [[Codecs]]' encoders with closed-form
    * sample/pixel values in (doc_id, index) — so a SQL oracle can
    * regenerate every sample arithmetically and recompute the decoded
    * statistics without any codec. */
  def mediaTableEncoded(documents: DataFrame): Dataset[MediaRow] = {
    import documents.sparkSession.implicits._
    documents.select(col("doc_id")).as[Long].mapPartitions { it =>
      it.map { id =>
        if (id % 2 == 1) {
          val n = 200 + (id % 5).toInt * 100
          val samples = new Array[Short](n)
          var i = 0
          while (i < n) {
            samples(i) = (((id * 31 + i.toLong * 17) % 2001) - 1000).toShort
            i += 1
          }
          MediaRow(id, "audio", Codecs.encodeWav(samples), 0, 0)
        } else {
          val w = 16 + (id % 4).toInt * 8
          val h = 16 + (id % 3).toInt * 8
          val rgb = new Array[Byte](w * h * 3)
          var j = 0
          while (j < rgb.length) {
            rgb(j) = ((id * 7 + j.toLong * 13) % 256).toByte
            j += 1
          }
          MediaRow(id, "image", Codecs.encodePpm(w, h, rgb), w, h)
        }
      }
    }
  }

  /** Media table of real PNG payloads: every doc_id carries an 8-bit
    * RGB image with closed-form pixel values in (doc_id, byte index),
    * run through [[Codecs.encodePng]] — adaptive scanline filtering +
    * zlib DEFLATE, a genuinely compressed format. Lossless round-trip
    * means the oracle recomputes decoded stats from the generator. */
  def mediaTablePng(documents: DataFrame): Dataset[MediaRow] = {
    import documents.sparkSession.implicits._
    documents.select(col("doc_id")).as[Long].mapPartitions { it =>
      it.map { id =>
        val w = 12 + (id % 5).toInt * 4
        val h = 12 + (id % 7).toInt * 4
        val rgb = new Array[Byte](w * h * 3)
        var j = 0
        while (j < rgb.length) {
          rgb(j) = ((id * 11 + j.toLong * 29) % 256).toByte
          j += 1
        }
        MediaRow(id, "image", Codecs.encodePng(w, h, rgb), w, h)
      }
    }
  }

  /** mm_png query: decode real zlib-compressed PNGs
    * ([[Codecs.decodePng]] — CRC-verified chunk walk, inflate, full
    * unfiltering) and report per-channel pixel means. The oracle
    * regenerates the pixels arithmetically; any decode error fails the
    * query loudly rather than degrading to a stub. */
  def mmPng(documents: DataFrame): DataFrame = {
    import documents.sparkSession.implicits._
    mediaTablePng(documents).mapPartitions { rows =>
      rows.map { r =>
        val p = Codecs.decodePng(r.content)
          .getOrElse(sys.error(s"PNG decode failed for doc ${r.doc_id}"))
        (r.doc_id, p.width, p.height, p.meanR, p.meanG, p.meanB,
          p.width.toLong * p.height * 3)
      }
    }.toDF("doc_id", "width", "height", "mean_r", "mean_g", "mean_b", "decoded_bytes")
      .select(col("doc_id"), col("width"), col("height"),
        round(col("mean_r"), 4).as("mean_r"),
        round(col("mean_g"), 4).as("mean_g"),
        round(col("mean_b"), 4).as("mean_b"),
        col("decoded_bytes"))
      .orderBy(col("doc_id"))
  }

  /** Resize through the REAL codec path: the synthesized PNG is
    * decoded, nearest-neighbor resampled to a doc-dependent target,
    * re-encoded, and the RESIZED file decoded again for its channel
    * means — the full decode→resample→encode→decode loop a production
    * thumbnail stage runs. The oracle recomputes the nn index map
    * (sy = (y·h)/h2, sx = (x·w)/w2, integer division — exactly
    * [[Codecs.nnResample]]) against the closed-form pixel generator,
    * so any defect in either decode pass, the resampler, or the
    * encoder shifts a mean and hash-fails. */
  def mmResize(documents: DataFrame): DataFrame = {
    import documents.sparkSession.implicits._
    mediaTablePng(documents).mapPartitions { rows =>
      rows.map { r =>
        val w2 = 8 + (r.doc_id % 3).toInt * 2
        val h2 = 6 + (r.doc_id % 4).toInt * 2
        val resized = Codecs.resizePng(r.content, w2, h2)
          .getOrElse(sys.error(s"PNG resize failed for doc ${r.doc_id}"))
        val p = Codecs.decodePng(resized)
          .getOrElse(sys.error(s"resized-PNG decode failed for doc ${r.doc_id}"))
        (r.doc_id, p.width, p.height, p.meanR, p.meanG, p.meanB)
      }
    }.toDF("doc_id", "width", "height", "mean_r", "mean_g", "mean_b")
      .select(col("doc_id"), col("width"), col("height"),
        round(col("mean_r"), 4).as("mean_r"),
        round(col("mean_g"), 4).as("mean_g"),
        round(col("mean_b"), 4).as("mean_b"))
      .orderBy(col("doc_id"))
  }

  /** Media table of format-7 (G.711 μ-law) WAV payloads — a real
    * compressed telephony codec. Code bytes are closed-form in
    * (doc_id, index); μ-law decode is itself closed-form
    * (((mant·8+132)<<exp)−132), so the oracle recomputes the decoded
    * amplitude stats without any codec. */
  def mediaTableMuLaw(documents: DataFrame): Dataset[MediaRow] = {
    import documents.sparkSession.implicits._
    documents.select(col("doc_id")).as[Long].mapPartitions { it =>
      it.map { id =>
        val n = 300 + (id % 7).toInt * 50
        val codes = new Array[Byte](n)
        var i = 0
        while (i < n) { codes(i) = ((id * 13 + i.toLong * 7) % 256).toByte; i += 1 }
        MediaRow(id, "audio", Codecs.encodeWavMuLawCodes(codes), 0, 0)
      }
    }
  }

  /** mm_mulaw query: decode compressed G.711 audio through the real
    * [[Codecs.decodeWav]] format-7 branch (companded byte → 16-bit
    * linear sample) and report amplitude stats the oracle recomputes
    * from the μ-law expansion formula. A decoder that read the codes
    * as raw bytes (mean ~127) instead of expanding them (mean ~8000)
    * hash-fails every row. */
  def mmMulaw(documents: DataFrame): DataFrame = {
    import documents.sparkSession.implicits._
    mediaTableMuLaw(documents).mapPartitions { rows =>
      rows.map { r =>
        val w = Codecs.decodeWav(r.content)
          .getOrElse(sys.error(s"mu-law decode failed for doc ${r.doc_id}"))
        (r.doc_id, r.content.length.toLong, w.nSamples.toLong, w.meanAbsAmplitude)
      }
    }.toDF("doc_id", "n_bytes", "n_samples", "mean_decoded")
      .withColumn("mean_decoded", round(col("mean_decoded"), 4))
      .orderBy(col("doc_id"))
  }

  /** A-law sibling of [[mediaTableMuLaw]] (WAV format 6, ITU G.711
    * European companding): code bytes closed-form in (doc_id, index). */
  def mediaTableALaw(documents: DataFrame): Dataset[MediaRow] = {
    import documents.sparkSession.implicits._
    documents.select(col("doc_id")).as[Long].mapPartitions { it =>
      it.map { id =>
        val n = 250 + (id % 5).toInt * 60
        val codes = new Array[Byte](n)
        var i = 0
        while (i < n) { codes(i) = ((id * 17 + i.toLong * 11) % 256).toByte; i += 1 }
        MediaRow(id, "audio", Codecs.encodeWavALawCodes(codes), 0, 0)
      }
    }
  }

  /** mm_alaw query: decode format-6 (A-law) audio through the real
    * [[Codecs.decodeWav]] branch; the oracle recomputes amplitudes via
    * the A-law expansion (exp=0 → mant·16+8, else (mant·16+264)
    * <<(exp−1)). */
  def mmAlaw(documents: DataFrame): DataFrame = {
    import documents.sparkSession.implicits._
    mediaTableALaw(documents).mapPartitions { rows =>
      rows.map { r =>
        val w = Codecs.decodeWav(r.content)
          .getOrElse(sys.error(s"a-law decode failed for doc ${r.doc_id}"))
        (r.doc_id, r.content.length.toLong, w.nSamples.toLong, w.meanAbsAmplitude)
      }
    }.toDF("doc_id", "n_bytes", "n_samples", "mean_decoded")
      .withColumn("mean_decoded", round(col("mean_decoded"), 4))
      .orderBy(col("doc_id"))
  }

  /** Media table of real GIF87a payloads: grayscale-palette images
    * whose pixel indices are closed-form in (doc_id, pixel index),
    * LZW-compressed by [[Gif.encodeGifGray]]. */
  def mediaTableGif(documents: DataFrame): Dataset[MediaRow] = {
    import documents.sparkSession.implicits._
    documents.select(col("doc_id")).as[Long].mapPartitions { it =>
      it.map { id =>
        val w = 10 + (id % 6).toInt * 5
        val h = 10 + (id % 5).toInt * 6
        val px = new Array[Byte](w * h)
        var p = 0
        while (p < px.length) { px(p) = ((id * 19 + p.toLong * 23) % 256).toByte; p += 1 }
        MediaRow(id, "image", Gif.encodeGifGray(w, h, px), w, h)
      }
    }
  }

  /** mm_gif query: decode real LZW-compressed GIFs ([[Gif]] — hand-
    * rolled variable-width LZW, palette mapping, sub-block walk) and
    * report channel means. GIF is lossless, so the oracle recomputes
    * the means from the pixel generator; any LZW/palette/framing
    * defect hash-fails. */
  def mmGif(documents: DataFrame): DataFrame = {
    import documents.sparkSession.implicits._
    mediaTableGif(documents).mapPartitions { rows =>
      rows.map { r =>
        val g = Gif.decodeGif(r.content)
          .getOrElse(sys.error(s"GIF decode failed for doc ${r.doc_id}"))
        // grayscale palette: all three channel means are identical, so
        // report meanR directly (avoids an ulp of (3m)/3 float drift)
        (r.doc_id, g.width, g.height, g.meanR, g.width.toLong * g.height)
      }
    }.toDF("doc_id", "width", "height", "mean_gray", "decoded_bytes")
      .withColumn("mean_gray", round(col("mean_gray"), 4))
      .orderBy(col("doc_id"))
  }

  /** Media table of real baseline JPEG payloads: each doc_id carries a
    * grayscale image of solid 8x8 tiles whose values sit at even
    * offsets from 128 — the one image family the lossy pipeline
    * reconstructs EXACTLY (DC 8·(g−128) divides Q00=16, all ACs
    * vanish), proven in JpegCodecSpec. Tile values are closed-form in
    * (doc_id, block index). */
  def mediaTableJpeg(documents: DataFrame): Dataset[MediaRow] = {
    import documents.sparkSession.implicits._
    documents.select(col("doc_id")).as[Long].mapPartitions { it =>
      it.map { id =>
        val w = 8 * (2 + (id % 3).toInt)
        val h = 8 * (2 + (id % 4).toInt)
        val bw = w / 8
        val px = new Array[Byte](w * h)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val b = (y / 8) * bw + (x / 8)
            px(y * w + x) = (18 + ((id * 5 + b.toLong * 11) % 12) * 20).toByte
            x += 1
          }
          y += 1
        }
        MediaRow(id, "image", Jpeg.encodeJpegGray(w, h, px), w, h)
      }
    }
  }

  /** mm_jpeg query: decode real baseline JPEGs ([[Jpeg]] — marker
    * parse, Annex-K Huffman entropy decode, dequant, IDCT) and report
    * the decoded mean gray. The tile construction makes the lossy
    * codec exact, so the oracle recomputes the mean from the tile
    * generator; any Huffman/DCT/quant/marker defect hash-fails. */
  def mmJpeg(documents: DataFrame): DataFrame = {
    import documents.sparkSession.implicits._
    mediaTableJpeg(documents).mapPartitions { rows =>
      rows.map { r =>
        val j = Jpeg.decodeJpegGray(r.content)
          .getOrElse(sys.error(s"JPEG decode failed for doc ${r.doc_id}"))
        (r.doc_id, j.width, j.height, j.meanGray, j.width.toLong * j.height)
      }
    }.toDF("doc_id", "width", "height", "mean_gray", "decoded_bytes")
      .withColumn("mean_gray", round(col("mean_gray"), 4))
      .orderBy(col("doc_id"))
  }

  /** Media table of real AVI/MJPEG video payloads: each doc_id carries
    * 3 + (id % 4) JPEG frames of 16x16 solid tiles (the exact-survival
    * family, varying per frame), in a proper RIFF/AVI container. */
  def mediaTableVideo(documents: DataFrame): Dataset[MediaRow] = {
    import documents.sparkSession.implicits._
    documents.select(col("doc_id")).as[Long].mapPartitions { it =>
      it.map { id =>
        val w = 16; val h = 16
        val nf = 3 + (id % 4).toInt
        val frames = (0 until nf).map { f =>
          val px = new Array[Byte](w * h)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val b = (y / 8) * 2 + (x / 8)
              px(y * w + x) =
                (18 + ((id * 5 + f.toLong * 13 + b.toLong * 11) % 12) * 20).toByte
              x += 1
            }
            y += 1
          }
          Jpeg.encodeJpegGray(w, h, px)
        }
        MediaRow(id, "video", Codecs.encodeAviMjpeg(w, h, frames), w, h)
      }
    }
  }

  /** mm_video query: walk a real AVI container, decode every MJPEG
    * frame through [[Jpeg]], report frame count and mean gray across
    * frames. The tile family makes every frame's decode exact, so the
    * oracle recomputes the means from the (doc_id, frame, block)
    * generator; a fake byte-stride "frame" count hash-fails. */
  def mmVideo(documents: DataFrame): DataFrame = {
    import documents.sparkSession.implicits._
    mediaTableVideo(documents).mapPartitions { rows =>
      rows.map { r =>
        val a = Codecs.decodeAviMjpeg(r.content)
          .getOrElse(sys.error(s"AVI decode failed for doc ${r.doc_id}"))
        (r.doc_id, a.width, a.height, a.nFrames,
          a.frameMeans.sum / a.nFrames,
          a.frameMeans.head, a.frameMeans.last)
      }
    }.toDF("doc_id", "width", "height", "n_frames", "mean_gray",
        "first_frame_mean", "last_frame_mean")
      .select(col("doc_id"), col("width"), col("height"), col("n_frames"),
        round(col("mean_gray"), 4).as("mean_gray"),
        round(col("first_frame_mean"), 4).as("first_frame_mean"),
        round(col("last_frame_mean"), 4).as("last_frame_mean"))
      .orderBy(col("doc_id"))
  }

  /** mm_decode query: the [[extractFeatures]] pipeline over real
    * encoded payloads, so [[decodeAny]] takes the
    * [[Codecs.decodeWav]]/[[Codecs.decodePpm]] branch (not the stub) in
    * a CORRECTNESS-gated query path. `mean_decoded` is the decoded
    * mean |amplitude| (audio) / channel-mean pixel value (image) —
    * values only a true byte-level parse of the RIFF/P6 payload
    * produces; the oracle recomputes them from the closed-form
    * generator and would hash-mismatch on any stub fallback. */
  def mmDecode(documents: DataFrame): DataFrame = {
    import documents.sparkSession.implicits._
    extractFeatures(mediaTableEncoded(documents)).toDF()
      .select(col("doc_id"), col("media_type"), col("n_bytes"),
        round(col("mean_byte"), 4).as("mean_decoded"),
        col("width"), col("height"), col("n_frames"))
      .orderBy(col("doc_id"))
  }

  /** Media table of PCM16 WAV payloads for EVERY doc (the all-audio
    * sibling of [[mediaTableEncoded]]'s odd branch): closed-form
    * samples s(i) = ((id·31 + i·17) mod 2001) − 1000 at 8 kHz. */
  def mediaTableWav(documents: DataFrame): Dataset[MediaRow] = {
    import documents.sparkSession.implicits._
    documents.select(col("doc_id")).as[Long].mapPartitions { it =>
      it.map { id =>
        val n = 200 + (id % 5).toInt * 100
        val samples = new Array[Short](n)
        var i = 0
        while (i < n) {
          samples(i) = (((id * 31 + i.toLong * 17) % 2001) - 1000).toShort
          i += 1
        }
        MediaRow(id, "audio", Codecs.encodeWav(samples), 0, 0)
      }
    }
  }

  /** mm_resample query: the audio analog of [[mmResize]]'s thumbnail
    * loop — decode PCM WAV → 2× linear-interpolation upsample
    * ([[Codecs.resampleWav2x]], truncating integer midpoints) →
    * re-encode at 16 kHz → decode the RESAMPLED file again for its
    * amplitude stats. The oracle replays the interpolation
    * arithmetically from the closed-form generator, so a defect in
    * either decode pass, the resampler, or the re-encode hash-fails. */
  def mmResample(documents: DataFrame): DataFrame = {
    import documents.sparkSession.implicits._
    mediaTableWav(documents).mapPartitions { rows =>
      rows.map { r =>
        val in = Codecs.decodeWav(r.content)
          .getOrElse(sys.error(s"WAV decode failed for doc ${r.doc_id}"))
        val res = Codecs.resampleWav2x(r.content)
          .getOrElse(sys.error(s"WAV resample failed for doc ${r.doc_id}"))
        val out = Codecs.decodeWav(res)
          .getOrElse(sys.error(s"resampled-WAV decode failed for doc ${r.doc_id}"))
        (r.doc_id, in.nSamples.toLong, out.nSamples.toLong,
          out.sampleRate.toLong, out.meanAbsAmplitude)
      }
    }.toDF("doc_id", "n_in", "n_out", "rate_out", "mean_abs_out")
      .withColumn("mean_abs_out", round(col("mean_abs_out"), 4))
      .orderBy(col("doc_id"))
  }

  /** Perceptual near-duplicate detection (dHash) over the REAL decode
    * path: each PNG is decoded ([[Codecs.decodePngPixels]] — CRC walk,
    * inflate, unfilter), its integer-milli luma is nearest-neighbor
    * sampled onto the classic 9×8 dHash grid, and adjacent-column
    * gradient signs form a 64-bit signature carried as four 16-bit
    * band keys. Candidate generation is SORTED-NEIGHBORHOOD banding
    * (Hernández & Stolfo): within each band bucket only ADJACENT
    * doc_ids pair via `lead` — candidate volume is O(docs·bands) BY
    * CONSTRUCTION, immune to the degenerate-bucket blowup a pairwise
    * band join suffers on self-similar corpora (this generator's ramp
    * images collapse ~2.5 % of all pairs into shared buckets; a
    * quadratic expansion would be the exact §9 banding failure mode).
    * Hamming distance is four codegen'd bit_counts — row-local, no
    * shuffle after the one band-bucket window. The oracle replays the
    * whole chain — closed-form pixels, grid, gradient bits, banding,
    * lead pairing, bit_count — in SQL. */
  /** dHash signatures through the REAL decode: per doc the decoded
    * dimensions and the 64-bit gradient hash as four 16-bit band keys.
    * Shared by the pairs face ([[mmPhash]]) and the curation capstone
    * ([[mmCuration]]). */
  private def phashSignatures(documents: DataFrame): DataFrame = {
    import documents.sparkSession.implicits._
    mediaTablePng(documents).mapPartitions { rows =>
      rows.map { r =>
        val (w, h, rgb) = Codecs.decodePngPixels(r.content)
          .getOrElse(sys.error(s"PNG decode failed for doc ${r.doc_id}"))
        def lum(x: Int, y: Int): Long = {
          val j = 3 * (y * w + x)
          299L * (rgb(j) & 0xFF) + 587L * (rgb(j + 1) & 0xFF) +
            114L * (rgb(j + 2) & 0xFF)
        }
        val g = Array.tabulate(8, 9)((y, x) => lum((x * w) / 9, (y * h) / 8))
        var hash = 0L
        var y = 0
        while (y < 8) {
          var x = 0
          while (x < 8) {
            if (g(y)(x + 1) > g(y)(x)) hash |= 1L << (y * 8 + x)
            x += 1
          }
          y += 1
        }
        (r.doc_id, w, h, hash & 0xFFFFL, (hash >>> 16) & 0xFFFFL,
          (hash >>> 32) & 0xFFFFL, (hash >>> 48) & 0xFFFFL)
      }
    }.toDF("doc_id", "width", "height", "b0", "b1", "b2", "b3")
  }

  /** Sorted-neighborhood near-dup pairs over the band keys (see
    * [[mmPhash]] for the shape argument). */
  private def phashPairs(sig: DataFrame, hammingMax: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byBucket = Window.partitionBy(col("band"), col("key")).orderBy(col("doc_id"))
    sig
      .select(col("doc_id"), col("b0"), col("b1"), col("b2"), col("b3"),
        posexplode(array(col("b0"), col("b1"), col("b2"), col("b3")))
          .as(Seq("band", "key")))
      .withColumn("doc_b", lead(col("doc_id"), 1).over(byBucket))
      .withColumn("nb0", lead(col("b0"), 1).over(byBucket))
      .withColumn("nb1", lead(col("b1"), 1).over(byBucket))
      .withColumn("nb2", lead(col("b2"), 1).over(byBucket))
      .withColumn("nb3", lead(col("b3"), 1).over(byBucket))
      .filter(col("doc_b").isNotNull)
      .select(col("doc_id").as("doc_a"), col("doc_b"),
        (expr("bit_count(b0 ^ nb0) + bit_count(b1 ^ nb1)") +
          expr("bit_count(b2 ^ nb2) + bit_count(b3 ^ nb3)"))
          .cast("long").as("hamming"))
      .distinct()
      .filter(col("hamming") <= hammingMax)
  }

  def mmPhash(documents: DataFrame, hammingMax: Int = 10): DataFrame =
    phashPairs(phashSignatures(documents), hammingMax)
      .orderBy(col("doc_a"), col("doc_b"))

  /** Perceptual-dedup threshold tuning curve — pair counts per
    * hamming distance over the banded candidate space (the image
    * analog of [[Dedup.dedupThresholdCurve]]'s "why 0.8?" audit: why
    * hamming ≤ 10?). Read bottom-up: a cutoff at distance d flags
    * Σ_{d'≤d} pairs. Identical cost to one mm_phash pass — the curve
    * is a ≤ hammingMax-row aggregate over its pairs. */
  def mmPhashCurve(documents: DataFrame, hammingMax: Int = 10): DataFrame =
    phashPairs(phashSignatures(documents), hammingMax)
      .groupBy(col("hamming")).agg(count(lit(1)).as("n_pairs"))
      .orderBy(col("hamming"))

  /** Incremental perceptual dedup — the image analog of
    * [[Dedup.dedupIncremental]]: new docs (doc_id % batchMod == 0)
    * probe the STANDING corpus signatures on shared band keys; the
    * corpus never self-joins. One materialized signature pass feeds
    * both sides here (self-contained + oracle-reproducible);
    * production stores the corpus side ([[mmPhashStream]]). */
  def mmPhashIncremental(documents: DataFrame, batchMod: Int = 10,
                         hammingMax: Int = 10): DataFrame = {
    val sig = Dedup.materialized(phashSignatures(documents))
    val isNew = pmod(col("doc_id"), lit(batchMod.toLong)) === 0L
    probePhash(sig.filter(isNew), sig.filter(!isNew), hammingMax)
  }

  /** Probe core of [[mmPhashIncremental]] / [[mmPhashStream]]:
    * band-key equi-join of the batch against the standing index
    * (candidate volume = batch bands × bucket occupancy — a probe
    * must see every bucket member, so unlike the batch pairs face the
    * sorted-neighborhood trick doesn't apply; the band width is the
    * occupancy knob), hamming row-local via four bit_counts, nearest
    * partner per new doc (hamming asc, old_id asc), keep = no partner
    * within `hammingMax`. */
  def probePhash(batchSigs: DataFrame, corpusSigs: DataFrame,
                 hammingMax: Int = 10): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    def banded(s: DataFrame, pre: String) = s.select(
      col("doc_id").as(s"${pre}_id"),
      col("b0").as(s"${pre}b0"), col("b1").as(s"${pre}b1"),
      col("b2").as(s"${pre}b2"), col("b3").as(s"${pre}b3"),
      posexplode(array(col("b0"), col("b1"), col("b2"), col("b3")))
        .as(Seq("band", "key")))
    val cands = banded(batchSigs, "new")
      .join(banded(corpusSigs, "old"), Seq("band", "key"))
      // self-pair guard: on an epoch REPLAY the probed index already
      // contains the batch's own docs — a doc must never dup itself,
      // or replay would drop everything it kept the first time
      .filter(col("new_id") =!= col("old_id"))
      .select(col("new_id"), col("old_id"),
        col("newb0"), col("newb1"), col("newb2"), col("newb3"),
        col("oldb0"), col("oldb1"), col("oldb2"), col("oldb3"))
      .distinct()
    val top = cands
      .withColumn("hamming",
        (expr("bit_count(newb0 ^ oldb0) + bit_count(newb1 ^ oldb1)") +
          expr("bit_count(newb2 ^ oldb2) + bit_count(newb3 ^ oldb3)"))
          .cast("long"))
      .filter(col("hamming") <= hammingMax)
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("new_id")).orderBy(col("hamming"), col("old_id"))))
      .filter(col("rn") === 1)
      .select(col("new_id").as("doc_id"), col("old_id").as("dup_of"),
        col("hamming"))
    batchSigs.select(col("doc_id"))
      .join(top, Seq("doc_id"), "left")
      .withColumn("keep", col("dup_of").isNull)
      .orderBy(col("doc_id"))
  }

  /** Seed the standing image-signature index ([[mmPhashStream]] reads
    * every epoch dir under `indexDir`; this writes the corpus as
    * `base`). */
  def phashIndexSeed(documents: DataFrame, indexDir: String): Unit =
    phashSignatures(documents).write.mode("overwrite").parquet(s"$indexDir/base")

  /** Ingest-stream face of [[mmPhashIncremental]]: per micro-batch
    * (1) decode + sign the batch, (2) probe every signature epoch
    * under `indexDir` (seed it with the corpus signatures first),
    * (3) hand verdicts to `onVerdicts`, (4) append the KEPT docs'
    * signatures as `indexDir/b<batchId>` — the self-growing image
    * index, with the same overwrite-on-replay idempotency rule as
    * dedupIncrementalStream. No streaming state, no watermark.
    * OWNERSHIP CONTRACT: epoch dirs are keyed by the stream's
    * batchId — one logical stream (one checkpoint) per indexDir; a
    * different stream against the same dir would restart at batch 0
    * and overwrite earlier epochs. */
  def mmPhashStream(docs: DataFrame, indexDir: String, hammingMax: Int = 10)
                   (onVerdicts: (DataFrame, Long) => Unit)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    docs.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      val spark = batch.sparkSession
      val batchSigs = phashSignatures(batch)
      // exclude this epoch's OWN delta dir from the probe input: on a
      // REPLAY it already holds the batch's kept signatures, and
      // probing it would let batch-mate near-dups drop each other
      // (kept the first time, dropped on replay — the epoch rewrites
      // empty). Excluding it also keeps the overwrite target out of
      // the probe's input set, so the lazy write is safe as-is.
      val epochs = StoredArtifacts.listEpochs(spark, indexDir,
        prefix = "", exclude = Set(s"b$batchId"))
      require(epochs.nonEmpty, s"no signature epochs under $indexDir — " +
        "seed the index with phashIndexSeed before streaming")
      val corpus = spark.read.parquet(epochs: _*)
      val verdicts = probePhash(batchSigs, corpus, hammingMax)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try {
        onVerdicts(verdicts, batchId)
        batchSigs
          .join(verdicts.filter(col("keep")).select(col("doc_id")),
            Seq("doc_id"), "left_semi")
          .write.mode("overwrite").parquet(s"$indexDir/b$batchId")
      } finally verdicts.unpersist()
    }

  /** The MULTIMODAL curation capstone — the image-side analog of
    * pipeline_assembly, composing three operator families in one
    * plan: (1) REAL PNG decode → dHash signatures, (2) perceptual
    * near-dup removal (sorted-neighborhood pairs; the higher doc_id
    * of each near pair drops — the dedup family's keep-min
    * convention), (3) the text-quality gate over the surviving docs
    * (same row-local composite score as pipeline_curation), then a
    * per-resolution manifest of what survives for training. Scale:
    * dedup volume is O(docs·bands) by construction, the drop list
    * joins as a LEFT-ANTI on doc_id, quality is a zero-shuffle
    * row-local expression, and the final rollup has
    * width×height-bounded cardinality. Dimensions come from the
    * DECODE, not metadata — a decoder defect shifts the manifest and
    * hash-fails. */
  def mmCuration(documents: DataFrame, hammingMax: Int = 10,
                 minQuality: Double = 0.5): DataFrame = {
    // materialized: sig feeds both the pairs pass and the dims join —
    // without it the full PNG decode of every document runs twice
    val sig = Dedup.materialized(phashSignatures(documents))
    val dropped = phashPairs(sig, hammingMax)
      .select(col("doc_b").as("doc_id")).distinct()
    documents
      .join(dropped, Seq("doc_id"), "left_anti")
      .filter(TextOps.rawQualityScore >= minQuality)
      .select(col("doc_id"), TextOps.rawQualityScore.as("q"))
      .join(sig.select(col("doc_id"), col("width"), col("height")), Seq("doc_id"))
      .groupBy(col("width"), col("height"))
      .agg(count(lit(1)).as("n_docs"),
        round(avg(col("q")) + lit(1e-9), 4).as("avg_quality"))
      .orderBy(col("width"), col("height"))
  }
}
