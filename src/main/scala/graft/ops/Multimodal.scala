package graft.ops

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import javax.imageio.ImageIO

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Multimodal column plumbing: media as opaque `binary` columns with typed
 * metadata, processed in partition-local batches.
 *
 * All three modalities decode for REAL with pure-JDK codecs (no external
 * libraries in this container):
 *  - images: `decodeImage` — ImageIO PNG/BMP/JPEG/GIF -> bilinear 8x8
 *    grayscale thumbnail -> 64-dim luma vector, a perceptual feature that
 *    plugs straight into the engine's embedding operators (cosine top-k /
 *    LSH / IVF) for image near-dup detection;
 *  - audio: `decodeWav` — javax.sound PCM16 WAV -> RMS loudness +
 *    zero-crossing rate (the loudness/voicing gates curation filters use);
 *  - video: `splitMjpegFrames` + `extractVideoFeatures` — Motion-JPEG
 *    container split, every-k-th frame sampled and decoded through the
 *    image kernel, per-video luma stats + trend.
 * `decodeStub` (byte moments) remains only for genuinely codec-less media
 * types, preserving the opaque-binary plumbing contract; every decode runs
 * in fixed-size partition-local batches, the shape a device-backed kernel
 * wants.
 */
object Multimodal {

  final case class MediaRow(doc_id: Long, media_type: String, media: Array[Byte])
  final case class MediaFeatures(doc_id: Long, media_type: String, n_bytes: Int,
      features: Array[Float])
  final case class ImageFeatures(doc_id: Long, width: Int, height: Int,
      mean_luma: Double, thumb: Array[Float])

  /** Batch size a real decoder kernel would be fed (GPU-friendly shape). */
  val DecodeBatchSize = 64

  ImageIO.setUseCache(false) // never spill decode scratch to disk on executors

  /**
   * STUB decode / feature-extract for codec-less media types. Deterministic
   * function of the bytes: [length-scale, mean byte, variance, first-byte,
   * last-byte] — stands in for (audio resample -> fbank) etc.
   */
  def decodeStub(bytes: Array[Byte]): Array[Float] = {
    if (bytes.isEmpty) return Array(0f, 0f, 0f, 0f, 0f)
    var sum = 0L; var sumSq = 0L
    var i = 0
    while (i < bytes.length) {
      val v = bytes(i) & 0xFF
      sum += v; sumSq += v.toLong * v
      i += 1
    }
    val n = bytes.length.toDouble
    val mean = sum / n
    val variance = sumSq / n - mean * mean
    Array(math.log1p(n).toFloat, mean.toFloat, variance.toFloat,
      (bytes(0) & 0xFF).toFloat, (bytes(bytes.length - 1) & 0xFF).toFloat)
  }

  /**
   * REAL image decode + resize + feature extraction (pure JDK):
   * bytes -> BufferedImage -> 8x8 bilinear thumbnail -> 64-dim luma vector
   * in [0,1], row-major. Returns None for undecodable bytes (corrupt file,
   * unknown format) — the caller keeps the row with null features rather
   * than failing the task, because at 100 TB some inputs ARE corrupt.
   */
  def decodeImage(bytes: Array[Byte]): Option[(Int, Int, Array[Float])] =
    try Option(ImageIO.read(new ByteArrayInputStream(bytes))).map { img =>
      val thumb = new BufferedImage(8, 8, BufferedImage.TYPE_INT_RGB)
      val g = thumb.createGraphics()
      g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
        java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
      g.drawImage(img, 0, 0, 8, 8, null)
      g.dispose()
      val feats = Array.tabulate(64) { i =>
        val rgb = thumb.getRGB(i % 8, i / 8)
        val r = (rgb >> 16) & 0xFF; val gr = (rgb >> 8) & 0xFF; val b = rgb & 0xFF
        ((0.299 * r + 0.587 * gr + 0.114 * b) / 255.0).toFloat
      }
      (img.getWidth, img.getHeight, feats)
    } catch { case _: Exception => None }

  /** Deterministic synthetic PNG (encoder is also pure JDK): a seed-derived
    * two-band gradient pattern. Used to materialize a real image corpus from
    * the testdata tables without any external files. */
  def syntheticPng(seed: Long, w: Int = 16, h: Int = 16): Array[Byte] = {
    def mix(z0: Long): Long = {
      var z = z0 + 0x9E3779B97F4A7C15L
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
      z ^ (z >>> 31)
    }
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    // pre-mix the seed: `seed ^ index` with adjacent small seeds would only
    // permute neighboring pixels, which box/bilinear downsampling is
    // invariant to — thumbnails of seed 0 and 1 would come out identical
    val base = mix(seed)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val v = mix(base ^ (y.toLong * w + x))
        img.setRGB(x, y, (v & 0xFFFFFF).toInt)
        x += 1
      }
      y += 1
    }
    val out = new ByteArrayOutputStream()
    ImageIO.write(img, "png", out)
    out.toByteArray
  }

  final case class AudioFeatures(doc_id: Long, sample_rate: Int, n_samples: Long,
      rms: Double, zero_cross_rate: Double)

  /**
   * REAL audio decode (pure JDK, javax.sound.sampled): WAV/PCM bytes ->
   * sample stream -> (sample rate, length, RMS level, zero-crossing rate).
   * ZCR is the classic cheap voiced/unvoiced + tone-frequency proxy; RMS is
   * the loudness gate used by data-curation filters. None for undecodable
   * bytes.
   */
  def decodeWav(bytes: Array[Byte]): Option[AudioFeatures] =
    try {
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new ByteArrayInputStream(bytes))
      try {
        val fmt = in.getFormat
        require(fmt.getSampleSizeInBits == 16, "PCM16 expected")
        val channels = fmt.getChannels
        require(channels >= 1, "channel count")
        val data = in.readAllBytes()
        // multichannel: frames are interleaved; features come from channel 0
        // (mixing L/R into one stream would corrupt the zero-crossing rate —
        // sign flips between uncorrelated channels converge to 0.5)
        val frameBytes = 2 * channels
        val n = data.length / frameBytes
        var i = 0
        var sumSq = 0.0
        var crossings = 0L
        var prev = 0
        val bigEndian = fmt.isBigEndian
        while (i < n) {
          val base = i * frameBytes
          val lo = data(base + (if (bigEndian) 1 else 0)) & 0xFF
          val hi = data(base + (if (bigEndian) 0 else 1))
          val s = (hi << 8) | lo
          sumSq += s.toDouble * s
          if (i > 0 && ((s ^ prev) < 0)) crossings += 1
          prev = s
          i += 1
        }
        Some(AudioFeatures(-1L, fmt.getSampleRate.toInt, n.toLong,
          math.sqrt(sumSq / math.max(1, n)) / 32768.0,
          crossings.toDouble / math.max(1, n - 1)))
      } finally in.close()
    } catch { case _: Exception => None }

  /** Deterministic synthetic PCM16 WAV: a seed-derived sine + noise mix. */
  def syntheticWav(seed: Long, sampleRate: Int = 8000, nSamples: Int = 2000): Array[Byte] = {
    def mix(z0: Long): Long = {
      var z = z0 + 0x9E3779B97F4A7C15L
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
      z ^ (z >>> 31)
    }
    val base = mix(seed)
    val freq = 100.0 + (base & 0xFF).toDouble * 4 // 100..1120 Hz
    val samples = new Array[Byte](nSamples * 2)
    var i = 0
    while (i < nSamples) {
      val noise = ((mix(base ^ i) >>> 40).toInt - (1 << 23)) / (1 << 23).toDouble
      val v = (0.6 * math.sin(2 * math.Pi * freq * i / sampleRate) + 0.1 * noise)
      val s = math.max(-32768, math.min(32767, (v * 32767).toInt)).toShort
      samples(2 * i) = (s & 0xFF).toByte
      samples(2 * i + 1) = ((s >> 8) & 0xFF).toByte
      i += 1
    }
    // RIFF/WAVE header written directly (canonical 44-byte PCM16-mono
    // little-endian header — byte-for-byte what AudioSystem.write emits for
    // this format). The synthesis side is test scaffolding; routing it
    // through AudioSystem.write serialized every task on javax.sound's
    // synchronized provider registry (JDK13Services.getProviders), capping
    // the whole query at single-task throughput. The DECODE side stays on
    // javax.sound — that is the operator under test — and reads the exact
    // same samples from this header.
    val dataLen = nSamples * 2
    val h = java.nio.ByteBuffer.allocate(44).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    h.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1.toShort)             // PCM
      .putShort(1.toShort)             // mono
      .putInt(sampleRate)
      .putInt(sampleRate * 2)          // byte rate
      .putShort(2.toShort)             // block align
      .putShort(16.toShort)            // bits per sample
      .put("data".getBytes("US-ASCII")).putInt(dataLen)
    val out = new Array[Byte](44 + dataLen)
    System.arraycopy(h.array(), 0, out, 0, 44)
    System.arraycopy(samples, 0, out, 44, dataLen)
    out
  }

  /** Batched WAV decode; undecodable rows carry -1 dimensions. */
  def extractAudioFeatures(media: Dataset[MediaRow]): Dataset[AudioFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.grouped(DecodeBatchSize).flatMap { batch =>
        batch.map { r =>
          decodeWav(r.media) match {
            case Some(f) => f.copy(doc_id = r.doc_id)
            case None => AudioFeatures(r.doc_id, -1, -1L, -1.0, -1.0)
          }
        }
      }
    }
  }

  final case class VideoFeatures(doc_id: Long, n_frames: Int, n_sampled: Int,
      mean_luma: Double, luma_trend: Double)

  /**
   * REAL video path: Motion-JPEG streams (concatenated JPEG frames — the
   * format IP cameras and .mjpeg files emit). Frames are delimited by a
   * proper JPEG SEGMENT WALK, not a byte scan: length-delimited marker
   * segments (APPn/DQT/SOF/...) are skipped by their declared length —
   * essential because APP1/EXIF payloads embed *nested JPEG thumbnails*
   * whose SOI/EOI are NOT entropy-escaped and would fool a naive scanner —
   * and entropy-coded data after SOS is scanned for the next true marker
   * (0xFF00 stuffing and RST0-7 skipped). Every k-th frame then decodes
   * through the SAME image kernel (`decodeImage`).
   */
  def splitMjpegFrames(bytes: Array[Byte]): Vector[Array[Byte]] = {
    val out = Vector.newBuilder[Array[Byte]]
    def u8(i: Int) = bytes(i) & 0xFF
    def segLen(i: Int) = ((u8(i) << 8) | u8(i + 1)) // includes its own 2 bytes
    var i = 0
    val n = bytes.length
    while (i + 3 < n) {
      // find next SOI
      if (u8(i) == 0xFF && u8(i + 1) == 0xD8) {
        val start = i
        var p = i + 2
        var end = -1
        var bad = false
        while (end < 0 && !bad && p + 1 < n) {
          if (u8(p) != 0xFF) { bad = true }
          else u8(p + 1) match {
            case 0xD9 => end = p + 2 // EOI
            case 0xDA => // SOS: skip header, then entropy data to next marker
              if (p + 3 >= n) bad = true
              else {
                p += 2 + segLen(p + 2)
                var done = false
                while (!done && p + 1 < n) {
                  if (u8(p) == 0xFF && u8(p + 1) != 0x00 &&
                      !(u8(p + 1) >= 0xD0 && u8(p + 1) <= 0xD7)) done = true
                  else p += 1
                }
                if (!done) bad = true
              }
            case 0xFF => p += 1 // fill byte before a marker
            case m if m == 0x01 || (m >= 0xD0 && m <= 0xD7) => p += 2 // bare markers
            case _ => // length-delimited segment (APPn, DQT, SOF, DHT, ...)
              if (p + 3 >= n) bad = true else p += 2 + segLen(p + 2)
          }
        }
        if (end > 0) {
          out += java.util.Arrays.copyOfRange(bytes, start, end)
          i = end
        } else i += 2 // corrupt frame: resync on the next SOI
      } else i += 1
    }
    out.result()
  }

  /** Sample every `everyK`-th frame, decode, aggregate per video:
    * frame count, sampled count, mean luma, and the luma slope across the
    * sampled frames (scene-brightness trend — a cheap shot-change proxy). */
  def extractVideoFeatures(media: Dataset[MediaRow], everyK: Int = 3): Dataset[VideoFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.grouped(DecodeBatchSize).flatMap { batch =>
        batch.map { r =>
          val frames = splitMjpegFrames(r.media)
          val sampled = frames.zipWithIndex.filter(_._2 % everyK == 0)
            .flatMap { case (f, idx) =>
              decodeImage(f).map { case (_, _, thumb) =>
                (idx, thumb.map(_.toDouble).sum / thumb.length) }
            }
          if (sampled.isEmpty) VideoFeatures(r.doc_id, frames.size, 0, -1.0, 0.0)
          else {
            val n = sampled.size
            val meanY = sampled.map(_._2).sum / n
            val meanX = sampled.map(_._1.toDouble).sum / n
            val cov = sampled.map { case (x, y) => (x - meanX) * (y - meanY) }.sum
            val varX = sampled.map { case (x, _) => (x - meanX) * (x - meanX) }.sum
            VideoFeatures(r.doc_id, frames.size, n, meanY,
              if (varX == 0) 0.0 else cov / varX)
          }
        }
      }
    }
  }

  /** Deterministic synthetic MJPEG: nFrames JPEG frames whose brightness
    * ramps with the frame index (so the sampled luma trend is known). */
  def syntheticMjpeg(seed: Long, nFrames: Int = 9, w: Int = 16, h: Int = 16): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    var f = 0
    while (f < nFrames) {
      val level = math.min(230, 40 + 20 * f + (seed % 7).toInt)
      val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
      val rgb = (level << 16) | (level << 8) | level
      var y = 0
      while (y < h) { var x = 0; while (x < w) { img.setRGB(x, y, rgb); x += 1 }; y += 1 }
      ImageIO.write(img, "jpg", out)
      f += 1
    }
    out.toByteArray
  }

  /** Partition-local batched decode: the mapPartitions plumbing is real. */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.grouped(DecodeBatchSize).flatMap { batch =>
        // a real kernel would decode `batch` in one device call
        batch.map(r => MediaFeatures(r.doc_id, r.media_type, r.media.length,
          decodeStub(r.media)))
      }
    }
  }

  /** Batched image decode: undecodable rows surface as null dimensions, not
    * task failures. */
  def extractImageFeatures(media: Dataset[MediaRow]): Dataset[ImageFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.grouped(DecodeBatchSize).flatMap { batch =>
        batch.map { r =>
          decodeImage(r.media) match {
            case Some((w, h, feats)) =>
              ImageFeatures(r.doc_id, w, h,
                feats.map(_.toDouble).sum / feats.length, feats)
            case None => ImageFeatures(r.doc_id, -1, -1, -1.0, Array.empty)
          }
        }
      }
    }
  }

  /** Spread the decode input across the cluster: the documents table is a
    * single small parquet file, so its scan is ONE partition — without this
    * every synth+decode below runs in a single task while the other cores
    * idle (guide §2.5 "input skew: repartition immediately after the read").
    * A decode is a pure per-row function, so placement cannot change any
    * result; the exchange moves only doc_ids / small payloads. */
  private def spread(s: SparkSession, df: DataFrame): DataFrame =
    df.repartition(s.sparkContext.defaultParallelism)

  /**
   * Driver-checkable query: documents' text bytes treated as opaque media
   * payloads -> batched feature extraction -> scalar projection.
   */
  def featureQuery(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val media = spread(s, s.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), lit("text/plain").as("media_type"),
        encode(col("text"), "utf-8").as("media")))
      .as[MediaRow]
    extractFeatures(media)
      .select(col("doc_id"), col("media_type"), col("n_bytes"),
        round(element_at(col("features"), 2).cast("double"), 3).as("mean_byte"))
  }

  /** Real image pipeline over a synthesized-on-executors PNG corpus: encode
    * (doc_id-seeded pattern) -> decode -> resize -> luma features. */
  def imageFeatureQuery(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val media = spread(s, s.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"))).as[Long]
      .map(id => MediaRow(id, "image/png", syntheticPng(id)))
    extractImageFeatures(media)
      .select(col("doc_id"), col("width"), col("height"),
        round(col("mean_luma"), 4).as("mean_luma"))
  }

  /** Real audio pipeline over synthesized-on-executors WAV corpus. */
  def audioFeatureQuery(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // decode parallelism capped low: javax.sound's getAudioInputStream runs
    // every call through a SYNCHRONIZED provider-registry lookup
    // (JDK13Services.getProviders), so wide fan-out convoys on one lock
    // (measured: 0.56 s at 4 tasks, 0.67 s at 32, 1.1 s single-task) — a
    // handful of tasks overlaps the real sample work between lock sections
    val media = s.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"))
      .repartition(math.min(4, s.sparkContext.defaultParallelism)).as[Long]
      .map(id => MediaRow(id, "audio/wav", syntheticWav(id)))
    extractAudioFeatures(media)
      .select(col("doc_id"), col("sample_rate"), col("n_samples"),
        round(col("rms"), 4).as("rms"),
        round(col("zero_cross_rate"), 4).as("zcr"))
  }

  /** Real video pipeline: MJPEG sample-every-3rd -> decode -> luma stats.
    * Corpus capped to 1-in-5 docs: the dominant cost of this query is
    * ENCODING the synthetic MJPEGs (9 JPEG writes per doc), which is test
    * scaffolding, not the operator under test. */
  def videoFeatureQuery(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val media = spread(s, s.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id")).filter(col("doc_id") % 5 === 0)).as[Long]
      .map(id => MediaRow(id, "video/x-motion-jpeg", syntheticMjpeg(id)))
    extractVideoFeatures(media, everyK = 3)
      .select(col("doc_id"), col("n_frames"), col("n_sampled"),
        round(col("mean_luma"), 4).as("mean_luma"),
        round(col("luma_trend"), 4).as("luma_trend"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_multimodal_features" -> ((s, dir) => featureQuery(s, dir)),
    // real decodes: no SQL oracle exists (DuckDB cannot decode PNG/WAV/MJPEG);
    // exact pixel/sample-level assertions live in OpsSpec
    "q_image_features" -> ((s, dir) => imageFeatureQuery(s, dir)),
    "q_audio_features" -> ((s, dir) => audioFeatureQuery(s, dir)),
    "q_video_frames" -> ((s, dir) => videoFeatureQuery(s, dir)))

  val oracles: Map[String, String] = Map.empty
}
