package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing for a training-data pipeline: media
  * payloads ride as opaque `binary` columns with a typed metadata
  * struct; decode / feature-extract run per-partition in batches.
  *
  * Decode is REAL where the JDK ships a codec: PNG/JPEG/GIF/BMP
  * through `javax.imageio` and WAV PCM through `javax.sound.sampled`
  * — pixels and samples are actually decoded executor-side and the
  * extracted features (dimensions, channel means, RMS, zero-crossing
  * rate) are asserted against planted ground truth in MultimodalSpec.
  * Formats with no JVM codec in this container (mp4/mkv/ogg video)
  * fall back to `decodeStub`, a deterministic byte-level feature
  * hash — the fallback is the documented stand-in, not the path.
  *
  * Scale notes: records are processed with mapPartitions so decoder
  * init (ImageIO cache config, codec contexts) amortizes across a
  * partition; payloads never pass through the driver; the output
  * schema is fixed-width so downstream ANN / dedup operators
  * (VectorOps) consume it directly.
  */
object Multimodal {

  case class MediaMeta(modality: String, width: Int, height: Int, sampleRateHz: Int)
  case class MediaRecord(id: Long, meta: MediaMeta, payload: Array[Byte])
  case class MediaFeatures(id: Long, modality: String, format: String, nBytes: Long,
                           checksum: Long, features: Array[Float])

  val FeatureDim = 8

  /** Deterministic byte-level fallback features: rolling FNV-1a over
    * payload bytes, folded into FeatureDim buckets. Used only for
    * formats with no JVM codec (mp4/mkv/ogg) or undecodable bytes —
    * decodable images and WAV take the real codec paths above.
    */
  def decodeStub(payload: Array[Byte]): Array[Float] = {
    val acc = new Array[Long](FeatureDim)
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < payload.length) {
      h = (h ^ (payload(i) & 0xffL)) * 0x100000001b3L
      acc(i % FeatureDim) += (h >>> 40)
      i += 1
    }
    val n = math.max(payload.length, 1)
    acc.map(v => (v.toDouble / n / (1L << 24)).toFloat)
  }

  // ---- real JDK codecs -------------------------------------------------------

  /** ImageIO's default encode path writes through a disk-backed cache
    * — pure memory streams are both faster and safe under executor
    * thread pools. Set once per JVM.
    */
  private lazy val imageIoInit: Unit = javax.imageio.ImageIO.setUseCache(false)

  final case class ImageInfo(width: Int, height: Int,
                             meanR: Double, meanG: Double, meanB: Double)
  final case class AudioInfo(sampleRateHz: Int, nFrames: Long,
                             rms: Double, zeroCrossRate: Double)

  /** Real image decode (PNG/JPEG/GIF/BMP — the JDK's ImageIO codecs):
    * dimensions from the decoded raster, per-channel means over every
    * pixel. None when no installed codec accepts the bytes.
    */
  def decodeImage(payload: Array[Byte]): Option[ImageInfo] = {
    imageIoInit
    if (payload.isEmpty) return None
    try {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
      if (img == null) None
      else {
        var r, g, b = 0L
        var y = 0
        while (y < img.getHeight) {
          var x = 0
          while (x < img.getWidth) {
            val p = img.getRGB(x, y)
            r += (p >> 16) & 0xff; g += (p >> 8) & 0xff; b += p & 0xff
            x += 1
          }
          y += 1
        }
        val n = img.getWidth.toLong * img.getHeight
        Some(ImageInfo(img.getWidth, img.getHeight,
          r.toDouble / n, g.toDouble / n, b.toDouble / n))
      }
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** Real WAV decode (javax.sound.sampled): sample rate and frame
    * count from the header, RMS and zero-crossing rate from the
    * decoded 16-bit PCM samples. None for non-PCM or non-WAV bytes.
    */
  def decodeWav(payload: Array[Byte]): Option[AudioInfo] = {
    if (payload.isEmpty) return None
    try {
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(payload))
      try {
        val fmt = ais.getFormat
        if (fmt.getSampleSizeInBits != 16) return None
        val bytes = ais.readAllBytes()
        val le = !fmt.isBigEndian
        var sumSq = 0.0; var zc = 0L; var prevNeg = false; var n = 0
        var i = 0
        while (i + 1 < bytes.length) {
          val s = (if (le) ((bytes(i + 1) << 8) | (bytes(i) & 0xff))
                   else ((bytes(i) << 8) | (bytes(i + 1) & 0xff))).toShort
          sumSq += s.toDouble * s
          val neg = s < 0
          if (n > 0 && neg != prevNeg) zc += 1
          prevNeg = neg; n += 1
          i += 2 * fmt.getChannels            // first channel only
        }
        if (n == 0) None
        else Some(AudioInfo(fmt.getSampleRate.toInt, ais.getFrameLength,
          math.sqrt(sumSq / n) / 32768.0, zc.toDouble / n))
      } finally ais.close()
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** Deterministic PNG payload: pixels from a splitmix-style LCG of
    * (seed, x, y) — real encoded bytes for the ingest side of the
    * pipeline (this container has no media files; production replaces
    * this generator with blob-store reads, nothing downstream cares).
    */
  def encodePng(width: Int, height: Int, seed: Long): Array[Byte] = {
    imageIoInit
    val img = new java.awt.image.BufferedImage(
      width, height, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        var z = seed + x * 0x9e3779b97f4a7c15L + y * 0xc2b2ae3d27d4eb4fL
        z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
        z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
        img.setRGB(x, y, ((z ^ (z >>> 31)) & 0xffffff).toInt)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Deterministic 16 kHz mono 16-bit WAV payload: a seed-pitched sine
    * with LCG dither (same role as [[encodePng]]).
    */
  def encodeWav(nFrames: Int, seed: Long, sampleRateHz: Int = 16000): Array[Byte] = {
    val pcm = new Array[Byte](nFrames * 2)
    val freq = 100.0 + (java.lang.Long.remainderUnsigned(seed, 800L)).toDouble
    var i = 0
    while (i < nFrames) {
      var z = seed + i * 0x9e3779b97f4a7c15L
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      val s = (math.sin(2 * math.Pi * freq * i / sampleRateHz) * 12000 +
        (z % 512)).toInt.max(-32768).min(32767).toShort
      pcm(2 * i) = s.toByte; pcm(2 * i + 1) = (s >> 8).toByte
      i += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(sampleRateHz.toFloat, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, nFrames.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** Real nearest-neighbor image resize: decode, sample the source
    * raster at exact NN coordinates (manual loop — deterministic,
    * unlike interpolating Graphics2D hints), re-encode as PNG. None
    * when the payload isn't a decodable image.
    */
  def resizeImage(payload: Array[Byte], targetW: Int, targetH: Int): Option[Array[Byte]] = {
    imageIoInit
    if (payload.isEmpty) return None
    try {
      val src = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
      if (src == null) return None
      val out = new java.awt.image.BufferedImage(
        targetW, targetH, java.awt.image.BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < targetH) {
        val srcY = y * src.getHeight / targetH
        var x = 0
        while (x < targetW) {
          out.setRGB(x, y, src.getRGB(x * src.getWidth / targetW, srcY))
          x += 1
        }
        y += 1
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(out, "png", bos)
      Some(bos.toByteArray)
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** Container-format detection from magic bytes — needs no codec:
    * pure byte inspection, the first step of any ingest pipeline
    * routing blobs to per-format decoders (ref treats media as opaque
    * blobs; format sniffing follows the published magic numbers of
    * each container).
    */
  def sniffFormat(payload: Array[Byte]): String = {
    def at(i: Int, bs: Int*): Boolean =
      payload.length >= i + bs.length &&
        bs.indices.forall(j => (payload(i + j) & 0xff) == bs(j))
    if (at(0, 0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a)) "png"
    else if (at(0, 0xff, 0xd8, 0xff)) "jpeg"
    else if (at(0, 'G', 'I', 'F', '8')) "gif"
    else if (at(0, 'B', 'M')) "bmp"
    else if (at(0, 'R', 'I', 'F', 'F') && at(8, 'W', 'A', 'V', 'E')) "wav"
    else if (at(0, 'R', 'I', 'F', 'F') && at(8, 'A', 'V', 'I', ' ')) "avi"
    else if (at(4, 'f', 't', 'y', 'p')) "mp4"
    else if (at(0, 'O', 'g', 'g', 'S')) "ogg"
    else if (at(0, 'I', 'D', '3') || at(0, 0xff, 0xfb)) "mp3"
    else if (at(0, 0x1a, 0x45, 0xdf, 0xa3)) "mkv"
    else "unknown"
  }

  def checksum(payload: Array[Byte]): Long = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < payload.length) {
      h = (h ^ (payload(i) & 0xffL)) * 0x100000001b3L
      i += 1
    }
    h
  }

  /** One media record per document id: REAL encoded payloads — PNG
    * pixels and WAV PCM produced by the JDK codecs, deterministic per
    * id (the container has no media files; production replaces this
    * generator with blob-store reads, nothing downstream cares).
    * Video has no JVM codec, so those payloads are mp4-magic synthetic
    * bytes — the one modality whose decode stays stubbed. Payloads are
    * generated executor-side in mapPartitions: nothing media-sized
    * ever crosses the driver.
    */
  def asMediaRecords(spark: SparkSession, dir: String): Dataset[MediaRecord] = {
    import spark.implicits._
    spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id")).as[Long]
      .mapPartitions { it =>
        it.map { id =>
          (id % 3) match {
            case 0 =>
              val w = 16 + (id % 8).toInt * 8
              val h = 16 + (id % 5).toInt * 8
              MediaRecord(id, MediaMeta("image", w, h, 0), encodePng(w, h, id))
            case 1 =>
              val n = 800 + (id % 10).toInt * 80
              MediaRecord(id, MediaMeta("audio", 0, 0, 16000), encodeWav(n, id))
            case _ =>
              val body = new Array[Byte](256 + (id % 7).toInt * 64)
              var i = 0
              while (i < body.length) {
                var z = id + i * 0x9e3779b97f4a7c15L
                z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
                body(i) = z.toByte
                i += 1
              }
              MediaRecord(id, MediaMeta("video", 32, 32, 0),
                Array[Byte](0, 0, 0, 0x20) ++ "ftypisom".getBytes ++ body)
          }
        }
      }
  }

  /** Partition-parallel batch feature extraction (the `mapInPandas`
    * analogue in Scala: one iterator per partition, decoder state
    * initialized once per partition). Bytes are routed by sniffed
    * container format to the matching REAL decoder; only formats with
    * no JVM codec (or undecodable bytes) fall back to the stub's
    * byte-level features. Feature layout (FeatureDim = 8):
    *   image: [w, h, meanR/255, meanG/255, meanB/255, 0, 0, 1]
    *   audio: [rateHz, frames, rms, zeroCrossRate, 0, 0, 0, 2]
    *   other: decodeStub byte-hash features
    */
  def extractFeatures(records: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import records.sparkSession.implicits._
    records.mapPartitions { it =>
      imageIoInit                      // per-partition decoder init
      it.map { r =>
        val fmt = sniffFormat(r.payload)
        val feats = fmt match {
          case "png" | "jpeg" | "gif" | "bmp" =>
            decodeImage(r.payload).map(im => Array(
              im.width.toFloat, im.height.toFloat, (im.meanR / 255).toFloat,
              (im.meanG / 255).toFloat, (im.meanB / 255).toFloat, 0f, 0f, 1f))
              .getOrElse(decodeStub(r.payload))
          case "wav" =>
            decodeWav(r.payload).map(a => Array(
              a.sampleRateHz.toFloat, a.nFrames.toFloat, a.rms.toFloat,
              a.zeroCrossRate.toFloat, 0f, 0f, 0f, 2f))
              .getOrElse(decodeStub(r.payload))
          case _ => decodeStub(r.payload)
        }
        MediaFeatures(r.id, r.meta.modality, fmt,
          r.payload.length.toLong, checksum(r.payload), feats)
      }
    }
  }

  case class MediaFrame(id: Long, frameIdx: Int, nBytes: Int, frameChecksum: Long)

  /** Nearest-neighbor "resize" of a payload interpreted as a
    * width×height row-major byte raster — a real decoder would resize
    * pixels here; the sampling arithmetic, metadata rewrite, and
    * per-partition batch shape are the production plumbing.
    */
  def resizeStub(payload: Array[Byte], w: Int, h: Int,
                 targetW: Int, targetH: Int): Array[Byte] = {
    if (payload.isEmpty || w <= 0 || h <= 0) return Array.emptyByteArray
    val out = new Array[Byte](targetW * targetH)
    var y = 0
    while (y < targetH) {
      val srcY = y * h / targetH
      var x = 0
      while (x < targetW) {
        val srcX = x * w / targetW
        val idx = (srcY.toLong * w + srcX) % payload.length
        out(y * targetW + x) = payload(idx.toInt)
        x += 1
      }
      y += 1
    }
    out
  }

  /** Resize every record to a fixed thumbnail; metadata follows.
    * Decodable images go through the real pixel resize ([[resizeImage]],
    * NN-sampled and re-encoded); everything else falls back to the
    * raster-arithmetic stub.
    */
  def resizeAll(records: Dataset[MediaRecord], targetW: Int, targetH: Int): Dataset[MediaRecord] = {
    import records.sparkSession.implicits._
    records.mapPartitions { it =>
      imageIoInit
      it.map { r =>
        val resized = resizeImage(r.payload, targetW, targetH).getOrElse(
          resizeStub(r.payload, math.max(r.meta.width, 1),
            math.max(r.meta.height, 1), targetW, targetH))
        MediaRecord(r.id, r.meta.copy(width = targetW, height = targetH), resized)
      }
    }
  }

  /** Frame sampling: treat the payload as consecutive `frameBytes`
    * frames and keep every `everyN`-th — the row-explosion shape of a
    * video keyframe extractor (one input row → many frame rows),
    * partition-parallel, payloads never on the driver.
    */
  def sampleFrames(records: Dataset[MediaRecord], frameBytes: Int = 64,
                   everyN: Int = 4): Dataset[MediaFrame] = {
    import records.sparkSession.implicits._
    records.flatMap { r =>
      val nFrames = (r.payload.length + frameBytes - 1) / frameBytes
      (0 until nFrames).by(everyN).map { f =>
        val frame = r.payload.slice(f * frameBytes,
          math.min((f + 1) * frameBytes, r.payload.length))
        MediaFrame(r.id, f, frame.length, checksum(frame))
      }
    }
  }

  /** Declared frame-sampling query: scalar columns only (rows-only check). */
  def framesPipeline(spark: SparkSession, dir: String): DataFrame =
    sampleFrames(asMediaRecords(spark, dir))
      .toDF()
      .select(col("id"), col("frameIdx").as("frame_idx"),
        col("nBytes").as("n_bytes"), col("frameChecksum").as("frame_checksum"))
      .orderBy(col("id"), col("frame_idx"))

  /** Feature vectors with full arrays — internal / downstream-ANN use. */
  def featureFrame(spark: SparkSession, dir: String): DataFrame =
    extractFeatures(asMediaRecords(spark, dir))
      .toDF()
      .select(col("id"), col("modality"), col("format"),
        col("nBytes").as("n_bytes"), col("checksum"), col("features"))

  /** Declared pipeline output (SparkEntry/Verify): scalar columns only —
    * the raw array<float> is folded to a single hash so the result is
    * sortable/hashable by any downstream tool; the array variant stays
    * available via [[featureFrame]].
    */
  def pipeline(spark: SparkSession, dir: String): DataFrame =
    featureFrame(spark, dir)
      .withColumn("feat_hash",
        xxhash64(concat_ws(",", col("features").cast("array<string>"))))
      .drop("features")
      .orderBy(col("id"))
}
