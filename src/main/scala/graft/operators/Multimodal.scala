package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing for a training-data pipeline: media
  * payloads ride as opaque `binary` columns with a typed metadata
  * struct; decode / feature-extract run per-partition in batches.
  *
  * The actual media decode is STUBBED (image/audio codecs are not in
  * this container): `decodeStub` produces a deterministic fake
  * "decoded frame" from the payload bytes. Everything around it —
  * schema, partition-parallel batch iteration, fixed-width feature
  * output — is the real Spark plumbing a codec-backed decoder would
  * drop into.
  *
  * Scale notes: records are processed with mapPartitions so a real
  * decoder can amortize per-batch init (model load, codec context)
  * across a partition; payloads never pass through the driver; the
  * output schema is fixed-width so downstream ANN / dedup operators
  * (VectorOps) consume it directly.
  */
object Multimodal {

  case class MediaMeta(modality: String, width: Int, height: Int, sampleRateHz: Int)
  case class MediaRecord(id: Long, meta: MediaMeta, payload: Array[Byte])
  case class MediaFeatures(id: Long, modality: String, format: String, nBytes: Long,
                           checksum: Long, features: Array[Float])

  val FeatureDim = 8

  /** Deterministic fake decode: rolling FNV-1a over payload bytes,
    * folded into FeatureDim buckets. A real implementation would
    * decode pixels/samples here — same signature, same batch shape.
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

  /** Container-format detection from magic bytes — the one part of
    * media handling that needs NO codec, so unlike decode it is real,
    * not stubbed: pure byte inspection, the first step of any ingest
    * pipeline routing blobs to per-format decoders (ref treats media
    * as opaque blobs; format sniffing follows the published magic
    * numbers of each container).
    */
  def sniffFormat(payload: Array[Byte]): String = {
    def at(i: Int, bs: Int*): Boolean =
      payload.length >= i + bs.length &&
        bs.indices.forall(j => (payload(i + j) & 0xff) == bs(j))
    if (at(0, 0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a)) "png"
    else if (at(0, 0xff, 0xd8, 0xff)) "jpeg"
    else if (at(0, 'G', 'I', 'F', '8')) "gif"
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

  /** Attach a media payload + metadata to the documents table (the
    * container has no real media files; text bytes stand in for the
    * payload, which is exactly how an opaque blob column behaves).
    */
  def asMediaRecords(spark: SparkSession, dir: String): Dataset[MediaRecord] = {
    import spark.implicits._
    spark.read.parquet(s"$dir/documents.parquet")
      .selectExpr(
        "doc_id AS id",
        "named_struct('modality', IF(doc_id % 3 = 0, 'image', IF(doc_id % 3 = 1, 'audio', 'video'))," +
          " 'width', CAST(64 + (doc_id % 8) * 32 AS INT)," +
          " 'height', CAST(64 + (doc_id % 5) * 32 AS INT)," +
          " 'sampleRateHz', CAST(IF(doc_id % 3 = 1, 16000, 0) AS INT)) AS meta",
        "CAST(text AS BINARY) AS payload")
      .as[MediaRecord]
  }

  /** Partition-parallel batch feature extraction (the `mapInPandas`
    * analogue in Scala: one iterator per partition, decoder state
    * initialized once per partition).
    */
  def extractFeatures(records: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import records.sparkSession.implicits._
    records.mapPartitions { it =>
      // per-partition init point for a real decoder/codec context
      it.map { r =>
        MediaFeatures(r.id, r.meta.modality, sniffFormat(r.payload),
          r.payload.length.toLong, checksum(r.payload), decodeStub(r.payload))
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

  /** Resize every record to a fixed thumbnail; metadata follows. */
  def resizeAll(records: Dataset[MediaRecord], targetW: Int, targetH: Int): Dataset[MediaRecord] = {
    import records.sparkSession.implicits._
    records.mapPartitions { it =>
      it.map { r =>
        val resized = resizeStub(r.payload, math.max(r.meta.width, 1),
          math.max(r.meta.height, 1), targetW, targetH)
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
