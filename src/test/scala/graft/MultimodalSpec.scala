package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Multimodal

/** Multimodal plumbing: deterministic decode/checksum, resize
  * sampling arithmetic, frame explosion shape, and the declared
  * pipelines' scalar-only schemas.
  */
class MultimodalSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val sfDir = "/root/testdata/sf0.001"

  test("decodeStub and checksum are deterministic and fixed-width") {
    val p = "hello multimodal world".getBytes("UTF-8")
    val f1 = Multimodal.decodeStub(p)
    val f2 = Multimodal.decodeStub(p)
    assert(f1.toSeq == f2.toSeq && f1.length == Multimodal.FeatureDim)
    assert(Multimodal.checksum(p) == Multimodal.checksum(p))
    assert(Multimodal.checksum(p) != Multimodal.checksum(p.reverse))
  }

  test("resizeStub resamples to the target raster size") {
    val src = Array.tabulate[Byte](64 * 32)(i => (i % 127).toByte)
    val out = Multimodal.resizeStub(src, 64, 32, 16, 8)
    assert(out.length == 16 * 8)
    // corner pixels map to corner sources (nearest-neighbor)
    assert(out(0) == src(0))
    assert(Multimodal.resizeStub(Array.emptyByteArray, 4, 4, 2, 2).isEmpty)
  }

  test("resizeAll rewrites payloads and metadata partition-parallel") {
    assume(java.nio.file.Files.exists(java.nio.file.Paths.get(sfDir)))
    val recs = Multimodal.asMediaRecords(spark, sfDir)
    val resized = Multimodal.resizeAll(recs, 32, 32).collect()
    assert(resized.nonEmpty)
    assert(resized.forall(r => r.meta.width == 32 && r.meta.height == 32))
    // images went through the real pixel resize: the thumbnail is a
    // decodable PNG of exactly the target dimensions
    val images = resized.filter(_.meta.modality == "image")
    assert(images.nonEmpty)
    images.foreach { r =>
      val info = Multimodal.decodeImage(r.payload)
      assert(info.exists(i => i.width == 32 && i.height == 32))
    }
    // videos went through the real per-frame resize: still a decodable
    // MJPEG stream, same frame count, every frame at target dims
    val videos = resized.filter(_.meta.modality == "video")
    assert(videos.nonEmpty)
    videos.take(5).foreach { r =>
      val v = Multimodal.decodeMjpeg(r.payload)
      assert(v.exists(i => i.width == 32 && i.height == 32 &&
        i.nFrames == 3 + (r.id % 4).toInt), s"id=${r.id}: $v")
    }
    // audio payloads took the raster-arithmetic fallback
    assert(resized.filter(_.meta.modality == "audio")
      .forall(_.payload.length == 32 * 32))
  }

  test("sampleFrames explodes records into every-Nth frame rows") {
    assume(java.nio.file.Files.exists(java.nio.file.Paths.get(sfDir)))
    val recs = Multimodal.asMediaRecords(spark, sfDir)
    val one = recs.head()
    val oneId = one.id
    val frames = Multimodal.sampleFrames(recs, frameBytes = 64, everyN = 4)
      .filter(_.id == oneId).collect().sortBy(_.frameIdx)
    val nFrames = (one.payload.length + 63) / 64
    val expected = (0 until nFrames).by(4).size
    assert(frames.length == expected)
    assert(frames.forall(f => f.frameIdx % 4 == 0))
    // frame checksum matches recomputation from the payload slice
    val f0 = frames.head
    val slice = one.payload.slice(0, math.min(64, one.payload.length))
    assert(f0.frameChecksum == Multimodal.checksum(slice))
  }

  // ---- planted-payload ground truth (VERDICT r4 #7) ------------------------
  // Constructed records with fully-known bytes; every extracted value is
  // asserted against independently-computed truth, not just shape.

  private def planted(id: Long, modality: String, payload: Array[Byte]) =
    Multimodal.MediaRecord(id,
      Multimodal.MediaMeta(modality, 16, 16, 0), payload)

  test("sniffFormat detects planted magic bytes exactly") {
    def bytes(bs: Int*): Array[Byte] = bs.map(_.toByte).toArray
    val png = bytes(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a) ++
      Array.fill[Byte](64)(7)
    val jpeg = bytes(0xff, 0xd8, 0xff, 0xe0) ++ Array.fill[Byte](16)(1)
    val wav = "RIFF".getBytes ++ bytes(0x24, 0, 0, 0) ++ "WAVEfmt ".getBytes
    val avi = "RIFF".getBytes ++ bytes(0, 0, 0, 0) ++ "AVI LIST".getBytes
    val mp4 = bytes(0, 0, 0, 0x20) ++ "ftypisom".getBytes
    assert(Multimodal.sniffFormat(png) == "png")
    assert(Multimodal.sniffFormat(jpeg) == "jpeg")
    assert(Multimodal.sniffFormat(wav) == "wav")
    assert(Multimodal.sniffFormat(avi) == "avi")
    assert(Multimodal.sniffFormat(mp4) == "mp4")
    assert(Multimodal.sniffFormat("GIF89a".getBytes) == "gif")
    assert(Multimodal.sniffFormat(("OggS".getBytes :+ 0.toByte)) == "ogg")
    assert(Multimodal.sniffFormat(bytes(0x1a, 0x45, 0xdf, 0xa3)) == "mkv")
    assert(Multimodal.sniffFormat("plain text".getBytes) == "unknown")
    assert(Multimodal.sniffFormat(bytes(0xff)) == "unknown")   // truncated jpeg magic
    assert(Multimodal.sniffFormat(Array.emptyByteArray) == "unknown")
  }

  test("a still whose EXIF metadata embeds a thumbnail JPEG is not mjpeg (ADVICE r9)") {
    def bytes(bs: Int*): Array[Byte] = bs.map(_.toByte).toArray
    // embedded thumbnail: a complete JPEG (own SOI..EOI) INSIDE an
    // APP1 payload, followed by more metadata bytes starting FFD8 —
    // the flat first-EOI scan used to read this as a frame boundary
    val thumb = bytes(0xff, 0xd8, 0xff, 0xd9, 0xff, 0xd8, 0xff, 0xe0, 1, 2, 3)
    val app1Len = 2 + thumb.length // length field counts itself
    val still = bytes(0xff, 0xd8,                       // SOI
        0xff, 0xe1, app1Len >> 8, app1Len & 0xff) ++    // APP1 w/ length
      thumb ++
      bytes(0xff, 0xda, 0, 4, 0, 0,                     // SOS hdr, then entropy
        0x12, 0x34, 0xff, 0x00, 0x56,                   //   incl. stuffed FF00
        0xff, 0xd9)                                     // EOI
    assert(Multimodal.sniffFormat(still) == "jpeg",
      "segment walk must skip APP1 payloads, not scan them for EOI")
    // and a REAL concatenation of two such stills IS mjpeg
    assert(Multimodal.sniffFormat(still ++ still) == "mjpeg")
    assert(Multimodal.splitMjpegFrames(still ++ still).size == 2)
  }

  test("extractFeatures reproduces driver-side truth for planted payloads") {
    import spark.implicits._
    val png = Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a) ++
      Array.tabulate[Byte](100)(i => (i * 3).toByte)
    val recs = Seq(
      planted(1L, "image", png),
      planted(2L, "audio", "RIFF0000WAVEdata".getBytes),
      planted(3L, "video", Array.tabulate[Byte](257)(i => (i % 31).toByte)),
      planted(4L, "image", Array.emptyByteArray))
    val out = Multimodal.extractFeatures(spark.createDataset(recs))
      .collect().map(f => f.id -> f).toMap
    assert(out.keySet == Set(1L, 2L, 3L, 4L))
    recs.foreach { r =>
      val f = out(r.id)
      assert(f.modality == r.meta.modality)
      assert(f.format == Multimodal.sniffFormat(r.payload))
      assert(f.nBytes == r.payload.length.toLong)
      assert(f.checksum == Multimodal.checksum(r.payload))
      assert(f.features.toSeq == Multimodal.decodeStub(r.payload).toSeq)
    }
    assert(out(1L).format == "png" && out(2L).format == "wav"
      && out(3L).format == "unknown")
  }

  // ---- real-codec ground truth ---------------------------------------------
  // The JDK ships actual codecs (javax.imageio for PNG/JPEG/GIF/BMP,
  // javax.sound.sampled for WAV): these gates plant payloads with
  // fully-known pixels/samples and assert the DECODED values — real
  // media decode, not plumbing shape.

  test("planted PNG decodes to exact dimensions and channel means") {
    import spark.implicits._
    // hand-built 2x2 image with known RGB corners
    val img = new java.awt.image.BufferedImage(2, 2, java.awt.image.BufferedImage.TYPE_INT_RGB)
    img.setRGB(0, 0, 0xff0000); img.setRGB(1, 0, 0x00ff00)
    img.setRGB(0, 1, 0x0000ff); img.setRGB(1, 1, 0xffffff)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val png = bos.toByteArray
    assert(Multimodal.sniffFormat(png) == "png")

    // driver-side decode truth: PNG is lossless, means are exact
    val info = Multimodal.decodeImage(png).get
    assert(info.width == 2 && info.height == 2)
    assert(info.meanR == (255.0 + 0 + 0 + 255) / 4)
    assert(info.meanG == (0.0 + 255 + 0 + 255) / 4)
    assert(info.meanB == (0.0 + 0 + 255 + 255) / 4)

    // the executor-side pipeline extracts the same decoded values
    val f = Multimodal.extractFeatures(
      spark.createDataset(Seq(planted(21L, "image", png)))).collect().head
    assert(f.format == "png")
    assert(f.features.toSeq == Seq(2f, 2f, (info.meanR / 255).toFloat,
      (info.meanG / 255).toFloat, (info.meanB / 255).toFloat, 0f, 0f, 1f))
  }

  test("planted WAV decodes to exact rate, frames, and sample stats") {
    import spark.implicits._
    val wav = Multimodal.encodeWav(nFrames = 1600, seed = 42L)
    assert(Multimodal.sniffFormat(wav) == "wav")
    val a = Multimodal.decodeWav(wav).get
    assert(a.sampleRateHz == 16000 && a.nFrames == 1600L)
    // RMS of a ~12000-amplitude sine ≈ 12000/√2/32768 ≈ 0.259
    assert(a.rms > 0.2 && a.rms < 0.32, s"rms=${a.rms}")
    assert(a.zeroCrossRate > 0.0 && a.zeroCrossRate < 0.5)

    val f = Multimodal.extractFeatures(
      spark.createDataset(Seq(planted(22L, "audio", wav)))).collect().head
    assert(f.format == "wav")
    assert(f.features.toSeq == Seq(16000f, 1600f, a.rms.toFloat,
      a.zeroCrossRate.toFloat, 0f, 0f, 0f, 2f))
  }

  test("real image resize samples exact nearest-neighbor pixels") {
    // 2x2 known colors -> 4x4: each source pixel becomes a 2x2 block
    val img = new java.awt.image.BufferedImage(2, 2, java.awt.image.BufferedImage.TYPE_INT_RGB)
    img.setRGB(0, 0, 0x112233); img.setRGB(1, 0, 0x445566)
    img.setRGB(0, 1, 0x778899); img.setRGB(1, 1, 0xaabbcc)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val up = Multimodal.resizeImage(bos.toByteArray, 4, 4).get
    val back = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(up))
    assert(back.getWidth == 4 && back.getHeight == 4)
    for (y <- 0 until 4; x <- 0 until 4) {
      val expected = img.getRGB(x / 2, y / 2)
      assert((back.getRGB(x, y) & 0xffffff) == (expected & 0xffffff),
        s"pixel ($x,$y)")
    }
    // non-image bytes: no silent garbage, caller falls back explicitly
    assert(Multimodal.resizeImage("not an image".getBytes, 4, 4).isEmpty)
  }

  test("BMP and GIF decode exactly; JPEG decodes dimensions with lossy pixels") {
    import spark.implicits._
    val img = new java.awt.image.BufferedImage(6, 4, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 4; x <- 0 until 6) img.setRGB(x, y, 0x406080)
    def enc(fmt: String): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(img, fmt, bos), s"no $fmt writer")
      bos.toByteArray
    }
    val bmp = enc("bmp"); val gif = enc("gif"); val jpg = enc("jpg")
    assert(Multimodal.sniffFormat(bmp) == "bmp")
    assert(Multimodal.sniffFormat(gif) == "gif")
    assert(Multimodal.sniffFormat(jpg) == "jpeg")
    // lossless containers reproduce the flat fill exactly
    for (p <- Seq(bmp, gif)) {
      val i = Multimodal.decodeImage(p).get
      assert(i.width == 6 && i.height == 4)
      assert(i.meanR == 0x40.toDouble && i.meanG == 0x60.toDouble && i.meanB == 0x80.toDouble)
    }
    // JPEG: exact dimensions, channel means within lossy tolerance
    val j = Multimodal.decodeImage(jpg).get
    assert(j.width == 6 && j.height == 4)
    assert(math.abs(j.meanR - 0x40) < 8 && math.abs(j.meanG - 0x60) < 8 &&
      math.abs(j.meanB - 0x80) < 8, j)
    // all three route through the image decoder in the pipeline
    val out = Multimodal.extractFeatures(spark.createDataset(Seq(
        planted(31L, "image", bmp), planted(32L, "image", gif),
        planted(33L, "image", jpg))))
      .collect().sortBy(_.id)
    assert(out.map(_.format).toSeq == Seq("bmp", "gif", "jpeg"))
    assert(out.forall(f => f.features(0) == 6f && f.features(1) == 4f && f.features(7) == 1f))
  }

  test("generated corpus payloads are real decodable media per modality") {
    assume(java.nio.file.Files.exists(java.nio.file.Paths.get(sfDir)))
    val byMod = Multimodal.asMediaRecords(spark, sfDir).collect()
      .groupBy(_.meta.modality)
    byMod("image").take(5).foreach { r =>
      assert(Multimodal.sniffFormat(r.payload) == "png")
      val i = Multimodal.decodeImage(r.payload).get
      assert(i.width == r.meta.width && i.height == r.meta.height,
        s"id=${r.id}: decoded ${i.width}x${i.height} vs meta ${r.meta.width}x${r.meta.height}")
    }
    byMod("audio").take(5).foreach { r =>
      assert(Multimodal.sniffFormat(r.payload) == "wav")
      val a = Multimodal.decodeWav(r.payload).get
      assert(a.sampleRateHz == r.meta.sampleRateHz)
      assert(a.nFrames == 800L + (r.id % 10) * 80)
    }
    byMod("video").take(5).foreach { r =>
      assert(Multimodal.sniffFormat(r.payload) == "mjpeg")
      val v = Multimodal.decodeMjpeg(r.payload).get
      assert(v.width == r.meta.width && v.height == r.meta.height,
        s"id=${r.id}: decoded ${v.width}x${v.height} vs meta ${r.meta.width}x${r.meta.height}")
      assert(v.nFrames == 3 + (r.id % 4).toInt, s"id=${r.id}: ${v.nFrames} frames")
    }
  }

  test("planted MJPEG decodes every frame to exact dimensions and count") {
    import spark.implicits._
    val mj = Multimodal.encodeMjpeg(width = 24, height = 16, nFrames = 4, seed = 99L)
    assert(Multimodal.sniffFormat(mj) == "mjpeg")
    val frames = Multimodal.splitMjpegFrames(mj)
    assert(frames.size == 4)
    frames.foreach { f =>
      assert(Multimodal.sniffFormat(f) == "jpeg")           // each frame is one still
      val i = Multimodal.decodeImage(f).get
      assert(i.width == 24 && i.height == 16)
    }
    val v = Multimodal.decodeMjpeg(mj).get
    assert(v.width == 24 && v.height == 16 && v.nFrames == 4)
    assert(v.meanLuma > 0.0 && v.meanLuma < 1.0, s"luma=${v.meanLuma}")
    // executor-side feature route: [w, h, nFrames, meanLuma, 0,0,0, 3]
    val f = Multimodal.extractFeatures(
      spark.createDataset(Seq(planted(23L, "video", mj)))).collect().head
    assert(f.format == "mjpeg")
    assert(f.features.toSeq == Seq(24f, 16f, 4f, v.meanLuma.toFloat, 0f, 0f, 0f, 3f))
    // frame-explode: one row per decoded frame, raster dims attached
    val vf = Multimodal.sampleVideoFrames(
      spark.createDataset(Seq(planted(23L, "video", mj),
        planted(24L, "image", Array.emptyByteArray))))       // non-video: no rows
      .collect().sortBy(_.frameIdx)
    assert(vf.toSeq == (0 until 4).map(i => Multimodal.VideoFrame(23L, i, 24, 16)))
  }

  test("sampleFrames yields exactly the planted frame table") {
    import spark.implicits._
    val p = Array.tabulate[Byte](300)(i => (i % 101).toByte)   // 5 frames of 64B (last 44B)
    val recs = spark.createDataset(Seq(planted(9L, "video", p),
      planted(10L, "video", Array.emptyByteArray)))            // 0 frames
    val got = Multimodal.sampleFrames(recs, frameBytes = 64, everyN = 2)
      .collect().sortBy(f => (f.id, f.frameIdx))
    val expected = Seq(0, 2, 4).map { idx =>
      val slice = p.slice(idx * 64, math.min((idx + 1) * 64, p.length))
      Multimodal.MediaFrame(9L, idx, slice.length, Multimodal.checksum(slice))
    }
    assert(got.toSeq == expected)                              // 44-byte tail included
    assert(expected.last.nBytes == 44)
  }

  test("resizeStub picks exact nearest-neighbor sources on a planted raster") {
    val src = Array.tabulate[Byte](16)(_.toByte)               // 4x4 row-major
    val out = Multimodal.resizeStub(src, 4, 4, 2, 2)
    // srcY = y*4/2 in {0,2}, srcX = x*4/2 in {0,2} -> indices 0,2,8,10
    assert(out.toSeq == Seq[Byte](0, 2, 8, 10))
  }

  test("declared pipelines emit only scalar columns") {
    assume(java.nio.file.Files.exists(java.nio.file.Paths.get(sfDir)))
    val feat = Multimodal.pipeline(spark, sfDir)
    assert(feat.schema.fields.forall(f => !f.dataType.typeName.contains("array")))
    assert(feat.schema.fieldNames.toSeq ==
      Seq("id", "modality", "format", "d0", "d1", "d2", "route"))
    assert(feat.count() > 0)
    val frames = Multimodal.framesPipeline(spark, sfDir)
    assert(frames.schema.fieldNames.toSeq == Seq("id", "frame_idx", "n_bytes"))
    assert(frames.count() > 0)
  }
}
