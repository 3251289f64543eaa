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
    assert(resized.forall(_.payload.length == 32 * 32))
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

  test("declared pipelines emit only scalar columns") {
    assume(java.nio.file.Files.exists(java.nio.file.Paths.get(sfDir)))
    val feat = Multimodal.pipeline(spark, sfDir)
    assert(feat.schema.fields.forall(f => !f.dataType.typeName.contains("array")))
    assert(feat.count() > 0)
    val frames = Multimodal.framesPipeline(spark, sfDir)
    assert(frames.schema.fieldNames.toSeq ==
      Seq("id", "frame_idx", "n_bytes", "frame_checksum"))
    assert(frames.count() > 0)
  }
}
