package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Recall gate for the multi-table LSH ANN path: top-5 neighbors from
  * q_ann_lsh must cover ≥ 0.8 of the brute-force top-5 on sf0.01
  * (mean over the 10 query vectors).
  */
class VectorOpsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  private val sfDir = "/root/testdata/sf0.01"

  private def topk(q: String): Map[Long, Set[Long]] =
    SparkEntry.queries(q)(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(2)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap

  test("multi-table LSH recall >= 0.8 vs brute-force top-5") {
    assume(java.nio.file.Files.exists(java.nio.file.Paths.get(sfDir)))
    val brute = topk("q_ann_brute")
    val lsh = topk("q_ann_lsh")
    val recalls = brute.map { case (q, bs) =>
      lsh.getOrElse(q, Set.empty[Long]).intersect(bs).size.toDouble / bs.size
    }
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.8, f"mean recall $mean%.3f < 0.8 (per-query: $recalls)")
  }

  test("IVF recall >= 0.8 vs brute-force top-5") {
    assume(java.nio.file.Files.exists(java.nio.file.Paths.get(sfDir)))
    val brute = topk("q_ann_brute")
    val ivf = topk("q_ann_ivf")
    val recalls = brute.map { case (q, bs) =>
      ivf.getOrElse(q, Set.empty[Long]).intersect(bs).size.toDouble / bs.size
    }
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.8, f"mean recall $mean%.3f < 0.8 (per-query: $recalls)")
  }

  test("LSH candidate generation is sub-quadratic (bounded candidate volume)") {
    assume(java.nio.file.Files.exists(java.nio.file.Paths.get(sfDir)))
    import graft.queries.AnnIndex
    val n = AnnIndex.corpusSize(spark, sfDir)
    val counts = AnnIndex.lshIndex(spark, sfDir)
      .groupBy("tbl", "bucket").count().collect().map(_.getLong(2))
    // the largest bucket bounds the per-probe join fan-out; the
    // pairwise sum over buckets is exactly the self-join candidate
    // volume of q_dedup_embed before cosine verification
    val maxBucket = counts.max
    val pairVolume = counts.map(c => c * (c - 1) / 2).sum
    assert(maxBucket <= n / 4, s"max bucket $maxBucket vs n=$n")
    assert(pairVolume <= n * n / 20, s"candidate pairs $pairVolume vs n^2=${n * n}")
    val lsh = SparkEntry.queries("q_dedup_embed")(spark, sfDir)
    assert(lsh.count() <= 50) // top-pairs contract holds
  }

  test("LSH bit width is derived from corpus size (sub-quadratic by construction)") {
    import graft.queries.AnnIndex.bitsFor
    assert(bitsFor(500) == 8)    // floor: 256 buckets minimum
    assert(bitsFor(2000) == 9)
    assert(bitsFor(1000000) == 18)
    assert(bitsFor(1L << 40) == 24) // cap
  }

  test("multi-probe mask generation covers exactly the Hamming ball") {
    import graft.queries.VectorOps.masksUpTo
    val m = masksUpTo(8, 2)
    assert(m.size == 1 + 8 + 28)
    assert(m.distinct.size == m.size)
    assert(m.forall(x => Integer.bitCount(x) <= 2 && x < 256))
    // radius scales up with the bit width
    assert(graft.queries.VectorOps.probeRadius(8) == 2)
    assert(graft.queries.VectorOps.probeRadius(16) == 3)
    assert(masksUpTo(16, 3).size == 1 + 16 + 120 + 560)
  }

  test("IVF codebook size follows sqrt(n) with floor and cap") {
    import graft.queries.AnnIndex.ivfK
    assert(ivfK(100) == 16)        // floor
    assert(ivfK(500) == 23)
    assert(ivfK(1000000) == 1000)
    assert(ivfK(1L << 40) == 4096) // cap: codebook stays model-sized
  }

  test("artifact paths change when the dataset is regenerated in place") {
    assume(java.nio.file.Files.exists(java.nio.file.Paths.get(sfDir)))
    import java.nio.file.{Files, Paths}
    import graft.queries.AnnIndex
    val dir = Files.createTempDirectory("graft-fp").toString
    Files.copy(Paths.get(s"$sfDir/embeddings.parquet"),
      Paths.get(s"$dir/embeddings.parquet"))
    val p1 = AnnIndex.lshPath(spark, dir)
    // same content, different mtime = a regeneration must re-key
    Files.setLastModifiedTime(Paths.get(s"$dir/embeddings.parquet"),
      java.nio.file.attribute.FileTime.fromMillis(System.currentTimeMillis() + 60000))
    val p2 = AnnIndex.lshPath(spark, dir)
    assert(p1 != p2, s"stale artifact would be served: $p1")
    graft.engine.Persist.deleteRecursively(Paths.get(dir))
  }
}
