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

  private def topk(q: String, dir: String = sfDir): Map[Long, Set[Long]] =
    SparkEntry.queries(q)(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(2)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap

  /** Top-5 map from a pipeline frame (q_id, rank, neighbor_id, ...) —
    * for the ORGANIC-corpus recall gates: the declared q_ann_lsh /
    * q_ann_ivf queries run on the planted-clone corpus (oracled),
    * so organic recall is gated on the shared pipelines directly.
    */
  private def pipeTopk(df: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] =
    df.collect().map(r => (r.getLong(0), r.getLong(2)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap

  test("multi-table LSH recall >= 0.8 vs brute-force top-5") {
    assume(java.nio.file.Files.exists(java.nio.file.Paths.get(sfDir)))
    import graft.queries.{AnnIndex, VectorOps}
    val brute = topk("q_ann_brute")
    val lsh = pipeTopk(
      VectorOps.lshTop5From(spark, sfDir, AnnIndex.lshIndex(spark, sfDir)))
    val recalls = brute.map { case (q, bs) =>
      lsh.getOrElse(q, Set.empty[Long]).intersect(bs).size.toDouble / bs.size
    }
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.8, f"mean recall $mean%.3f < 0.8 (per-query: $recalls)")
  }

  test("IVF recall >= 0.8 vs brute-force top-5") {
    assume(java.nio.file.Files.exists(java.nio.file.Paths.get(sfDir)))
    import graft.queries.{AnnIndex, VectorOps}
    val brute = topk("q_ann_brute")
    val ivf = pipeTopk(VectorOps.ivfTop5(spark, sfDir))
    val recalls = brute.map { case (q, bs) =>
      ivf.getOrElse(q, Set.empty[Long]).intersect(bs).size.toDouble / bs.size
    }
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.8, f"mean recall $mean%.3f < 0.8 (per-query: $recalls)")
  }

  test("planted-clone index queries return exactly the clones, all three paths") {
    assume(java.nio.file.Files.exists(java.nio.file.Paths.get(sfDir)))
    import graft.queries.AnnIndex
    // the determinism claim behind the r17 oracles, asserted directly:
    // each path's top-5 for query q is its 5 exact clones in id order
    for (q <- Seq("q_ann_lsh", "q_ann_ivf", "q_ann_ivfpq")) {
      val rows = SparkEntry.queries(q)(spark, sfDir).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      assert(rows.nonEmpty, q)
      rows.foreach { case (qid, rank, nb) =>
        assert(nb == AnnIndex.QueryCloneOffset + qid * AnnIndex.QueryClones
          + (rank - 1), s"$q: query $qid rank $rank retrieved $nb")
      }
    }
  }

  test("sampled recall audit agrees with the full audit and is verdict-stable") {
    assume(java.nio.file.Files.exists(java.nio.file.Paths.get(sfDir)))
    def verdicts(q: String): Seq[(String, Int)] =
      SparkEntry.queries(q)(spark, sfDir).collect()
        .map(r => (r.getString(0), r.getInt(1))).toSeq
    val full = verdicts("q_ann_recall_audit")
    val sampled = verdicts("q_ann_recall_sampled")
    // the sampled estimator (fixed ~2048-id sample, exact-within-
    // sample ground truth) must reach the same pass/fail verdict as
    // the full linear audit — the "within noise" contract
    assert(sampled == full, s"sampled $sampled != full $full")
    assert(sampled == Seq(("ivf", 1), ("lsh", 1)), sampled.toString)
  }

  test("sampled-audit membership is hash-uniform, never id-stripe-aligned (r18)") {
    import spark.implicits._
    import graft.queries.VectorOps
    // 64k-id corpus: stride 4096, width 128 → expected sample ≈ 2048
    // (deterministic — md5 is fixed; binomial sd ≈ 45)
    val n = 65536L
    val picked = spark.range(n).toDF("vec_id")
      .filter(VectorOps.samplePred(n)).count()
    assert(picked > 1800 && picked < 2300,
      s"expected ~2048 sampled ids out of $n, got $picked")
    // a content-correlated CONTIGUOUS id block (the planted-clone
    // shape: clones live at a fixed offset block): the pre-r18
    // id-stripe form selected stride-aligned runs — such a block was
    // covered by one contiguous run or missed entirely, skewing
    // measured recall whenever ids correlate with content. The md5
    // form draws ≈ block/32, spread across the block.
    val inBlock = spark.range(20000000L, 20002048L).toDF("vec_id")
      .filter(VectorOps.samplePred(n))
      .collect().map(_.getLong(0)).sorted
    assert(inBlock.length > 20 && inBlock.length < 120,
      s"expected ~64 of a 2048-id block, got ${inBlock.length}")
    val gaps = inBlock.sliding(2).count {
      case Array(a, b) => b - a > 1
      case _ => false
    }
    assert(gaps > inBlock.length / 2,
      "hash membership must not select an id-contiguous run")
    // the size route: below sampleRouteMin the declared query runs
    // the FULL exact base — the sample floor only engages where it
    // is cheaper than exactness
    assert(VectorOps.sampleRouteMin == 8192L)
  }

  test("int8-quantized search keeps recall and cosine accuracy vs exact") {
    assume(java.nio.file.Files.exists(java.nio.file.Paths.get(sfDir)))
    import org.apache.spark.sql.functions.col
    graft.functions.GraftFunctions.register(spark)
    // per-vector scales cancel in cosine, so quantized ranking uses
    // the int vectors alone — the property that makes int8 the 4×
    // memory play at corpus scale. Gate the DECLARED query, not a
    // re-implementation: drift in q_ann_int8 itself must fail here.
    val quantTop = topk("q_ann_int8")
    val exact = topk("q_knn_exact")
    val recalls = exact.map { case (q, es) =>
      quantTop.getOrElse(q, Set.empty[Long]).intersect(es).size.toDouble / es.size
    }
    val mean = recalls.sum / recalls.size
    info(f"int8 top-5 mean recall $mean%.3f")
    assert(mean >= 0.8, f"int8 recall $mean%.3f < 0.8 (per-query: $recalls)")

    // quantized cosine tracks exact cosine closely on random pairs
    val qz = graft.queries.VectorOps.quantized(spark, sfDir)
      .selectExpr("vec_id", "CAST(qv AS array<double>) AS v")
    val both = graft.queries.AnnIndex.base(spark, sfDir)
      .join(qz.withColumnRenamed("v", "qvec"), Seq("vec_id"))
      .filter(col("vec_id") < 200)
    val errs = both.as("a").crossJoin(both.as("b"))
      .filter(col("a.vec_id") < col("b.vec_id"))
      .selectExpr("abs(cosine_sim(a.v, b.v) - cosine_sim(a.qvec, b.qvec)) AS err")
      .agg(org.apache.spark.sql.functions.max(col("err"))).head().getDouble(0)
    info(f"max |cos_int8 - cos_exact| = $errs%.4f over 19.9k pairs")
    assert(errs <= 0.05, f"quantized cosine error $errs%.4f > 0.05")
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
    // the oracled planted form: every reported pair is a planted
    // exact clone (organic max cosine ≈ 0.5 sits far below the 0.9
    // threshold), and every live planted clone is FOUND (sign-LSH
    // recall 1 on exact duplicates)
    val found = SparkEntry.queries("q_dedup_embed")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(found.nonEmpty)
    assert(found.forall { case (a, b) =>
      b == a + graft.queries.AnnIndex.CloneOffset },
      s"only planted clone pairs may clear 0.9: ${found.take(5).mkString(",")}")
    val expected = graft.queries.AnnIndex.base(spark, sfDir)
      .filter(org.apache.spark.sql.functions.expr(
        s"vec_id % ${graft.queries.AnnIndex.CloneMod} = 0 AND " +
          "aggregate(v, 0D, (acc, x) -> acc + x * x) > 0"))
      .count()
    assert(found.length == expected,
      s"every live planted clone must be found: ${found.length} vs $expected")
  }

  test("LSH candidate volume grows LINEARLY across corpus scales (two-point curve + dead-vector guard)") {
    // The r9-verdict watch item: one-scale bounds can hide a
    // quadratic term. Measure the bucket self-join volume (exactly
    // q_dedup_embed's pre-verify candidate set) at n and ~3n and
    // assert the growth tracks the corpus ratio, not its square —
    // bitsFor widens B with n, so pairs-per-row must stay ~constant.
    assume(java.nio.file.Files.exists(java.nio.file.Paths.get(sfDir)))
    import java.nio.file.{Files, Paths}
    import graft.queries.AnnIndex
    import org.apache.spark.sql.functions.col
    import spark.implicits._

    def pairVolume(dir: String): (Long, Long) = {
      val n = AnnIndex.corpusSize(spark, dir)
      val counts = AnnIndex.lshIndex(spark, dir)
        .groupBy("tbl", "bucket").count().collect().map(_.getLong(2))
      (n, counts.map(c => c * (c - 1) / 2).sum)
    }
    val (n1, vol1) = pairVolume(sfDir)

    // 3× corpus: the sf0.1 vectors + seeded gaussians, PLUS planted
    // zero vectors — which must not appear in the index at all (every
    // sign bit of a zero vector is 1: one degenerate bucket per table)
    val dir = Files.createTempDirectory("graft-lsh-scale").toString
    val src = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1).toArray, r.getInt(2)))
    val rng = new scala.util.Random(31L)
    val synth = (0 until 2 * n1.toInt).map { i =>
      (200000L + i, Array.fill(64)(rng.nextGaussian().toFloat), 0)
    }
    val zeros = (0 until 20).map(i => (900000L + i, Array.fill(64)(0.0f), 0))
    (src.toSeq ++ synth ++ zeros).map { case (id, v, l) => (id, v.toSeq, l) }
      .toDF("vec_id", "embedding", "label")
      .coalesce(1).write.parquet(s"$dir/embeddings.parquet")
    try {
      val (n3, vol3) = pairVolume(dir)
      val corpusRatio = n3.toDouble / n1
      val volRatio = vol3.toDouble / vol1
      info(f"candidate volume: n=$n1 -> $vol1 pairs (${vol1.toDouble / n1}%.1f/row), " +
        f"n=$n3 -> $vol3 pairs (${vol3.toDouble / n3}%.1f/row), " +
        f"growth $volRatio%.2fx vs corpus $corpusRatio%.2fx")
      assert(volRatio <= 2.0 * corpusRatio,
        f"candidate volume grew $volRatio%.2fx at $corpusRatio%.2fx corpus — super-linear")
      // dead vectors: none of the planted zeros may hold an index row
      val zeroRows = AnnIndex.lshIndex(spark, dir)
        .filter(col("vec_id") >= 900000L).count()
      assert(zeroRows == 0L, s"$zeroRows index rows for zero-norm vectors")
      // and the dedup pipeline still runs NaN-free over the fixture
      assert(graft.queries.VectorOps.embedNearDups(spark, dir, 0.9, None)
        .collect().forall(!_.getDouble(2).isNaN))
    } finally {
      AnnIndex.pruneArtifacts(dir)
      graft.engine.Persist.deleteRecursively(Paths.get(dir))
    }
  }

  test("LSH bit width is derived from corpus size (sub-quadratic by construction)") {
    import graft.queries.AnnIndex.bitsFor
    assert(bitsFor(500) == 8)    // floor: 256 buckets minimum
    assert(bitsFor(2000) == 9)
    assert(bitsFor(1000000) == 18)
    assert(bitsFor(1L << 40) == 24) // cap
  }

  test("incremental ANN upsert: batch folds into frozen artifacts, idempotent, audited") {
    assume(java.nio.file.Files.exists(java.nio.file.Paths.get(sfDir)))
    import graft.queries.AnnIndex
    val n = AnnIndex.corpusSize(spark, sfDir)
    // grown IVF members cover the WHOLE corpus exactly once (base
    // build + one batch append — no drops, no duplicates)
    val (cents1, mp) = AnnIndex.ivfIncremental(spark, sfDir)
    val members = AnnIndex.readMembers(spark, mp)
    assert(members.count() == n, "grown members must cover the corpus once")
    assert(members.select("vec_id").distinct().count() == n)
    // a second access is a pure read: the committed arrivals
    // directory (its _SUCCESS is the upsert marker) prevents a
    // duplicate fold-in, and the frozen codebook is byte-stable
    val (cents2, mp2) = AnnIndex.ivfIncremental(spark, sfDir)
    assert(mp2 == mp && AnnIndex.readMembers(spark, mp2).count() == n)
    assert(cents1.length == cents2.length &&
      cents1.zip(cents2).forall { case (a, b) => a.sameElements(b) })
    // crash-window regression: a killed upsert leaves the arrivals
    // directory WITHOUT _SUCCESS — the re-run must Overwrite it, never
    // append a second copy of the batch into the index
    val arrivals = mp.find(_.contains("arrivals")).get
    java.nio.file.Files.deleteIfExists(java.nio.file.Paths.get(arrivals, "_SUCCESS"))
    val (_, mp3) = AnnIndex.ivfIncremental(spark, sfDir)
    val regrown = AnnIndex.readMembers(spark, mp3)
    assert(regrown.count() == n, "re-run after a simulated crash must not double-index")
    assert(regrown.select("vec_id").distinct().count() == n)
    // declared audit: batch searchable + recall >= 0.8 on the grown
    // corpus for BOTH index families, and the ~6% fixture growth is
    // far below the mechanized re-train bound (stale = 0)
    val rows = SparkEntry.queries("q_ann_upsert")(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getInt(2), r.getInt(3))).toSeq
    assert(rows == Seq(("ivf", 1, 1, 0), ("lsh", 1, 1, 0)), rows.toString)
  }

  test("upsert recall audit: sampled base agrees with the full base on the grown index (r19 size route)") {
    // the r19 size route lets q_ann_upsert's recall half restrict its
    // exact-KNN base to the md5 sample above sampleRouteMin; this pin
    // runs BOTH routes over the same grown artifacts on a corpus
    // where samplePred is a genuine ~1/5 subset (10k > the 2048
    // sample floor; the shipped sf0.1 testdata is only 2000 rows,
    // where the predicate degenerates to select-all) and requires
    // verdict agreement — the within-noise contract the sampled
    // recall audit already carries for the non-grown index.
    // Clustered unit vectors (40 centers + noise, the testdata
    // embeddings shape) give the near-field structure that makes a
    // recall verdict signal rather than coin-flip.
    import graft.queries.{AnnIndex, VectorOps}
    import spark.implicits._
    val rng = new scala.util.Random(13L)
    val centers = Array.fill(40)(Array.fill(64)(rng.nextGaussian()))
    def unit(v: Array[Double]): Seq[Double] = {
      val n0 = math.sqrt(v.map(x => x * x).sum)
      v.map(_ / n0).toSeq
    }
    val rows = (0L until 10000L).map { i =>
      val c = centers((i % 40).toInt)
      (i, unit(c.zipWithIndex.map { case (x, j) =>
        x + rng.nextGaussian() * 0.15 + j * 0.0 }))
    }
    val dir = java.nio.file.Files.createTempDirectory("graft-sizeroute").toString
    try {
      rows.toDF("vec_id", "embedding")
        .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
      val n = AnnIndex.corpusSize(spark, dir)
      assert(n > VectorOps.sampleStripes * VectorOps.sampleStripeWidth,
        s"fixture premise: corpus ($n) must outgrow the sample floor")
      val ivfArt = AnnIndex.ivfIncremental(spark, dir)
      val (lshIdx, lshBits) = AnnIndex.lshIncrementalWithBits(spark, dir)
      val full = VectorOps.upsertRecallOk(spark, dir, ivfArt, lshIdx, lshBits, None)
      val sampled = VectorOps.upsertRecallOk(spark, dir, ivfArt, lshIdx, lshBits,
        Some(VectorOps.samplePred(n)))
      assert(sampled == full, s"sampled $sampled != full $full")
      assert(full == ((true, true)), full.toString)
    } finally {
      AnnIndex.pruneArtifacts(dir)
      graft.engine.Persist.deleteRecursively(java.nio.file.Paths.get(dir))
    }
  }

  test("ANN re-train mechanism: growth past 20% rebuilds the quantizer, recall recovers, arrivals absorbed") {
    import java.nio.file.{Files, Paths}
    import graft.queries.AnnIndex
    import spark.implicits._
    val rng = new scala.util.Random(7L)
    def vec(center: Double): Seq[Double] =
      Seq.tabulate(64)(i => center * math.sin(i * 0.37) + rng.nextGaussian() * 0.2)
    // base corpus = blob A (+ the 10 query ids, placed in blob B so
    // the drift batch is what they should retrieve); the arrival
    // batch = blob B, ~49% growth — far past the 20% bound, and a
    // real distribution drift the frozen quantizer never saw
    val baseVecs = (10L until 420L).map(id => (id, vec(1.0)))
    val queryVecs = (0L until 10L).map(id => (id, vec(5.0)))
    val batchVecs = (420L until 620L).map(id => (id, vec(5.0)))
    val dir = Files.createTempDirectory("graft-retrain").toString
    try {
      (baseVecs ++ queryVecs).map { case (id, v) => (id, v, 0) }
        .toDF("vec_id", "embedding", "label")
        .coalesce(1).write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
      AnnIndex.pruneArtifacts(dir)
      val (cents0, _) = AnnIndex.ivf(spark, dir)
      val root = AnnIndex.ivfPath(spark, dir)
      // fold the drift batch in against the FROZEN centroids (the
      // streamed-arrivals shape) — correct, but now 200/430 grown
      AnnIndex.upsertIvf(spark, batchVecs.toDF("vec_id", "v"),
        cents0, s"$root/arrivals-b0")
      val (b0, a0, stale0) =
        AnnIndex.indexGrowth(spark, s"$root/members", AnnIndex.arrivalDirs(root))
      // bytes-based audit (stat calls only): the 200-vector arrival
      // batch over a 420-vector base is far past the 20% bound
      assert(stale0 && b0 > 0 && a0.toDouble / b0 > 0.2,
        s"fixture must exceed the growth bound: $a0 arrival bytes over $b0 base bytes")

      // exact top-5 over the grown corpus, computed from the raw
      // vectors (driver-sized fixture)
      val corpus = (baseVecs ++ queryVecs ++ batchVecs).toMap
      def cosine(a: Seq[Double], b: Seq[Double]): Double = {
        val dot = a.zip(b).map { case (x, y) => x * y }.sum
        dot / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
      }
      val exact = queryVecs.map { case (q, qv) =>
        q -> corpus.collect { case (id, v) if id != q => (cosine(qv, v), id) }
          .toSeq.sortBy { case (c, id) => (-c, id) }.take(5).map(_._2).toSet
      }.toMap
      def recallOf(artifact: (Array[Array[Double]], Seq[String])): Double = {
        val got = graft.queries.VectorOps.ivfTop5From(spark, dir, artifact)
          .collect().map(r => (r.getLong(0), r.getLong(2)))
          .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
        exact.map { case (q, es) =>
          got.getOrElse(q, Set.empty[Long]).intersect(es).size.toDouble / es.size
        }.sum / exact.size
      }
      val pre = recallOf((cents0,
        AnnIndex.streamedMemberPaths(s"$root/members", root)))

      // the mechanism: stale -> rebuild fires, k re-derived from the
      // grown corpus, arrivals left committed-empty (absorbed)
      assert(AnnIndex.retrainIvfIfStale(spark, root),
        "re-train must fire past the growth bound")
      val (b1, a1, stale1) =
        AnnIndex.indexGrowth(spark, s"$root/members", AnnIndex.arrivalDirs(root))
      assert(b1 > 0 && a1 == 0 && !stale1,
        s"retrained members must absorb the arrivals: base $b1, arrival bytes $a1")
      assert(AnnIndex.readMembers(spark,
        AnnIndex.streamedMemberPaths(s"$root/members", root)).count() == 620,
        "retrained members must hold every base + arrival vector exactly once")
      assert(AnnIndex.committed(s"$root/arrivals-b0"),
        "absorbed arrivals must stay committed (empty) so replays cannot re-fold")
      val cents1 = {
        val (c, _) = AnnIndex.ivf(spark, dir)  // re-reads the swapped artifact
        c
      }
      assert(cents1.length == AnnIndex.ivfK(620),
        s"k must re-derive from the grown size, got ${cents1.length}")
      val post = recallOf((cents1,
        AnnIndex.streamedMemberPaths(s"$root/members", root)))
      info(f"IVF recall around mechanized re-train: pre $pre%.3f -> post $post%.3f")
      assert(post >= 0.8, f"post-retrain recall $post%.3f < 0.8")
      assert(post >= pre - 1e-9, "re-train must never cost recall")
      // below the bound: the mechanism is a no-op
      assert(!AnnIndex.retrainIvfIfStale(spark, root))
      // crash window: a kill AFTER the members swap but BEFORE the
      // arrivals cleanup leaves the absorbed batch's data files on
      // disk — the _ABSORBED marker (which traveled atomically with
      // the members move) must keep every reader from double-indexing
      AnnIndex.upsertIvf(spark, batchVecs.toDF("vec_id", "v"),
        cents1, s"$root/arrivals-b0")  // re-materialize the absorbed data
      assert(AnnIndex.readMembers(spark,
        AnnIndex.streamedMemberPaths(s"$root/members", root)).count() == 620,
        "absorbed arrivals left data-carrying by a crash must be skipped")
      assert(!AnnIndex.retrainIvfIfStale(spark, root),
        "absorbed arrivals must not count toward growth again")
      // a SECOND re-train (fresh growth) must carry the absorbed set
      // FORWARD: the crash-left data in arrivals-b0 stays skipped even
      // after the marker is rewritten by the new generation
      val batch2 = (620L until 920L).map(id => (id, vec(-2.0)))
      AnnIndex.upsertIvf(spark, batch2.toDF("vec_id", "v"),
        cents1, s"$root/arrivals-b1")
      assert(AnnIndex.retrainIvfIfStale(spark, root),
        "fresh growth past the bound must fire again")
      assert(AnnIndex.readMembers(spark,
        AnnIndex.streamedMemberPaths(s"$root/members", root)).count() == 920,
        "the second generation must union the absorbed set — " +
          "crash-left arrivals-b0 data must stay skipped")
      // crash-atomic swap recovery: emulate a kill in the
      // delete-to-move window (live gone, staged stamped _COMMIT) —
      // the next access must FINISH the swap, never rebuild from the
      // base slice and silently lose the absorbed arrivals
      val memP = Paths.get(s"$root/members")
      val stgP = Paths.get(s"$root/members_retrain")
      Files.move(memP, stgP)
      Files.createFile(stgP.resolve("_COMMIT"))
      val (centsR, pathsR) = AnnIndex.ivf(spark, dir)
      assert(AnnIndex.readMembers(spark, pathsR).count() == 920,
        "recovery must finish the stamped swap")
      assert(centsR.nonEmpty, "the recovered generation must carry its centroids")
      // an UNSTAMPED partial staging is a dead build: discarded, live intact
      Files.createDirectories(stgP)
      Files.write(stgP.resolve("junk.parquet"), Array[Byte](1, 2, 3))
      assert(!AnnIndex.retrainIvfIfStale(spark, root))
      assert(!Files.exists(stgP), "unstamped staging must be discarded")
      assert(AnnIndex.readMembers(spark,
        AnnIndex.streamedMemberPaths(s"$root/members", root)).count() == 920)
      // marker boundedness (r18, r17 verdict nit 3): the generation-2
      // marker still names BOTH absorbed dirs (b0 carried as a crash
      // leftover, b1 absorbed by that swap) — but a CLEAN third
      // generation must prune entries whose dirs were reclaimed to
      // committed-empty and name ONLY its own arrivals, so the record
      // stays one-generation-sized across an index's lifetime
      import scala.jdk.CollectionConverters._
      def marker(): Set[String] =
        Files.readAllLines(Paths.get(s"$root/members/_ABSORBED"))
          .asScala.map(_.trim).filter(_.nonEmpty).toSet
      assert(marker() == Set("arrivals-b0", "arrivals-b1"), marker().toString)
      val batch3 = (920L until 1220L).map(id => (id, vec(3.0)))
      AnnIndex.upsertIvf(spark, batch3.toDF("vec_id", "v"),
        AnnIndex.ivf(spark, dir)._1, s"$root/arrivals-b2")
      assert(AnnIndex.retrainIvfIfStale(spark, root),
        "generation 3 must fire on fresh growth")
      assert(marker() == Set("arrivals-b2"),
        s"reclaimed absorbed entries must be pruned at the next swap: ${marker()}")
      assert(AnnIndex.readMembers(spark,
        AnnIndex.streamedMemberPaths(s"$root/members", root)).count() == 1220,
        "the third generation must hold every vector exactly once")
    } finally {
      AnnIndex.pruneArtifacts(dir)
      graft.engine.Persist.deleteRecursively(Paths.get(dir))
    }
  }

  test("LSH re-train mechanism: growth past 20% re-hashes the corpus, stale clears, arrivals absorbed") {
    import java.nio.file.{Files, Paths}
    import graft.queries.AnnIndex
    import spark.implicits._
    val rng = new scala.util.Random(11L)
    def vec(center: Double): Seq[Double] =
      Seq.tabulate(64)(i => center * math.sin(i * 0.37) + rng.nextGaussian() * 0.2)
    // base corpus = blob A (+ the 10 query ids in blob B); the first
    // arrival batch = blob B, ~50% growth — past the 20% bound
    val baseVecs = (10L until 420L).map(id => (id, vec(1.0)))
    val queryVecs = (0L until 10L).map(id => (id, vec(5.0)))
    val batchVecs = (420L until 620L).map(id => (id, vec(5.0)))
    val dir = Files.createTempDirectory("graft-lsh-retrain").toString
    try {
      (baseVecs ++ queryVecs).map { case (id, v) => (id, v, 0) }
        .toDF("vec_id", "embedding", "label")
        .coalesce(1).write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
      AnnIndex.pruneArtifacts(dir)
      val (_, bits0) = AnnIndex.lshIncrementalWithBits(spark, dir)
      val root = AnnIndex.lshIncPath(spark, dir)
      // fold the drift batch in against the FIXED seeded planes (the
      // streamed-arrivals shape) — correct, but now far past 20% grown
      AnnIndex.upsertLsh(spark, batchVecs.toDF("vec_id", "v"), bits0,
        s"$root/arrivals-b0")
      val (b0, a0, stale0) =
        AnnIndex.indexGrowth(spark, s"$root/rows", AnnIndex.lshArrivalDirs(root))
      assert(stale0 && b0 > 0 && a0.toDouble / b0 > 0.2,
        s"fixture must exceed the growth bound: $a0 arrival bytes over $b0 base bytes")

      // the verb: the LSH artifact stores ids only, so the rebuild
      // re-hashes the supplied CORPUS at the grown width and swaps
      val grownCorpus = (baseVecs ++ queryVecs ++ batchVecs)
        .toDF("vec_id", "embedding")
      assert(AnnIndex.retrainLshIfStale(spark, root, grownCorpus, 620L),
        "re-train must fire past the growth bound")
      val (b1, a1, stale1) =
        AnnIndex.indexGrowth(spark, s"$root/rows", AnnIndex.lshArrivalDirs(root))
      assert(b1 > 0 && a1 == 0 && !stale1,
        s"retrained rows must absorb the arrivals: base $b1, arrival bytes $a1")
      assert(AnnIndex.lshBitsOf(root, -1) == AnnIndex.bitsFor(620L),
        "the swapped generation must record its re-derived bit width")
      val grownIdx = AnnIndex.readMembers(spark,
        s"$root/rows" +: AnnIndex.lshArrivalDirs(root))
      assert(grownIdx.select("vec_id").distinct().count() == 620,
        "retrained rows must hold every base + arrival vector")
      assert(grownIdx.count() == 620L * AnnIndex.Tables,
        "exactly one bucket row per (vector, table)")
      assert(AnnIndex.committed(s"$root/arrivals-b0") &&
        AnnIndex.committed(s"$root/arrivals"),
        "absorbed arrivals must stay committed (empty) so replays cannot re-fold")

      // recall over the retrained artifact: the queries' true top-5
      // are now in the drift batch the frozen generation never saw.
      // The probe pipeline resolves candidate vectors from the CORPUS
      // TABLE (the index stores ids only), so the grown corpus is
      // written back first — the real-world shape: arrivals exist in
      // the index because the corpus grew.
      (baseVecs ++ queryVecs ++ batchVecs).map { case (id, v) => (id, v, 0) }
        .toDF("vec_id", "embedding", "label")
        .coalesce(1).write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
      val corpus = (baseVecs ++ queryVecs ++ batchVecs).toMap
      def cosine(a: Seq[Double], b: Seq[Double]): Double = {
        val dot = a.zip(b).map { case (x, y) => x * y }.sum
        dot / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
      }
      val exact = queryVecs.map { case (q, qv) =>
        q -> corpus.collect { case (id, v) if id != q => (cosine(qv, v), id) }
          .toSeq.sortBy { case (c, id) => (-c, id) }.take(5).map(_._2).toSet
      }.toMap
      val got = graft.queries.VectorOps
        .lshTop5From(spark, dir, grownIdx, Some(AnnIndex.lshBitsOf(root, bits0)))
        .collect().map(r => (r.getLong(0), r.getLong(2)))
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      val recall = exact.map { case (q, es) =>
        got.getOrElse(q, Set.empty[Long]).intersect(es).size.toDouble / es.size
      }.sum / exact.size
      info(f"LSH recall after mechanized re-train: $recall%.3f")
      assert(recall >= 0.8, f"post-retrain recall $recall%.3f < 0.8")

      // crash window: a kill AFTER the rows swap but BEFORE the
      // arrivals cleanup leaves absorbed data files on disk — the
      // _ABSORBED marker (swapped atomically with the rows) must keep
      // every reader from double-indexing
      AnnIndex.upsertLsh(spark, batchVecs.toDF("vec_id", "v"),
        AnnIndex.lshBitsOf(root, bits0), s"$root/arrivals-b0")
      assert(AnnIndex.readMembers(spark,
        s"$root/rows" +: AnnIndex.lshArrivalDirs(root))
        .count() == 620L * AnnIndex.Tables,
        "absorbed arrivals left data-carrying by a crash must be skipped")
      assert(!AnnIndex.retrainLshIfStale(spark, root, grownCorpus, 620L),
        "absorbed arrivals must not count toward growth again")

      // coverage guard: grow again, then hand the verb a corpus that
      // MISSES the indexed batch — it must refuse before the swap
      // rather than silently drop indexed vectors
      val batch2 = (620L until 820L).map(id => (id, vec(-3.0)))
      AnnIndex.upsertLsh(spark, batch2.toDF("vec_id", "v"),
        AnnIndex.lshBitsOf(root, bits0), s"$root/arrivals-b1")
      val shortCorpus = (baseVecs ++ queryVecs).toDF("vec_id", "embedding")
      intercept[IllegalArgumentException] {
        AnnIndex.retrainLshIfStale(spark, root, shortCorpus, 420L)
      }
      // the refused rebuild must leave the old generation fully intact
      assert(AnnIndex.readMembers(spark,
        s"$root/rows" +: AnnIndex.lshArrivalDirs(root))
        .select("vec_id").distinct().count() == 820,
        "a refused re-train must leave the grown index readable")
      // and the verb still succeeds with the TRUE grown corpus
      val fullCorpus = (baseVecs ++ queryVecs ++ batchVecs ++ batch2)
        .toDF("vec_id", "embedding")
      assert(AnnIndex.retrainLshIfStale(spark, root, fullCorpus, 820L))
      assert(AnnIndex.readMembers(spark,
        s"$root/rows" +: AnnIndex.lshArrivalDirs(root))
        .select("vec_id").distinct().count() == 820)
      // crash-atomic swap recovery (the LSH side of the IVF member's
      // gate): a stamped staged dir finishes its move at the next
      // access (every access and retrain entry runs recoverSwap), an
      // unstamped one is discarded with the live generation intact.
      // Exercised through retrainLshIfStale on THIS root — the
      // mid-test dataset rewrite moved the fingerprint-derived path,
      // so dataset-keyed accessors resolve a different artifact.
      val rowsP = Paths.get(s"$root/rows")
      val stgP = Paths.get(s"$root/rows_retrain")
      Files.move(rowsP, stgP)
      Files.createFile(stgP.resolve("_COMMIT"))
      assert(!AnnIndex.retrainLshIfStale(spark, root, fullCorpus, 820L),
        "recovery runs at entry; the recovered generation is not stale")
      assert(AnnIndex.readMembers(spark,
        s"$root/rows" +: AnnIndex.lshArrivalDirs(root))
        .select("vec_id").distinct().count() == 820,
        "recovery must finish the stamped swap, not lose absorbed arrivals")
      assert(AnnIndex.lshBitsOf(root, -1) == AnnIndex.bitsFor(820L),
        "the recovered generation must keep its recorded bit width")
      Files.createDirectories(stgP)
      Files.write(stgP.resolve("junk.parquet"), Array[Byte](1, 2, 3))
      assert(!AnnIndex.retrainLshIfStale(spark, root, fullCorpus, 820L))
      assert(!Files.exists(stgP), "unstamped staging must be discarded")
      assert(AnnIndex.readMembers(spark,
        s"$root/rows" +: AnnIndex.lshArrivalDirs(root))
        .select("vec_id").distinct().count() == 820)
    } finally {
      AnnIndex.pruneArtifacts(dir)
      graft.engine.Persist.deleteRecursively(Paths.get(dir))
    }
  }

  test("readMembers tolerates a committed-but-empty arrivals root") {
    import java.nio.file.Files
    import spark.implicits._
    val base = Files.createTempDirectory("rm-base")
    val arr = Files.createTempDirectory("rm-arr")
    try {
      Seq((1L, Seq(1.0), 0), (2L, Seq(2.0), 1)).toDF("vec_id", "v", "cid")
        .write.mode("overwrite").parquet(base.toString)
      // a zero-row upsert commits _SUCCESS and nothing else — the
      // union must degrade to base-only, not fail schema inference
      Files.createFile(arr.resolve("_SUCCESS"))
      val df = graft.queries.AnnIndex.readMembers(
        spark, Seq(base.toString, arr.toString))
      assert(df.count() == 2)
    } finally {
      graft.engine.Persist.deleteRecursively(base)
      graft.engine.Persist.deleteRecursively(arr)
    }
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

  test("wide-bit LSH (B=11, radius 3) keeps near-dup recall on a 4.6k corpus") {
    assume(java.nio.file.Files.exists(java.nio.file.Paths.get("/root/testdata/sf0.1")))
    import java.nio.file.{Files, Paths}
    import graft.queries.AnnIndex
    import spark.implicits._
    // fixture: the 2000 sf0.1 vectors + 2550 seeded synthetic vectors
    // (pushes n past 4096 so bitsFor derives 11 bits -> radius 3),
    // + 50 clones perturbed to cosine ~0.99
    val dir = Paths.get(System.getProperty("java.io.tmpdir"), "graft-lsh-wide").toString
    if (Files.exists(Paths.get(dir)))
      graft.engine.Persist.deleteRecursively(Paths.get(dir))
    val src = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1).toArray, r.getInt(2)))
      .sortBy(_._1)
    val rng = new scala.util.Random(13L)
    val synth = (0 until 2550).map { i =>
      (10000L + i, Array.fill(64)(rng.nextGaussian().toFloat), 0)
    }
    val clones = src.take(50).map { case (id, v, lab) =>
      val prng = new scala.util.Random(id * 7 + 1)
      val sigma = math.sqrt(v.map(x => x.toDouble * x).sum / v.length)
      (id + 100000L, v.map(x => (x + 0.1 * sigma * prng.nextGaussian()).toFloat), lab)
    }
    (src ++ synth ++ clones).toSeq.map { case (id, v, l) => (id, v.toSeq, l) }
      .toDF("vec_id", "embedding", "label")
      .coalesce(1).write.parquet(s"$dir/embeddings.parquet")
    AnnIndex.pruneArtifacts(dir)

    val n = AnnIndex.corpusSize(spark, dir)
    assert(AnnIndex.bitsFor(n) == 11, s"fixture must derive 11 bits, n=$n")
    assert(graft.queries.VectorOps.probeRadius(11) == 3)
    val found = graft.queries.VectorOps.embedNearDups(spark, dir, 0.9, None)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val truth = src.take(50).map(s => (s._1, s._1 + 100000L)).toSet
    val rec = truth.intersect(found).size.toDouble / truth.size
    val prec = if (found.isEmpty) 1.0 else truth.intersect(found).size.toDouble / found.size
    info(f"wide-bit embed near-dup: recall $rec%.3f precision $prec%.3f (${found.size} pairs)")
    assert(rec >= 0.95, f"recall $rec%.3f < 0.95 at B=11")
    assert(prec >= 0.95, f"precision $prec%.3f < 0.95 at B=11")

    // the radius-3 multi-probe path end-to-end: top-5 recall vs brute
    // force must hold at the wider bit width too (pipeline directly:
    // the declared query now runs on the planted-clone corpus)
    val brute = topk("q_ann_brute", dir)
    val lsh = pipeTopk(graft.queries.VectorOps.lshTop5From(spark, dir,
      AnnIndex.lshIndex(spark, dir)))
    val recalls = brute.map { case (q, bs) =>
      lsh.getOrElse(q, Set.empty[Long]).intersect(bs).size.toDouble / bs.size
    }
    val meanR = recalls.sum / recalls.size
    info(f"wide-bit LSH top-5 mean recall $meanR%.3f")
    assert(meanR >= 0.8, f"radius-3 LSH recall $meanR%.3f < 0.8 (per-query $recalls)")
    graft.engine.Persist.deleteRecursively(Paths.get(dir))
  }

  test("k-means update partitions the corpus exactly and stays in int8 range") {
    assume(java.nio.file.Files.exists(java.nio.file.Paths.get(sfDir)))
    import org.apache.spark.sql.functions.{col, expr}
    val rows = SparkEntry.queries("q_kmeans_update")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
    spark.catalog.clearCache()
    graft.functions.GraftFunctions.register(spark)
    val nLive = graft.queries.AnnIndex.base(spark, sfDir)
      .filter(expr("dot_product(v, v) > 0")).count()
    val dims = rows.map(_._2).distinct.sorted
    assert(dims.head == 1 && dims.last == 64 && dims.length == 64, s"dims $dims")
    // every live vector lands in exactly one cluster: per-dim member
    // counts are constant within a cluster and sum to the live corpus
    val byCluster = rows.groupBy(_._1)
    byCluster.foreach { case (cid, rs) =>
      assert(rs.map(_._4).distinct.length == 1, s"cluster $cid has varying n")
      assert(rs.length == 64, s"cluster $cid has ${rs.length} dims")
    }
    val total = byCluster.map(_._2.head._4).sum
    assert(total == nLive, s"cluster sizes sum to $total, live corpus is $nLive")
    // fixed-point sanity: a mean of int8 components stays in [-127, 127]
    assert(rows.forall(r => math.abs(r._5) <= 127.0))
    // and the update is consistent with the dedup half's assignment
    val asgSizes = SparkEntry.queries("q_dedup_semantic")(spark, sfDir).collect()
      .groupBy(_.getLong(1)).view.mapValues(_.length.toLong).toMap
    spark.catalog.clearCache()
    assert(byCluster.view.mapValues(_.head._4).toMap == asgSizes,
      "kmeans-update cluster sizes diverge from semantic-dedup assignment")
  }

  test("pca power step matches a local exact-integer recompute") {
    assume(java.nio.file.Files.exists(java.nio.file.Paths.get(sfDir)))
    // same quantized corpus the query consumes, recomputed naively on
    // the driver in exact integer arithmetic — any ordering or
    // overflow defect in the distributed fold diverges
    val qvs = graft.queries.VectorOps.quantized(spark, sfDir)
      .collect().map(_.getSeq[Int](2).toArray)
    spark.catalog.clearCache()
    val dim = qvs.head.length
    val w = Array.tabulate(dim)(j => (j % 7) - 3L)
    val y = new Array[Long](dim)
    qvs.foreach { q =>
      val dw = q.indices.map(j => q(j) * w(j)).sum
      q.indices.foreach(dRow => y(dRow) += q(dRow).toLong * dw)
    }
    val got = SparkEntry.queries("q_pca_power")(spark, sfDir).collect()
      .map(r => r.getLong(0).toInt -> r.getLong(1)).toMap
    spark.catalog.clearCache()
    assert(got == y.zipWithIndex.map { case (v, i) => i -> v }.toMap)
  }

  test("whitened checksums match a local recompute; dims mean-center") {
    assume(java.nio.file.Files.exists(java.nio.file.Paths.get(sfDir)))
    val rows = graft.queries.VectorOps.quantized(spark, sfDir)
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](2).toArray)
    spark.catalog.clearCache()
    val dim = rows.head._2.length
    val n = rows.length.toLong
    val s1 = new Array[Long](dim); val s2 = new Array[Long](dim)
    rows.foreach { case (_, q) =>
      q.indices.foreach { j => s1(j) += q(j); s2(j) += q(j).toLong * q(j) }
    }
    val mu = Array.tabulate(dim)(j => s1(j).toDouble / n)
    val sigma = Array.tabulate(dim)(j =>
      math.sqrt((n * s2(j) - s1(j) * s1(j)).toDouble / (n.toDouble * n)))
    val want = rows.map { case (id, q) =>
      val zs = q.indices.map { j =>
        math.floor((1e6 * (q(j).toDouble - mu(j))) / math.max(sigma(j), 1e-300) + 0.5).toLong
      }
      id -> (zs.sum, zs.map(math.abs).sum)
    }.toMap
    val got = SparkEntry.queries("q_embed_whiten")(spark, sfDir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    spark.catalog.clearCache()
    assert(got == want)
    // whitening contract: per-dim micro sums mean-center (each element
    // rounds by <= 0.5, so |corpus sum per dim| <= n/2 in micro units)
    val zSumTotal = want.values.map(_._1).sum
    assert(math.abs(zSumTotal) <= dim.toLong * (n / 2 + 1),
      s"whitened corpus sum $zSumTotal is not mean-centered")
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

  test("PQ: clustered corpus encodes to its own centers; ADC retrieves in-cluster") {
    // PQ's contract is on STRUCTURED data (random uniform vectors are
    // its worst case — the declared queries' synthetic corpus only
    // exercises exactness, which the DuckDB oracle covers). Plant 16
    // well-separated centers at the codebook source ids (31·c) with
    // every other vector a tiny jitter off its id%16 center: every
    // subspace must code to the member's own center, and ADC top-5
    // must stay in-cluster for all 10 queries.
    import spark.implicits._
    val dim = 64
    // modulus 17 > 16 clusters and 5 invertible mod 17 → all 16
    // center patterns are DISTINCT shifts (a period-13 variant made
    // clusters 13-15 alias clusters 0-2)
    def center(k: Int): Array[Float] =
      Array.tabulate(dim)(j => (50 * (((k * 5 + j) % 17) - 8)).toFloat)
    val rows = (0L until 500L).map { id =>
      val v: Array[Float] =
        if (id % 31 == 0 && id < 496) center((id / 31).toInt)
        else {
          val c = center((id % 16).toInt)
          Array.tabulate(dim)(j => c(j) + (((id * (j + 3)) % 3).toInt - 1) * 0.5f)
        }
      (id, v.toSeq, (id % 16).toInt)
    }
    val dir = java.nio.file.Files.createTempDirectory("pqspec").toString
    rows.toDF("vec_id", "embedding", "label")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    try {

    def cluster(id: Long): Long = if (id % 31 == 0 && id < 496) id / 31 else id % 16
    val enc = SparkEntry.queries("q_pq_encode")(spark, dir).collect()
    enc.foreach { r =>
      val id = r.getLong(0)
      val codes = (1 to 4).map(r.getLong)
      assert(codes.forall(_ == cluster(id)),
        s"vec $id coded $codes, expected all ${cluster(id)}")
    }
    // codebook vectors reconstruct exactly
    assert(enc.filter(r => r.getLong(0) % 31 == 0 && r.getLong(0) < 496)
      .forall(_.getLong(5) == 0L), "centroid rows must have err 0")

    val adc = SparkEntry.queries("q_ann_pq_adc")(spark, dir).collect()
    assert(adc.nonEmpty)
    adc.foreach { r =>
      val (q, n) = (r.getLong(0), r.getLong(2))
      assert(cluster(n) == cluster(q),
        s"query $q retrieved out-of-cluster neighbor $n")
    }

    // IVF-PQ: the full pruned-probe + ADC-shortlist + exact-re-rank
    // composition must keep recall vs exact KNN on the same fixture
    // (pipeline directly: the declared query now runs on the
    // planted-clone corpus)
    val ivfpq = graft.queries.VectorOps.ivfPqTop5(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(2)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val exact = SparkEntry.queries("q_knn_exact")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(2)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val recalls = exact.map { case (q, es) =>
      ivfpq.getOrElse(q, Set.empty[Long]).intersect(es).size.toDouble / es.size
    }
    val mean = recalls.sum / recalls.size
    info(f"IVF-PQ top-5 mean recall on clustered fixture: $mean%.3f")
    assert(mean >= 0.8, f"IVF-PQ recall $mean%.3f < 0.8 (per-query: $recalls)")

    // PQ over the incrementally GROWN index (base = vec_id % 17 != 0,
    // arrivals folded in without rebuild): the ADC-shortlist-rerank
    // pipeline must keep recall vs exact KNN over the FULL fixture —
    // the upsert member of the IVF-PQ family, audited here because
    // PQ's recall contract is structured data (same treatment as
    // q_ann_ivfpq itself, which is rows-only on the random corpus)
    val grown = graft.queries.VectorOps.ivfPqUpsertTop5(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(2)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val gRecalls = exact.map { case (q, es) =>
      grown.getOrElse(q, Set.empty[Long]).intersect(es).size.toDouble / es.size
    }
    val gMean = gRecalls.sum / gRecalls.size
    info(f"IVF-PQ top-5 mean recall over the grown (upserted) index: $gMean%.3f")
    assert(gMean >= 0.8,
      f"grown-index IVF-PQ recall $gMean%.3f < 0.8 (per-query: $gRecalls)")
    } finally {
      // the IVF run built index artifacts keyed by this random temp
      // path — prune them (no later run can ever reuse the key), and
      // delete the fixture even when an assertion above fails
      graft.queries.AnnIndex.pruneArtifacts(dir)
      graft.engine.Persist.deleteRecursively(java.nio.file.Paths.get(dir))
    }
  }

  test("capped codebook size is corpus-independent past the cap") {
    import spark.implicits._
    import graft.queries.VectorOps.{cappedCodebook, cappedCodebookMaxK}
    def corpus(n: Int) =
      (1 to n).map(i => (i.toLong, Seq.tabulate(8)(j => (i % 97 + j).toDouble)))
        .toDF("vec_id", "v")
    // below the cap: k = ceil(sqrt(n))
    val small = cappedCodebook(corpus(100))
    assert(small.size == 10, s"ceil(sqrt(100)) = 10, got ${small.size}")
    // past the cap: k pinned at the cap regardless of n — 20x the
    // corpus, SAME codebook size (the fixed-k contract the %53
    // convention lacked)
    val atCap = cappedCodebook(corpus(2000))
    val atCap20x = cappedCodebook(corpus(40000))
    assert(atCap.size == cappedCodebookMaxK && atCap20x.size == cappedCodebookMaxK,
      s"codebook must pin at the cap: ${atCap.size} vs ${atCap20x.size}")
    // deterministic: same corpus, same sample, cid-ascending
    val again = cappedCodebook(corpus(2000))
    assert(again == atCap, "capped codebook must be deterministic")
    assert(atCap.map(_._1) == atCap.map(_._1).sorted,
      "codebook must be cid-ascending (the kernel's lowest-cid tie rule)")
  }
}
