package graft.engine

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.queries.{AnnIndex, VectorOps}

/** Engine-surface similarity search (r19 — the OPTIMIZE/EXPORT
  * treatment applied to ANN, r18 verdict item 3): the artifact
  * build/probe machinery behind the `SEARCH <table> NEAREST (...)
  * TOP k [USING exact|lsh|ivf]` dialect verb. Every kernel is the
  * index tier's own (AnnIndex.lshRowsOf / buildIvfFrom / planes /
  * probe masks / cosine_sim), so the engine verb and the declared
  * query paths cannot drift — EngineOpsSpec pins the planted-fixture
  * equality.
  *
  * Index discipline (the repo's incremental-fold contract, applied
  * to a MUTABLE engine table):
  *  - Artifacts live under the engine's data root, one generation
  *    directory per build (`gen-v<version>`), named by `_META`
  *    (atomic tmp+move). A new build writes a NEW generation and
  *    swaps the meta — a reader probing the old generation never
  *    races an in-place overwrite; superseded generations are pruned
  *    keeping one predecessor (the retire-then-drain lesson).
  *  - Freshness WITHOUT rebuild-per-write: rows written after the
  *    build (engine `__seq` greater than the build's high-water
  *    mark) are hashed/assigned IN-PLAN per search through the same
  *    frozen kernels — an insert or vector UPDATE is searchable the
  *    moment it commits (the batch_indexed discipline), while the
  *    persisted base amortizes across searches. DELETEd rows cost
  *    only dead candidates: the exact re-rank inner-joins the LIVE
  *    snapshot, so they can never be returned.
  *  - Staleness: once the delta outgrows [[AnnIndex.RetrainGrowth]]
  *    of the built base, the search REBUILDS (the engine is the
  *    index owner here, so the mechanized re-train fires in line
  *    rather than flagging `stale` for an operator).
  *  - Size route: below [[ExactMax]] live vectors the exact scan is
  *    cheaper than any probe (the sampleRouteMin lesson), so USING
  *    omitted routes small tables to exact and large ones to LSH.
  */
object AnnSearch {

  /** Auto-route threshold: tables below this many live vectors
    * always search exactly — at engine-table scales the probe
    * machinery only wins once the corpus outgrows the candidate set
    * it would generate (the same crossover reasoning as
    * VectorOps.sampleRouteMin, sized to the bucket fan-out).
    */
  val ExactMax = 4096L

  val Methods: Set[String] = Set("exact", "lsh", "ivf")

  /** The committed state of one artifact: the engine-table content
    * version and row count it was built at, the `__seq` high-water
    * mark separating base from delta, the sign-bit width (lsh) or
    * codebook size (ivf), and the live generation directory name.
    */
  final case class Meta(builtVersion: Long, builtN: Long, builtMaxSeq: Long,
                        param: Int, gen: String)

  private val Utf8 = java.nio.charset.StandardCharsets.UTF_8

  private def metaPath(root: String) = Paths.get(root, "_META")

  private def readMeta(root: String): Option[Meta] = {
    val p = metaPath(root)
    if (!Files.isRegularFile(p)) return None
    val kv = new String(Files.readAllBytes(p), Utf8).trim
      .split("\\s+").map(_.split("=", 2))
      .collect { case Array(a, b) => a -> b }.toMap
    for {
      v <- kv.get("v").flatMap(_.toLongOption)
      n <- kv.get("n").flatMap(_.toLongOption)
      sq <- kv.get("seq").flatMap(_.toLongOption)
      pr <- kv.get("param").flatMap(_.toIntOption)
      g <- kv.get("gen")
    } yield Meta(v, n, sq, pr, g)
  }

  private def writeMeta(root: String, m: Meta): Unit = {
    Files.createDirectories(Paths.get(root))
    val tmp = Paths.get(root, "_META.tmp")
    Files.write(tmp,
      (s"v=${m.builtVersion} n=${m.builtN} seq=${m.builtMaxSeq} " +
        s"param=${m.param} gen=${m.gen}").getBytes(Utf8))
    Files.move(tmp, metaPath(root), StandardCopyOption.REPLACE_EXISTING,
      StandardCopyOption.ATOMIC_MOVE)
  }

  /** Drop superseded generation dirs, keeping the live one and its
    * immediate predecessor (a reader that resolved the old meta
    * moments ago may still be mid-scan on it).
    */
  private def pruneGenerations(root: String, live: String): Unit = {
    val r = Paths.get(root)
    if (!Files.isDirectory(r)) return
    val gens = {
      val ls = Files.list(r)
      try {
        import scala.jdk.CollectionConverters._
        ls.iterator().asScala.map(_.getFileName.toString)
          .filter(_.startsWith("gen-")).toSeq.sorted
      } finally ls.close()
    }
    gens.filterNot(_ == live).dropRight(1)
      .foreach(g => Persist.deleteRecursively(r.resolve(g)))
  }

  // one build at a time per JVM per root stripe — the single-writer
  // discipline every AnnIndex artifact build uses
  private val buildLocks = Array.fill(16)(new Object)
  private def lockOf(root: String) =
    buildLocks(math.floorMod(root.hashCode, buildLocks.length))

  /** Exact cosine top-k of `q` over a (vec_id, v) corpus — the
    * re-rank kernel every route ends in (cosine_sim is the same
    * codegen'd expression the declared ANN paths score with).
    */
  private def rerank(s: SparkSession, cand: DataFrame, q: Array[Double],
                     topK: Int): Seq[(Long, Double)] = {
    graft.functions.GraftFunctions.register(s)
    cand.withColumn("qv", typedlit(q.toSeq))
      .selectExpr("vec_id", "cosine_sim(qv, v) AS cosine")
      .orderBy(col("cosine").desc, col("vec_id"))
      .limit(topK)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
  }

  /** Route one search. `corpus` is the engine's LIVE merged view as
    * (vec_id: long, v: array<double>, __seq: long), zero-norm rows
    * excluded; `version` is the table's content version; `root` the
    * per-(table, column, method) artifact directory.
    */
  def search(s: SparkSession, method: String, corpus: DataFrame,
             root: String, q: Array[Double], topK: Int,
             version: Long, n: Long): Seq[(Long, Double)] = method match {
    case "exact" => rerank(s, corpus.select(col("vec_id"), col("v")), q, topK)
    case "lsh"   => viaLsh(s, corpus, root, q, topK, version, n)
    case "ivf"   => viaIvf(s, corpus, root, q, topK, version, n)
    case other =>
      throw new EngineException(
        s"SEARCH USING '$other' is not supported (expected one of: " +
          Methods.toSeq.sorted.mkString(", ") + ")")
  }

  /** Build-or-reuse decision shared by both index routes: reuse the
    * committed artifact when the table is unchanged, or changed but
    * the post-build delta stays inside the re-train bound; rebuild
    * otherwise. Returns the meta to probe under (fresh or reused).
    */
  private def ensure(s: SparkSession, corpus: DataFrame, root: String,
                     version: Long, n: Long,
                     build: (DataFrame, String, Long, Long) => Meta): Meta =
    lockOf(root).synchronized {
      val reuse = readMeta(root).filter { m =>
        AnnIndex.committed(s"$root/${m.gen}") && {
          m.builtVersion == version || {
            val deltaN =
              corpus.filter(col("__seq") > m.builtMaxSeq).count()
            m.builtN > 0 &&
              deltaN.toDouble / m.builtN <= AnnIndex.RetrainGrowth
          }
        }
      }
      reuse.getOrElse {
        val gen = s"gen-v$version"
        val maxSeq = {
          val r = corpus.agg(max(col("__seq"))).collect()(0)
          if (r.isNullAt(0)) 0L else r.getLong(0)
        }
        val m = build(corpus, s"$root/$gen", maxSeq, n)
        writeMeta(root, m)
        pruneGenerations(root, gen)
        m
      }
    }

  private def viaLsh(s: SparkSession, corpus: DataFrame, root: String,
                     q: Array[Double], topK: Int, version: Long,
                     n: Long): Seq[(Long, Double)] = {
    val m = ensure(s, corpus, root, version, n, (c, genDir, maxSeq, nn) => {
      val bits = AnnIndex.bitsFor(nn)
      // lshRowsOf + Overwrite + _SUCCESS — the exact build kernel the
      // index tier uses (upsertLsh), into a fresh generation dir
      AnnIndex.upsertLsh(s, c.select(col("vec_id"), col("v")), bits, genDir)
      Meta(version, nn, maxSeq, bits, Paths.get(genDir).getFileName.toString)
    })
    val bits = m.param
    // driver-side probe: the query's sign bucket per table, ringed by
    // the probe masks — the client half of every LSH system
    val pl = AnnIndex.planes(bits)
    val masks = VectorOps.masksUpTo(bits, VectorOps.probeRadius(bits))
    val probes = (0 until AnnIndex.Tables).flatMap { t =>
      var bucket = 0
      var b = 0
      while (b < bits) {
        val plane = pl(t * bits + b)
        var dot = 0.0
        var i = 0
        while (i < plane.length && i < q.length) { dot += plane(i) * q(i); i += 1 }
        if (dot >= 0) bucket |= (1 << b)
        b += 1
      }
      masks.map(mk => (t, bucket ^ mk))
    }
    import s.implicits._
    val probesDf = probes.toDF("tbl", "bucket")
    val base = s.read.parquet(s"$root/${m.gen}")
    // post-build writes (INSERT and UPDATE both carry fresh __seq)
    // hash through the SAME frozen planes in-plan — searchable the
    // moment they commit, no rebuild
    val delta = corpus.filter(col("__seq") > m.builtMaxSeq)
      .select(col("vec_id"), col("v").as("embedding"))
    val cand = base.unionByName(AnnIndex.lshRowsOf(s, delta, bits))
      .join(broadcast(probesDf), Seq("tbl", "bucket"))
      .select(col("vec_id")).dropDuplicates("vec_id")
    // inner join with the LIVE corpus: stale index entries of DELETEd
    // (or re-bucketed) rows drop here, never reach the result
    rerank(s, corpus.join(cand, Seq("vec_id")).select(col("vec_id"), col("v")),
      q, topK)
  }

  private def viaIvf(s: SparkSession, corpus: DataFrame, root: String,
                     q: Array[Double], topK: Int, version: Long,
                     n: Long): Seq[(Long, Double)] = {
    val m = ensure(s, corpus, root, version, n, (c, genDir, maxSeq, nn) => {
      val k = AnnIndex.ivfK(nn)
      AnnIndex.buildIvfFrom(s, c.select(col("vec_id"), col("v")), k,
        s"$genDir/centroids", s"$genDir/members")
      // the members write carries its own _SUCCESS; stamp the gen dir
      // so AnnIndex.committed treats the PAIR as one commit point
      Files.write(Paths.get(genDir, "_SUCCESS"), Array.emptyByteArray)
      Meta(version, nn, maxSeq, k, Paths.get(genDir).getFileName.toString)
    })
    val genDir = s"$root/${m.gen}"
    val cents = AnnIndex.committedCents(s, genDir)
    val probed = AnnIndex
      .probeClusters(Seq((0L, q)), cents, VectorOps.ivfProbes(cents.length))
      .map(_._2).distinct
    // cid-partition-pruned member read — only probed clusters scan
    val base = s.read.parquet(s"$genDir/members")
      .filter(col("cid").isin(probed: _*))
      .select(col("vec_id"))
    // delta rows assign to the FROZEN committed centroids in-plan
    // (the upsert contract), then prune to the probed cells
    val delta = AnnIndex.assignMembers(s,
        corpus.filter(col("__seq") > m.builtMaxSeq)
          .select(col("vec_id"), col("v")), cents)
      .filter(col("cid").isin(probed: _*))
      .select(col("vec_id"))
    val cand = base.unionByName(delta).dropDuplicates("vec_id")
    rerank(s, corpus.join(cand, Seq("vec_id")).select(col("vec_id"), col("v")),
      q, topK)
  }
}
