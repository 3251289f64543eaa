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

  val Methods: Set[String] = Set("exact", "lsh", "ivf", "ivfpq")

  /** PQ subspace count for the ivfpq route — the q_ann_ivfpq
    * contract (4 contiguous slices, integer ADC). The route requires
    * the table's vector dimension to divide evenly into it.
    */
  val PqSubspaces = 4

  /** The committed state of one artifact: the engine-table content
    * version and row count it was built at, the `__seq` high-water
    * mark separating base from delta, the sign-bit width (lsh) or
    * codebook size (ivf/ivfpq), the vector DIMENSION the kernels were
    * seeded/trained at (r20 — index routes follow the table's own
    * dimension; a query of a different dimension can never probe this
    * generation), and the live generation directory name.
    */
  final case class Meta(builtVersion: Long, builtN: Long, builtMaxSeq: Long,
                        param: Int, dim: Int, gen: String)

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
      // pre-r20 metas carry no dim — they were all built at 64
      dm = kv.get("dim").flatMap(_.toIntOption).getOrElse(64)
    } yield Meta(v, n, sq, pr, dm, g)
  }

  private def writeMeta(root: String, m: Meta): Unit = {
    Files.createDirectories(Paths.get(root))
    val tmp = Paths.get(root, "_META.tmp")
    Files.write(tmp,
      (s"v=${m.builtVersion} n=${m.builtN} seq=${m.builtMaxSeq} " +
        s"param=${m.param} dim=${m.dim} gen=${m.gen}").getBytes(Utf8))
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
          .filter(_.startsWith("gen-")).toSeq
          // NUMERIC version order (r19 ADVICE): lexicographic puts
          // gen-v9 after gen-v12, which would delete the true
          // immediate predecessor (possibly mid-scan by a concurrent
          // SEARCH) while retaining an ancient generation forever.
          // Names are gen-v<version>[d<dim>]; sort by the numeric
          // version, then name for a stable tie-break across dims.
          .sortBy(g => (g.stripPrefix("gen-v").takeWhile(_.isDigit)
            .toLongOption.getOrElse(-1L), g))
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
    case "ivfpq" => viaIvfPq(s, corpus, root, q, topK, version, n)
    case other =>
      throw new EngineException(
        s"SEARCH USING '$other' is not supported (expected one of: " +
          Methods.toSeq.sorted.mkString(", ") + ")")
  }

  /** Build-or-reuse decision shared by the index routes: reuse the
    * committed artifact when it was built at the query's dimension
    * AND the table is unchanged, or changed but the post-build delta
    * stays inside the re-train bound; rebuild otherwise. Returns the
    * meta to probe under (fresh or reused).
    */
  private def ensure(s: SparkSession, corpus: DataFrame, root: String,
                     version: Long, n: Long, dim: Int,
                     build: (DataFrame, String, Long, Long) => Meta): Meta =
    lockOf(root).synchronized {
      val reuse = readMeta(root).filter { m =>
        m.dim == dim && AnnIndex.committed(s"$root/${m.gen}") && {
          m.builtVersion == version || {
            val deltaN =
              corpus.filter(col("__seq") > m.builtMaxSeq).count()
            m.builtN > 0 &&
              deltaN.toDouble / m.builtN <= AnnIndex.RetrainGrowth
          }
        }
      }
      reuse.getOrElse {
        // a dim change reuses the same version's gen name — suffix it
        // so two dims of the same content version never collide
        val gen = s"gen-v${version}d$dim"
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
    val dim = q.length
    val m = ensure(s, corpus, root, version, n, dim, (c, genDir, maxSeq, nn) => {
      val bits = AnnIndex.bitsFor(nn)
      // lshRowsOf + Overwrite + _SUCCESS — the exact build kernel the
      // index tier uses (upsertLsh), into a fresh generation dir;
      // planes seeded at the TABLE'S dimension (r20 — no 64-dim gate)
      AnnIndex.upsertLsh(s, c.select(col("vec_id"), col("v")), bits, genDir, dim)
      Meta(version, nn, maxSeq, bits, dim, Paths.get(genDir).getFileName.toString)
    })
    val bits = m.param
    // driver-side probe: the query's sign bucket per table, ringed by
    // the probe masks — the client half of every LSH system
    val pl = AnnIndex.planes(bits, dim)
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
    val cand = base.unionByName(AnnIndex.lshRowsOf(s, delta, bits, dim))
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
    val dim = q.length
    val m = ensure(s, corpus, root, version, n, dim, (c, genDir, maxSeq, nn) => {
      val k = AnnIndex.ivfK(nn)
      // the codebook trains at whatever dimension the corpus carries
      // (seeds define it; readCents infers it back) — no 64-dim gate
      AnnIndex.buildIvfFrom(s, c.select(col("vec_id"), col("v")), k,
        s"$genDir/centroids", s"$genDir/members")
      // the members write carries its own _SUCCESS; stamp the gen dir
      // so AnnIndex.committed treats the PAIR as one commit point
      Files.write(Paths.get(genDir, "_SUCCESS"), Array.emptyByteArray)
      Meta(version, nn, maxSeq, k, dim, Paths.get(genDir).getFileName.toString)
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

  /** int8 quantization of a driver-held vector — the Int8Scale /
    * Int8Round kernel discipline (max|x|/127 floored at 1e-300;
    * round half away from zero), applied to the query so its ADC
    * distances compare against codes the kernels stored.
    */
  private def int8Of(v: Array[Double]): Array[Int] = {
    val scale = math.max(v.map(math.abs).max / 127.0, 1e-300)
    v.map { x =>
      val r = x / scale
      (if (r >= 0) math.floor(r + 0.5) else math.ceil(r - 0.5)).toInt
    }
  }

  /** The IVF-PQ route (r20 — SEARCH's fourth method, reusing the
    * q_ann_ivfpq composition): coarse-quantizer probing prunes the
    * member read to the probed cid partitions, integer ADC over the
    * STORED PQ codes shortlists candidates, and only the shortlist
    * pays the exact-cosine re-rank. The generation carries its own
    * PQ codebook (`pqcb` — the 16 lowest live vectors, int8-quantized
    * at build, cid-ascending: the pqCodebook discipline made
    * corpus-relative), so delta rows encode in-plan against the SAME
    * committed literal the build stored — upsertIvfPq's determinism
    * contract, which is what lets stored and derived codes search
    * identically. Requires dim % PqSubspaces == 0 (the pq_encode
    * slice contract).
    */
  private def viaIvfPq(s: SparkSession, corpus: DataFrame, root: String,
                       q: Array[Double], topK: Int, version: Long,
                       n: Long): Seq[(Long, Double)] = {
    val dim = q.length
    if (dim % PqSubspaces != 0)
      throw new EngineException(
        s"SEARCH USING ivfpq requires the vector dimension to divide into " +
          s"$PqSubspaces PQ subspaces (got $dim); use exact, lsh, or ivf")
    graft.functions.GraftFunctions.register(s)
    val m = ensure(s, corpus, root, version, n, dim, (c, genDir, maxSeq, nn) => {
      import s.implicits._
      val k = AnnIndex.ivfK(nn)
      // codebook: the 16 lowest live vec_ids, int8-quantized, re-keyed
      // 0..k-1 ascending (pq_encode requires strictly ascending cids)
      val cb = c.select(col("vec_id"), col("v")).orderBy(col("vec_id")).limit(16)
        .selectExpr("int8_round(v, int8_scale(v)) AS qv").collect()
        .map(_.getSeq[Int](0)).zipWithIndex
        .map { case (v0, i) => (i.toLong, v0) }.toSeq
      cb.toDF("cid", "qv").coalesce(1)
        .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
        .parquet(s"$genDir/pqcb")
      AnnIndex.buildIvfPqFrom(s, c.select(col("vec_id"), col("v")), k, cb,
        s"$genDir/centroids", s"$genDir/members")
      Files.write(Paths.get(genDir, "_SUCCESS"), Array.emptyByteArray)
      Meta(version, nn, maxSeq, k, dim, Paths.get(genDir).getFileName.toString)
    })
    val genDir = s"$root/${m.gen}"
    val cents = AnnIndex.committedCents(s, genDir)
    val cb: Seq[(Long, Seq[Int])] = s.read.parquet(s"$genDir/pqcb").collect()
      .map(r => (r.getLong(0), r.getSeq[Int](1))).toSeq.sortBy(_._1)
    val probed = AnnIndex
      .probeClusters(Seq((0L, q)), cents, VectorOps.ivfProbes(cents.length))
      .map(_._2).distinct
    // driver-side ADC tables: the query's exact int64 squared-L2 to
    // every codebook entry per subspace — PqSubspaces×k longs, a
    // literal in the plan (the adcDistTable discipline, one query)
    val qq = int8Of(q)
    val sub = dim / PqSubspaces
    val dtab: Seq[Seq[Long]] = (0 until PqSubspaces).map { mm =>
      cb.map { case (_, cv) =>
        var acc = 0L
        var j = 0
        while (j < sub) {
          val dlt = (qq(mm * sub + j) - cv(mm * sub + j)).toLong
          acc += dlt * dlt
          j += 1
        }
        acc
      }
    }
    val base = s.read.parquet(s"$genDir/members")
      .filter(col("cid").isin(probed: _*))
      .select(col("vec_id"), col("pc"))
    // delta rows assign to the FROZEN centroids and encode against
    // the COMMITTED codebook in-plan — searchable at commit, and
    // bit-equal to what a rebuild would store (upsertIvfPq kernel)
    val delta = AnnIndex.assignMembers(s,
        corpus.filter(col("__seq") > m.builtMaxSeq)
          .select(col("vec_id"), col("v")), cents)
      .filter(col("cid").isin(probed: _*))
      .withColumn("pc", call_function("pq_encode",
        expr("int8_round(v, int8_scale(v))"), typedlit(cb), lit(PqSubspaces)))
      .select(col("vec_id"), col("pc"))
    // ADC shortlist: 4 integer table lookups per candidate (the
    // element_at chain is 1-based), then only max(50, topK) ids pay
    // the exact re-rank against the LIVE corpus
    val short = base.unionByName(delta).dropDuplicates("vec_id")
      .withColumn("dt", typedlit(dtab))
      .selectExpr("vec_id",
        """aggregate(transform(pc, (x, i) ->
             element_at(element_at(dt, i + 1), CAST(x.code AS INT) + 1)),
           0L, (a, b) -> a + b) AS adist""")
      .orderBy(col("adist"), col("vec_id"))
      .limit(math.max(50, topK))
      .select(col("vec_id"))
    rerank(s, corpus.join(short, Seq("vec_id")).select(col("vec_id"), col("v")),
      q, topK)
  }
}
