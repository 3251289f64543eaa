package graft.queries

import graft.Tables.t
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over the `embeddings` table (vec_id,
  * embedding: array<float> dim 64, label).
  *
  * Brute-force cosine top-k is the exactness baseline: the (small)
  * query set is broadcast, so the big side streams through one scan
  * with no shuffle — at 100 TB this is the classic "broadcast the
  * queries, map over the corpus" pattern.
  *
  * The scale path is multi-table sign-LSH (random-hyperplane
  * hashing): `Tables` independent hash tables of `Bits` sign bits
  * each, hyperplanes drawn from a fixed seed. Candidates come from
  * equi-joins on (table, bucket) — a shuffle join on a compact key
  * instead of the n² cross product. Query-side multi-probe (all
  * buckets within Hamming distance 1) buys recall without adding
  * tables. A single 8-bit table (the r1/r2 design) has only 256
  * buckets globally — at 100 TB each bucket still holds ~0.4% of the
  * corpus and one probe of one table has poor recall; multiple
  * independent tables bound both candidate volume and recall loss,
  * and `Bits` scales up (16–24) when the corpus has true near-dups.
  *
  * Engine-specific float math → rows-only checks (no DuckDB oracle).
  * A recall gate vs the brute-force baseline lives in VectorOpsSpec.
  */
object VectorOps {

  val Tables = 8
  val Bits   = 8

  /** T×B seeded random hyperplanes (dim 64) — deterministic across
    * runs and engines.
    */
  private lazy val planes: Seq[Seq[Double]] = {
    val rng = new scala.util.Random(7L)
    Seq.fill(Tables * Bits)(Seq.fill(64)(rng.nextGaussian()))
  }

  /** vec_id, v (array<double>). Norms live inside the cosine kernel
    * (graft.functions.CosineSim), so no interpreted aggregate here.
    */
  private def base(s: SparkSession, d: String): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    t(s, d, "embeddings")
      .selectExpr("vec_id", "label", "CAST(embedding AS array<double>) AS v")
  }

  /** One row per (vec_id, tbl, bucket): the multi-table LSH index.
    * Buckets are sign-bit codes of the seeded hyperplane projections.
    *
    * The projections are computed in codegen: vector components are
    * exploded to (vec_id, pos, x) rows — posexplode of the raw
    * parquet column, so nothing is recomputed — broadcast-joined with
    * the 4096 plane coefficients, and folded by two hash aggregates
    * (dot products, then sign-bit buckets). The array-lambda version
    * of the same math runs interpreted and generates boxed-Double
    * garbage proportional to vectors × planes × dims, which showed up
    * as GC pauses in UNRELATED bench queries.
    */
  private def lshIndex(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val planeRows = planes.zipWithIndex.flatMap { case (p, tb) =>
      p.zipWithIndex.map { case (c, pos) => (pos, tb / Bits, tb % Bits, c) }
    }
    val planesDf = planeRows.toDF("pos", "tbl", "bit", "coef")
    val comps = t(s, d, "embeddings")
      .select(col("vec_id"), posexplode(col("embedding")).as(Seq("pos", "x")))
      .select(col("vec_id"), col("pos"), col("x").cast("double").as("x"))
    val buckets = comps.join(broadcast(planesDf), Seq("pos"))
      .groupBy(col("vec_id"), col("tbl"), col("bit"))
      .agg(sum(col("x") * col("coef")).as("dot"))
      .groupBy(col("vec_id"), col("tbl"))
      .agg(sum(when(col("dot") >= 0d, expr("shiftleft(1, bit)")).otherwise(0))
        .cast("int").as("bucket"))
    base(s, d).join(buckets, Seq("vec_id"))
      .select(col("vec_id"), col("v"), col("tbl"), col("bucket"))
  }

  // native codegen'd expression (graft.functions.CosineSim) — the
  // builtin aggregate(zip_with(...)) form runs interpreted.
  private val cosExpr = "cosine_sim(qv, v) AS cosine"

  // ---- IVF coarse quantizer ------------------------------------------------

  val IvfK = 16        // coarse centroids
  val IvfIters = 4     // Lloyd iterations
  val IvfProbes = 4    // clusters probed per query

  /** (vec_id, pos, x) exploded components — posexplode of the raw
    * parquet column, codegen all the way down.
    */
  private def comps(s: SparkSession, d: String): DataFrame =
    t(s, d, "embeddings")
      .select(col("vec_id"), posexplode(col("embedding")).as(Seq("pos", "x")))
      .select(col("vec_id"), col("pos"), col("x").cast("double").as("x"))

  /** Per-vector nearest-centroid assignment for a given centroid set:
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
    * the K lowest vec_ids). Centroids are K×64 doubles — model-sized,
    * held on the driver like any ANN coarse quantizer's codebook.
    */
  private def ivfCentroids(s: SparkSession, d: String): Array[Array[Double]] = {
    val cps = comps(s, d)
    var cents: Array[Array[Double]] = base(s, d)
      .orderBy(col("vec_id")).limit(IvfK).collect()
      .map(_.getSeq[Double](2).toArray)
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
            val arr = new Array[Double](64)
            rows.foreach(r => arr(r.getInt(1)) = r.getDouble(2))
            arr
          case None => cents(cid) // empty cluster keeps its centroid
        }
      }.toArray
    }
    cents
  }

  val all: Map[String, Q] = Map(

    // ---- brute-force cosine top-k -----------------------------------------
    "q_ann_brute" -> Q.noOracle { (s, d) =>
      val corpus  = base(s, d)
      val queries = corpus.filter(col("vec_id") < 10)
        .select(col("vec_id").as("q_id"), col("v").as("qv"))
      val w = Window.partitionBy(col("q_id")).orderBy(col("cosine").desc, col("vec_id"))
      corpus.crossJoin(broadcast(queries))
        .filter(col("vec_id") =!= col("q_id"))
        .selectExpr("q_id", "vec_id", cosExpr)
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 5)
        .select(col("q_id"), col("rank"), col("vec_id").as("neighbor_id"), col("cosine"))
        .orderBy(col("q_id"), col("rank"))
    },

    // ---- multi-table LSH ANN ----------------------------------------------
    // Candidates: corpus rows sharing a (tbl, bucket) with any of the
    // query's multi-probe buckets (exact bucket + all Hamming ≤ 2
    // neighbors); exact cosine re-ranks candidates, top-5 per query.
    // Probing only the query side keeps the index one row per
    // (vector, table); probe count is 1 + B + B(B-1)/2 per table.
    "q_ann_lsh" -> Q.noOracle { (s, d) =>
      val idx = lshIndex(s, d)
      val probeMasks: Seq[Int] = Seq(0) ++ (0 until Bits).map(1 << _) ++
        (for { j <- 0 until Bits; k <- j + 1 until Bits } yield (1 << j) | (1 << k))
      val queries = idx.filter(col("vec_id") < 10)
        .select(col("vec_id").as("q_id"), col("v").as("qv"),
          col("tbl"), col("bucket"))
        .withColumn("mk", typedlit(probeMasks))
        .selectExpr("q_id", "qv", "tbl",
          "explode(transform(mk, m -> CAST(bucket ^ m AS INT))) AS bucket")
      val cand = idx.select(col("vec_id"), col("v"), col("tbl"), col("bucket"))
        .join(broadcast(queries), Seq("tbl", "bucket"))
        .filter(col("vec_id") =!= col("q_id"))
        .select(col("q_id"), col("vec_id"), col("qv"), col("v"))
        .dropDuplicates("q_id", "vec_id")
      val w = Window.partitionBy(col("q_id")).orderBy(col("cosine").desc, col("vec_id"))
      cand
        .selectExpr("q_id", "vec_id", cosExpr)
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 5)
        .select(col("q_id"), col("rank"), col("vec_id").as("neighbor_id"), col("cosine"))
        .orderBy(col("q_id"), col("rank"))
    },

    // ---- IVF ANN ----------------------------------------------------------
    // Inverted-file index: vectors assigned to their nearest of K
    // coarse centroids; each query probes its IvfProbes nearest
    // clusters and re-ranks the candidates with exact cosine. At
    // scale the assignment is a partitioning key (each cluster is a
    // shard/file group), the codebook is broadcast, and a query
    // touches Probes/K of the corpus.
    "q_ann_ivf" -> Q.noOracle { (s, d) =>
      val cents = ivfCentroids(s, d)
      val cps = comps(s, d)
      val dists = assign(s, cps, cents)
      val clusters = dists
        .groupBy(col("vec_id"))
        .agg(min(struct(col("dist"), col("cid"))).as("m"))
        .select(col("vec_id"), col("m.cid").as("cid"))
      val vecs = base(s, d).select(col("vec_id"), col("v"))
      val members = clusters.join(vecs, Seq("vec_id"))
      val wProbe = Window.partitionBy(col("vec_id")).orderBy(col("dist").asc, col("cid"))
      val probes = dists.filter(col("vec_id") < 10)
        .withColumn("pr", row_number().over(wProbe))
        .filter(col("pr") <= IvfProbes)
        .select(col("vec_id").as("q_id"), col("cid"))
      val qVecs = vecs.filter(col("vec_id") < 10)
        .select(col("vec_id").as("q_id"), col("v").as("qv"))
      val w = Window.partitionBy(col("q_id")).orderBy(col("cosine").desc, col("vec_id"))
      members.join(broadcast(probes), Seq("cid"))
        .filter(col("vec_id") =!= col("q_id"))
        .join(broadcast(qVecs), Seq("q_id"))
        .selectExpr("q_id", "vec_id", cosExpr)
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 5)
        .select(col("q_id"), col("rank"), col("vec_id").as("neighbor_id"), col("cosine"))
        .orderBy(col("q_id"), col("rank"))
    },

    // ---- embedding-cosine near-duplicate pairs ----------------------------
    // Candidates: pairs sharing ANY (tbl, bucket) across the multi-table
    // index (no probing needed — true near-dups agree on most sign bits,
    // so some table matches with high probability); verified by exact
    // cosine. The single-table version self-joined ~n²/256 pairs; with T
    // independent tables of B bits the expected candidate volume is
    // T · n²/2^B with much better recall, and B scales up with corpus
    // size. The synthetic corpus has no true near-dups (global max
    // cosine ≈0.5), so the operator reports the strongest pairs above a
    // demonstrative threshold; a production corpus would use ≥0.95.
    "q_dedup_embed" -> Q.noOracle { (s, d) =>
      val idx = lshIndex(s, d)
      idx.select(col("vec_id").as("id_a"), col("v").as("qv"),
          col("tbl"), col("bucket")).as("a")
        .join(idx.select(col("vec_id").as("id_b"), col("v"),
          col("tbl"), col("bucket")).as("b"), Seq("tbl", "bucket"))
        .filter(col("id_a") < col("id_b"))
        .dropDuplicates("id_a", "id_b")
        .selectExpr("id_a", "id_b", "cosine_sim(qv, v) AS cosine")
        .filter(col("cosine") >= 0.3)
        .orderBy(col("cosine").desc, col("id_a"), col("id_b"))
        .limit(50)
    }
  )
}
