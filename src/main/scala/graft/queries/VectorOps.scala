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
  * queries, map over the corpus" pattern. The LSH-bucketed variant
  * (sign-bit buckets) is the scale path: candidates come from an
  * equi-join on bucket id, turning the n² search into a shuffle
  * join on a compact key.
  *
  * All arithmetic is builtin zip_with/aggregate in double — inside
  * whole-stage codegen, no UDFs. Engine-specific float math →
  * rows-only checks (no DuckDB oracle).
  */
object VectorOps {

  /** vec_id, v (array<double>), norm. */
  private def base(s: SparkSession, d: String): DataFrame =
    t(s, d, "embeddings")
      .selectExpr("vec_id", "label", "CAST(embedding AS array<double>) AS v")
      .selectExpr("vec_id", "label", "v",
        "sqrt(aggregate(v, 0D, (a, x) -> a + x * x)) AS nrm")

  private val cosExpr =
    "aggregate(zip_with(qv, v, (a, b) -> a * b), 0D, (acc, x) -> acc + x) / (qn * nrm) AS cosine"

  val all: Map[String, Q] = Map(

    // ---- brute-force cosine top-k -----------------------------------------
    "q_ann_brute" -> Q.noOracle { (s, d) =>
      val corpus  = base(s, d)
      val queries = corpus.filter(col("vec_id") < 10)
        .select(col("vec_id").as("q_id"), col("v").as("qv"), col("nrm").as("qn"))
      val w = Window.partitionBy(col("q_id")).orderBy(col("cosine").desc, col("vec_id"))
      corpus.crossJoin(broadcast(queries))
        .filter(col("vec_id") =!= col("q_id"))
        .selectExpr("q_id", "vec_id", cosExpr)
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 5)
        .select(col("q_id"), col("rank"), col("vec_id").as("neighbor_id"), col("cosine"))
        .orderBy(col("q_id"), col("rank"))
    },

    // ---- LSH-bucketed ANN (sign-bit coarse quantizer) ---------------------
    // bucket = 8 sign bits of the first 8 dims; query probes only its own
    // bucket. Recall is approximate by design; the bucket join replaces the
    // cross product.
    "q_ann_lsh" -> Q.noOracle { (s, d) =>
      val bucketed = base(s, d).selectExpr("vec_id", "v", "nrm",
        """aggregate(sequence(0, 7),
             0, (acc, i) -> acc + IF(element_at(v, i+1) >= 0D, shiftleft(1, i), 0)) AS bucket""")
      val queries = bucketed.filter(col("vec_id") < 10)
        .select(col("vec_id").as("q_id"), col("v").as("qv"), col("nrm").as("qn"), col("bucket"))
      val w = Window.partitionBy(col("q_id")).orderBy(col("cosine").desc, col("vec_id"))
      bucketed.join(broadcast(queries), Seq("bucket"))
        .filter(col("vec_id") =!= col("q_id"))
        .selectExpr("q_id", "vec_id", cosExpr)
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 5)
        .select(col("q_id"), col("rank"), col("vec_id").as("neighbor_id"), col("cosine"))
        .orderBy(col("q_id"), col("rank"))
    },

    // ---- embedding-cosine near-duplicate pairs ----------------------------
    // Candidates from the same sign-bit bucket, verified by exact cosine.
    // The synthetic corpus has no true near-dups (global max cosine ≈0.5),
    // so the operator reports the strongest pairs above a demonstrative
    // threshold; a production corpus would use ≥0.95.
    "q_dedup_embed" -> Q.noOracle { (s, d) =>
      val bucketed = base(s, d).selectExpr("vec_id", "v", "nrm",
        """aggregate(sequence(0, 7),
             0, (acc, i) -> acc + IF(element_at(v, i+1) >= 0D, shiftleft(1, i), 0)) AS bucket""")
      bucketed.select(col("vec_id").as("id_a"), col("v").as("qv"), col("nrm").as("qn"), col("bucket")).as("a")
        .join(bucketed.select(col("vec_id").as("id_b"), col("v"), col("nrm"), col("bucket")).as("b"),
          Seq("bucket"))
        .filter(col("id_a") < col("id_b"))
        .selectExpr("id_a", "id_b",
          "aggregate(zip_with(qv, v, (a, b) -> a * b), 0D, (acc, x) -> acc + x) / (qn * nrm) AS cosine")
        .filter(col("cosine") >= 0.3)
        .orderBy(col("cosine").desc, col("id_a"), col("id_b"))
        .limit(50)
    }
  )
}
