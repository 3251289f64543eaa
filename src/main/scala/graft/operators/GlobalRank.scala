package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Exact distributed global ranking.
  *
  * `row_number() OVER (ORDER BY score)` with no PARTITION BY collapses
  * the whole relation into ONE window task — the classic
  * single-partition scale-killer (Spark emits the
  * `WindowExec: No Partition Defined` warning for exactly this). The
  * range-split + offset form (the TeraSort partitioning idea applied
  * to ranking) keeps it distributed and still EXACT:
  *
  *   1. one mergeable `approx_percentile` pass picks B-1 score
  *      boundaries — sizing only: sketch error moves rows between
  *      buckets, never changes any rank;
  *   2. each row maps to `bucket = #(boundaries strictly above its
  *      score)` — map-side, monotone in score, and tie-safe: equal
  *      scores count the same boundaries, so ties can never straddle
  *      a bucket edge;
  *   3. a per-bucket count pass folds into cumulative offsets — B
  *      rows on the driver, codebook-sized, never corpus-sized;
  *   4. `rank = offset(bucket) + row_number()` windowed WITHIN the
  *      bucket (partitions balanced by the quantile boundaries, so a
  *      skewed score distribution still splits evenly — only a single
  *      massive tie value is irreducibly one partition, exactly as in
  *      any rank definition).
  *
  * The only corpus-sized exchange is the per-bucket window sort, and
  * the final plan carries the offsets as driver literals — a zero-join
  * shape. (r22 note: an in-plan variant that computed the offsets as a
  * broadcast-joined B-row aggregate inside the final action — saving
  * the counts job — was built and A/B'd; it regressed q_global_rank
  * 1.41x at sf1, so the literal-offset form stays. The measured raw
  * lines are in BENCH_ab_grank_sf1_r22.jsonl.)
  *
  * Ranking is descending by `score` with `tieId` (ascending) breaking
  * ties, so the result is deterministic and equal to
  * `row_number() OVER (ORDER BY score DESC, tieId)`.
  *
  * [[withRanks]] fuses the two scalar jobs ACROSS signals (r22, r21
  * verdict item 4): a tagged union computes every signal's boundary
  * sketch in one aggregate, then every signal's bucket counts in a
  * second — the two-signal rank fusion paid 4 driver-scalar jobs where
  * 2 suffice; per-job scheduler latency is pure overhead at any scale,
  * and each fused job back-fills the other signal's straggler tail
  * (guide §2.6).
  *
  * The input feeds three passes (boundaries, counts, final plan), so
  * the operator SELF-DEFENDS: an input that is not already persisted
  * is persisted here (MEMORY_AND_DISK — eviction degrades to
  * recompute, never to failure) and materialized by the boundary
  * pass, so an expensive upstream derivation is computed exactly
  * once. The cache is left in place because the returned lazy plan
  * reads it; operator-OWNED persists (inputs this operator itself
  * cached, as opposed to caller-persisted inputs) are tracked and
  * released by [[releaseCaches]] — long-lived drivers ranking many
  * distinct inputs call it after consuming results, mirroring
  * TextOps.releaseCaches; an early release merely degrades the lazy
  * plan to recompute. `__bkt` is claimed as a working column
  * name; inputs must not carry a column by that name (it is
  * overwritten and then dropped).
  *
  * Scores must be non-null and non-NaN: neither has a defined rank
  * position (window NaN ordering diverges from predicate arithmetic),
  * so such rows map to a null bucket and the counts pass fails loudly
  * instead of silently mis-ranking.
  *
  * Reference behavior target: the reference engine's ORDER BY surface
  * (StorageEngine/SQL/query_executor.hpp sorts result sets on the
  * driver); this operator is the Spark-scale form a 100 TB corpus
  * needs for global ordering signals (curation rank ensembling).
  */
object GlobalRank {

  /** Persists THIS operator created (never caller-owned ones) — the
    * release obligation the scaladoc used to leave to callers, now
    * collectable in one call. Bounding, strong references, and the
    * retire-don't-unpersist eviction grace all live in the shared
    * [[PersistRegistry]].
    */
  private val ownedPersists = new PersistRegistry(64)

  private def trackOwned(p: DataFrame): Unit = ownedPersists.track(p)

  /** Unpersist every input [[withRank]] itself cached. Safe to call
    * while returned rank plans are still unconsumed — they degrade to
    * recompute, never to failure.
    */
  def releaseCaches(): Unit = ownedPersists.releaseAll()

  private def persistIfNeeded(df: DataFrame): DataFrame =
    if (df.storageLevel != StorageLevel.NONE) df
    else {
      val p = df.persist(StorageLevel.MEMORY_AND_DISK)
      trackOwned(p)
      p
    }

  def withRank(df: DataFrame, score: Column, tieId: Column,
               rankName: String, buckets: Int = 64): DataFrame =
    withRanks(Seq((df, score, tieId, rankName)), buckets).head

  /** Rank several independent signals with TWO scalar jobs total
    * (boundary sketch, bucket counts) instead of two per signal: each
    * input's rows are tagged with their signal index and unioned, so
    * one grouped aggregate serves every signal. Grouped and ungrouped
    * sketches may merge partials in different orders, but boundary
    * placement is sizing only (see step 1 above), so ranks are
    * unchanged. Returns one ranked frame per input, in order; each
    * final plan is the exact single-signal shape (bucketed window +
    * literal offsets, zero joins).
    */
  def withRanks(inputs: Seq[(DataFrame, Column, Column, String)],
                buckets: Int = 64): Seq[DataFrame] = {
    require(inputs.nonEmpty, "GlobalRank.withRanks: no inputs")
    val ins = inputs.map { case (df, score, tie, name) =>
      (persistIfNeeded(df), score, tie, name)
    }
    val qs = (1 until buckets).map(_.toDouble / buckets)
    // scalar job 1: every signal's boundaries from one tagged union
    val taggedScores = ins.zipWithIndex.map { case ((in, score, _, _), i) =>
      in.select(lit(i).as("__sig"), score.cast("double").as("__sc"))
    }.reduce(_.unionByName(_))
    val boundsBySig: Map[Int, List[Double]] = taggedScores.groupBy(col("__sig"))
      .agg(percentile_approx(col("__sc"), array(qs.map(lit): _*),
        lit(10000)).as("bs"))
      .collect()
      .map { r =>
        r.getInt(0) -> (if (r.isNullAt(1)) List.empty[Double]
                        else r.getSeq[Double](1).toList.distinct.sorted)
      }.toMap
    // bucket index: how many boundaries sit strictly ABOVE this score.
    // Highest scores -> bucket 0; equal scores -> equal bucket.
    // Null/NaN scores map to a null bucket and are rejected below.
    def bktOf(i: Int, score: Column): Column = {
      val sc = score.cast("double")
      val bktDefined = boundsBySig.getOrElse(i, Nil).foldLeft(lit(0)) {
        (acc, b) => acc + (sc < lit(b)).cast("int")
      }
      when(sc.isNull || isnan(sc), lit(null).cast("int")).otherwise(bktDefined)
    }
    // scalar job 2: every signal's per-bucket counts from one tagged
    // union — B rows per signal on the driver, codebook-sized
    val taggedBkts = ins.zipWithIndex.map { case ((in, score, _, _), i) =>
      in.select(lit(i).as("__sig"), bktOf(i, score).as("__bkt"))
    }.reduce(_.unionByName(_))
    val countsBySig = taggedBkts.groupBy(col("__sig"), col("__bkt")).count()
      .collect()
      .map { r =>
        require(!r.isNullAt(1),
          s"GlobalRank.withRank: score column contains ${r.getLong(2)} " +
            "null or NaN value(s) — ranks are undefined for them; " +
            "filter or impute before ranking")
        (r.getInt(0), r.getInt(1), r.getLong(2))
      }
      .groupBy(_._1)
    ins.zipWithIndex.map { case ((in, score, tieId, rankName), i) =>
      val counts = countsBySig.getOrElse(i, Array.empty)
        .map { case (_, b, c) => b -> c }.sortBy(_._1)
      val offsets = counts.scanLeft(0L)(_ + _._2).init
      val offExpr = counts.map(_._1).zip(offsets).foldLeft(lit(0L)) {
        case (acc, (k, off)) => when(col("__bkt") === k, lit(off)).otherwise(acc)
      }
      val w = Window.partitionBy(col("__bkt")).orderBy(score.desc, tieId.asc)
      in.withColumn("__bkt", bktOf(i, score))
        .withColumn(rankName, row_number().over(w).cast("long") + offExpr)
        .drop("__bkt")
    }
  }
}
