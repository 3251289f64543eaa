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
  * The only corpus-sized exchange is the per-bucket window sort.
  * Ranking is descending by `score` with `tieId` (ascending) breaking
  * ties, so the result is deterministic and equal to
  * `row_number() OVER (ORDER BY score DESC, tieId)`.
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

  def withRank(df: DataFrame, score: Column, tieId: Column,
               rankName: String, buckets: Int = 64): DataFrame = {
    val in =
      if (df.storageLevel != StorageLevel.NONE) df
      else {
        val p = df.persist(StorageLevel.MEMORY_AND_DISK)
        trackOwned(p)
        p
      }
    val sc = score.cast("double")
    val qs = (1 until buckets).map(_.toDouble / buckets)
    val bRow = in
      .agg(percentile_approx(sc, array(qs.map(lit): _*),
        lit(10000)).as("bs"))
      .head
    val bounds =
      (if (bRow.isNullAt(0)) Seq.empty[Double]
       else bRow.getSeq[Double](0).toList).distinct.sorted
    // bucket index: how many boundaries sit strictly ABOVE this score.
    // Highest scores -> bucket 0; equal scores -> equal bucket.
    // Null/NaN scores map to a null bucket and are rejected below.
    val bktDefined = bounds.foldLeft(lit(0)) { (acc, b) =>
      acc + (sc < lit(b)).cast("int")
    }
    val bkt =
      when(sc.isNull || isnan(sc), lit(null).cast("int")).otherwise(bktDefined)
    val withB = in.withColumn("__bkt", bkt)
    val counts = withB.groupBy(col("__bkt")).count().collect()
      .map { r =>
        require(!r.isNullAt(0),
          s"GlobalRank.withRank: score column contains ${r.getLong(1)} " +
            "null or NaN value(s) — ranks are undefined for them; " +
            "filter or impute before ranking")
        r.getInt(0) -> r.getLong(1)
      }.sortBy(_._1)
    val offsets = counts.scanLeft(0L)(_ + _._2).init
    val offExpr = counts.map(_._1).zip(offsets).foldLeft(lit(0L)) {
      case (acc, (k, off)) => when(col("__bkt") === k, lit(off)).otherwise(acc)
    }
    val w = Window.partitionBy(col("__bkt")).orderBy(score.desc, tieId.asc)
    withB
      .withColumn(rankName, row_number().over(w).cast("long") + offExpr)
      .drop("__bkt")
  }
}
