package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Point-in-interval range join via bucketing — the scale path for a
  * join Spark would otherwise plan as a broadcast-nested-loop (or,
  * non-broadcastable, a cartesian product): intervals are exploded to
  * every fixed-width bucket they cover, points hash to exactly ONE
  * bucket, and the join becomes an equi-join on the bucket id with a
  * residual lo≤p≤hi filter. Each matching pair is produced exactly
  * once (the point's bucket is unique), so no dedup is needed.
  *
  * Shuffle volume: points × 1 + intervals × (interval span / width).
  * Pick `bucketWidth` near the median interval length so intervals
  * explode to O(1) buckets while bucket population stays balanced.
  */
object RangeJoin {

  def pointInInterval(points: DataFrame, intervals: DataFrame,
                      pointCol: String, loCol: String, hiCol: String,
                      bucketWidth: Double): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val ivs = intervals.withColumn("__b",
      explode(sequence(
        floor(col(loCol) / bucketWidth).cast("long"),
        floor(col(hiCol) / bucketWidth).cast("long"))))
    val pts = points.withColumn("__b",
      floor(col(pointCol) / bucketWidth).cast("long"))
    pts.join(ivs, Seq("__b"))
      .filter(col(pointCol) >= col(loCol) && col(pointCol) <= col(hiCol))
      .drop("__b")
  }
}
