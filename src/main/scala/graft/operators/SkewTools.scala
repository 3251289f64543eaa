package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation utilities. AQE's skew-join handling covers sort-
  * merge joins at runtime; these cover the two cases it does not:
  * skewed AGGREGATION keys, and skewed join keys when the build side
  * must be replicated deterministically.
  */
object SkewTools {

  /** Two-phase (salted) aggregation for SUM-MERGEABLE aggregates —
    * sum() and count() (counts merge by summing partial counts).
    * Aggregates whose merge is not a sum (min/max/avg/countDistinct)
    * do NOT belong here: the merge phase sums the partials and would
    * silently produce wrong results. Partials first fold within
    * (key, salt) — spreading one hot key over `salts` reducers —
    * then merge.
    *
    * The salt is a deterministic hash of stable row identity columns
    * (`saltBy`), not rand(): retries and speculative tasks must land
    * rows on the same salt or partials double-count.
    *
    * The output key column keeps the input column's name.
    */
  def saltedAgg(df: DataFrame, key: Column, salts: Int,
                saltBy: Seq[Column], aggs: (String, Column)*): DataFrame = {
    require(aggs.nonEmpty, "saltedAgg needs at least one aggregate")
    val keyName = df.select(key).columns.head
    val salted = df.withColumn("__salt",
      pmod(hash(saltBy: _*), lit(salts)))
    val partial = salted
      .groupBy(key.as(keyName), col("__salt"))
      .agg(aggs.head._2.as(aggs.head._1),
        aggs.tail.map { case (n, c) => c.as(n) }: _*)
    partial
      .groupBy(col(keyName))
      .agg(sum(col(aggs.head._1)).as(aggs.head._1),
        aggs.tail.map { case (n, _) => sum(col(n)).as(n) }: _*)
  }

  /** Salted join for a skewed left side against a small-ish right
    * side that is still too big to broadcast: the left adds a
    * deterministic salt in [0, salts), the right is replicated once
    * per salt value, and the join key becomes (key, salt) — one hot
    * key's rows spread over `salts` partitions instead of one.
    */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
                 salts: Int, leftSaltBy: Seq[Column]): DataFrame = {
    val l = left.withColumn("__salt", pmod(hash(leftSaltBy: _*), lit(salts)))
    val r = right.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    l.join(r, Seq(key, "__salt")).drop("__salt")
  }
}
