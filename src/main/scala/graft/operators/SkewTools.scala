package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation utilities. AQE's skew-join handling covers sort-
  * merge joins at runtime; these cover the two cases it does not:
  * skewed AGGREGATION keys, and skewed join keys when the build side
  * must be replicated deterministically.
  */
object SkewTools {

  /** Two-phase (salted) aggregation: count/sum-style aggregates over
    * a hot key first fold within (key, salt) — spreading one hot key
    * over `salts` reducers — then merge the partials. Identical
    * result to a direct groupBy for any algebraic aggregate, with the
    * hot key's work parallelized `salts` ways.
    *
    * The salt is a deterministic hash of stable row identity columns
    * (`saltBy`), not rand(): retries and speculative tasks must land
    * rows on the same salt or partials double-count.
    */
  def saltedAgg(df: DataFrame, key: Column, salts: Int,
                saltBy: Seq[Column], aggs: (String, Column)*): DataFrame = {
    val salted = df.withColumn("__salt",
      pmod(hash(saltBy: _*), lit(salts)))
    val partial = salted
      .groupBy(key.as("__k"), col("__salt"))
      .agg(aggs.head._2.as(aggs.head._1),
        aggs.tail.map { case (n, c) => c.as(n) }: _*)
    partial
      .groupBy(col("__k"))
      .agg(sum(col(aggs.head._1)).as(aggs.head._1),
        aggs.tail.map { case (n, _) => sum(col(n)).as(n) }: _*)
      .withColumnRenamed("__k", "key")
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
